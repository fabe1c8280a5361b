package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: concatenate the token stream in doc_id order and emit
  * fixed-capacity context windows (documents may straddle window
  * boundaries — the standard concat-then-chunk pretraining prep).
  *
  * Window w holds stream positions [w*cap, (w+1)*cap). A document whose
  * tokens span [off, off+n) contributes a slice to every window it
  * overlaps; all assignments are pure functions of the exclusive prefix
  * sum `off`, so the result is deterministic at any parallelism.
  *
  * Scale shape — the prefix sum is TWO-PHASE, never a global-window sort:
  *   1. per-block token totals (block = doc_id / blockSize), exclusive
  *      prefix-summed over the TINY per-block frame (one row per blockSize
  *      docs; a single-partition window there is 100k× smaller than the
  *      data), broadcast-joined back as each block's stream base;
  *   2. intra-block running sum over a window PARTITIONED by block —
  *      parallel across blocks, sorted only within.
  * A single `Window.orderBy(doc_id)` (no partitioning) would pull the
  * whole table through one task. The whole plan is lazy: no collect, no
  * per-block literal expressions (a 10^7-block `when`-chain is unplannable).
  */
object Packing {

  /** (window_id, tokens, n_tok, n_docs) over a generic tokens column.
    * `ord` must be a dense orderable id; blockSize bounds per-task rows.
    */
  def pack(seqs: DataFrame, cap: Int, tokensCol: String = "tokens",
      ordCol: String = "doc_id", blockSize: Long = 100000L): DataFrame = {
    val withBlock = seqs
      .withColumn("_n", size(col(tokensCol)).cast("long"))
      .withColumn("_ord", col(ordCol).cast("long")) // numeric stream order (strings would sort lexicographically)
      .withColumn("_block", (col("_ord") / blockSize).cast("long"))

    // phase 1: per-block totals -> exclusive prefix over the tiny per-block
    // frame. The unpartitioned window runs in one task, but over 1 row per
    // blockSize docs — the shape survives 10^12 rows (10^7 block rows).
    val wBase = Window.orderBy("_block").rowsBetween(Window.unboundedPreceding, -1)
    val bases = withBlock.groupBy("_block").agg(sum("_n").as("_t"))
      .withColumn("_base", coalesce(sum("_t").over(wBase), lit(0L)))
      .drop("_t")

    // phase 2: block-local running sum (parallel across blocks), stream base
    // attached via broadcast equi-join — the big side never reshuffles for it
    val w = Window.partitionBy("_block").orderBy("_ord")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = withBlock
      .join(broadcast(bases), "_block")
      .withColumn("_off", col("_base") + coalesce(sum(col("_n")).over(w), lit(0L)))

    // explode each doc into the windows it overlaps; slice the overlap
    val winStart = col("_win") * cap
    val sliceFrom = greatest(winStart, col("_off")) - col("_off") // 0-based within doc
    val sliceLen = least(winStart + cap, col("_off") + col("_n")) - greatest(winStart, col("_off"))
    offs
      .withColumn("_win",
        explode(sequence((col("_off") / cap).cast("long"),
          ((col("_off") + col("_n") - 1) / cap).cast("long"))))
      .filter(col("_n") > 0)
      .withColumn("_piece", slice(col(tokensCol), (sliceFrom + 1).cast("int"), sliceLen.cast("int")))
      .groupBy(col("_win").as("window_id"))
      .agg(
        flatten(transform(array_sort(collect_list(struct(col("_off"), col("_piece")))),
          e => e("_piece"))).as("tokens"),
        count(lit(1)).as("n_docs"))
      .withColumn("n_tok", size(col("tokens")))
  }

  /** Word-level packing of the documents table — same algorithm over the
    * normalized word split (both engines compute words identically), giving
    * the DuckDB-oracle-checkable twin of [[pack]].
    */
  def packWords(docs: DataFrame, cap: Int): DataFrame = {
    val words = docs.select(col("doc_id"),
      split(TextDedup.normalizeCol(col("text")), " ").as("words"))
    pack(words, cap, tokensCol = "words")
      .select(col("window_id"), array_join(col("tokens"), " ").as("window_text"),
        col("n_tok"), col("n_docs"))
  }

  // ------------------------------------------------------- shard export

  /** Training-shard export: the deterministic global shuffle + fixed
    * token-budget shard assignment that ends every curation pipeline
    * (docs leave in a pseudorandom order, not crawl order, grouped into
    * shard files of ~`tokensPerShard`). Order is the cross-engine 60-bit
    * md5 hash of doc_id — a seedless deterministic permutation — and a
    * document lands in the shard containing its start offset (docs stay
    * whole; shards overflow by at most one document, the standard writer
    * contract).
    *
    * Scale shape: the prefix sum over the hash order is TWO-PHASE like
    * [[pack]], never a global-window sort — blocks are the hash's top
    * `blockBits` bits, so ascending block IS ascending hash range:
    * per-block totals prefix-sum over the tiny block frame (2^blockBits
    * rows max), intra-block running sums parallel across blocks. One
    * shuffle (on block), everything else map-side.
    */
  def shardExport(docs: DataFrame, tokensPerShard: Long,
      blockBits: Int = 20): DataFrame = {
    val withH = docs.select(col("doc_id"),
        size(split(TextDedup.normalizeCol(col("text")), " ")).cast("long").as("n_tok"),
        TextDedup.hash64Col(col("doc_id").cast("string")).as("h"))
      .withColumn("_block", shiftright(col("h"), 60 - blockBits))
    val wBase = Window.orderBy("_block").rowsBetween(Window.unboundedPreceding, -1)
    val bases = withH.groupBy("_block").agg(sum("n_tok").as("_t"))
      .withColumn("_base", coalesce(sum("_t").over(wBase), lit(0L)))
      .drop("_t")
    val w = Window.partitionBy("_block").orderBy("h", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    withH.join(broadcast(bases), "_block")
      .withColumn("off", col("_base") + coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .select(col("doc_id"), col("n_tok"), col("off"),
        (col("off") / tokensPerShard).cast("long").as("shard_id"),
        (col("off") % tokensPerShard).as("shard_off"))
  }

  /** DuckDB twin of [[shardExport]]: one window prefix sum over the same
    * (hash, doc_id) order — the oracle states the SEMANTICS (a global
    * ordered prefix sum); the Spark side implements it without the global
    * sort.
    */
  def shardExportSql(docsRel: String, tokensPerShard: Long): String = {
    val norm = TextDedup.normalizeSql("text")
    val h = TextDedup.hash64Sql("CAST(doc_id AS VARCHAR)")
    s"""WITH se AS (SELECT doc_id, CAST(len(string_split($norm, ' ')) AS BIGINT) AS n_tok, $h AS h FROM $docsRel),
       |se_off AS (SELECT doc_id, n_tok,
       |    CAST(COALESCE(SUM(n_tok) OVER (ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
       |  FROM se)
       |SELECT doc_id, n_tok, off,
       |  CAST(off // $tokensPerShard AS BIGINT) AS shard_id,
       |  CAST(off % $tokensPerShard AS BIGINT) AS shard_off
       |FROM se_off""".stripMargin.replace("\n", " ")
  }

  def packWordsSql(docsRel: String, cap: Int): String = {
    val words = s"string_split(${TextDedup.normalizeSql("text")}, ' ')"
    s"""WITH ws AS (SELECT doc_id, $words AS words FROM $docsRel),
       |offs AS (SELECT doc_id, words, len(words) AS n,
       |    COALESCE(SUM(len(words)) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       |  FROM ws),
       |pieces AS (SELECT t.win, o.off,
       |    o.words[CAST(GREATEST(t.win * $cap, o.off) - o.off + 1 AS BIGINT) :
       |            CAST(LEAST((t.win + 1) * $cap, o.off + o.n) - o.off AS BIGINT)] AS piece
       |  FROM offs o, LATERAL (SELECT unnest(range(CAST(o.off // $cap AS BIGINT), CAST((o.off + o.n - 1) // $cap + 1 AS BIGINT))) AS win) t
       |  WHERE o.n > 0)
       |SELECT win AS window_id,
       |  array_to_string(flatten(list(piece ORDER BY off)), ' ') AS window_text,
       |  len(flatten(list(piece ORDER BY off))) AS n_tok,
       |  count(*) AS n_docs
       |FROM pieces GROUP BY win""".stripMargin.replace("\n", " ")
  }

  // --------------------------------------------------------- run trimming

  /** Trim intra-sequence repeated-token runs to at most `maxRun` copies —
    * repetition mitigation applied in TOKEN space, upstream of [[pack]]
    * (the text-side analog is the Gopher repetition rule set;
    * reference-domain pages stuck in template loops emit thousands-long
    * runs of one token and burn training steps). Keeps the FIRST `maxRun`
    * tokens of each run; everything else is order-preserved.
    *
    * Output keeps the oracle row per doc and proves the full trimmed
    * SEQUENCE, not just its length: `sig` is the position-weighted sum
    * Σ (1-based pos) × token — exact BIGINT arithmetic in both engines, so
    * any reorder/off-by-one flips it.
    *
    * Scale shape: entirely row-local array expressions (the run test reads
    * the `maxRun` predecessors of each position; the `when` guard keeps
    * ANSI element_at in range) — ZERO exchanges, pure scan throughput.
    */
  def tokenRunTrim(seqs: DataFrame, maxRun: Int = 3): DataFrame = {
    require(maxRun >= 1, "maxRun must be >= 1")
    val t = col("tokens")
    val kept = filter(sequence(lit(0), size(t) - 1), i =>
      when(i < maxRun, lit(true)).otherwise(
        !(1 to maxRun).map(j => element_at(t, i - j + 1) === element_at(t, i + 1))
          .reduce(_ && _)))
    val staged = seqs.select(col("doc_id"), col("tokens"),
      transform(kept, i => element_at(t, i + 1)).as("trimmed"))
    staged.select(col("doc_id"),
      size(col("tokens")).cast("long").as("n_before"),
      size(col("trimmed")).cast("long").as("n_after"),
      aggregate(
        transform(sequence(lit(1), size(col("trimmed"))),
          p => p.cast("long") * element_at(col("trimmed"), p).cast("long")),
        lit(0L), (acc, x) => acc + x).as("sig"))
  }

  /** DuckDB twin of [[tokenRunTrim]] — same keep rule over 1-based list
    * extracts, same position-weighted signature.
    */
  def tokenRunTrimSql(seqsRel: String, maxRun: Int = 3): String = {
    val prevEq = (1 to maxRun)
      .map(j => s"tokens[i - ${j - 1}] = tokens[i + 1]").mkString(" AND ")
    s"""WITH s AS (SELECT doc_id, tokens FROM $seqsRel),
       |tr AS (SELECT doc_id, tokens, list_transform(
       |    list_filter(range(len(tokens)), i -> CASE WHEN i < $maxRun THEN true
       |      ELSE NOT ($prevEq) END), i -> tokens[i + 1]) AS trimmed FROM s)
       |SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_before,
       |  CAST(len(trimmed) AS BIGINT) AS n_after,
       |  CAST(coalesce(list_sum(list_transform(range(1, len(trimmed) + 1),
       |    p -> CAST(p AS BIGINT) * trimmed[p])), 0) AS BIGINT) AS sig
       |FROM tr""".stripMargin.replace("\n", " ")
  }
}
