package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
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
  *   1. per-block token totals (block = doc_id / blockSize), aggregated and
  *      prefix-summed on the driver (tiny: one row per block), broadcast
  *      back as each block's stream base;
  *   2. intra-block running sum over a window PARTITIONED by block —
  *      parallel across blocks, sorted only within.
  * A single `Window.orderBy(doc_id)` (no partitioning) would pull the
  * whole table through one task.
  */
object Packing {

  /** (window_id, tokens, n_tok, n_docs) over a generic tokens column.
    * `ord` must be a dense orderable id; blockSize bounds per-task rows.
    */
  def pack(seqs: DataFrame, cap: Int, tokensCol: String = "tokens",
      ordCol: String = "doc_id", blockSize: Long = 100000L): DataFrame = {
    val spark = seqs.sparkSession
    val withBlock = seqs
      .withColumn("_n", size(col(tokensCol)).cast("long"))
      .withColumn("_ord", col(ordCol).cast("long")) // numeric stream order (strings would sort lexicographically)
      .withColumn("_block", (col("_ord") / blockSize).cast("long"))

    // phase 1: per-block totals -> exclusive prefix on the driver (tiny)
    val totals = withBlock.groupBy("_block").agg(sum("_n").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val bases = totals.scanLeft((Long.MinValue, 0L)) {
      case ((_, acc), (b, t)) => (b, acc + t)
    }.tail.map { case (b, cum) => b -> (cum - totals.find(_._1 == b).get._2) }.toMap
    val baseCol = totals.map(_._1).foldRight(lit(0L): Column) { (b, acc) =>
      when(col("_block") === b, lit(bases(b))).otherwise(acc)
    }

    // phase 2: block-local running sum (parallel across blocks)
    val w = Window.partitionBy("_block").orderBy("_ord")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = withBlock
      .withColumn("_off", baseCol + coalesce(sum(col("_n")).over(w), lit(0L)))

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
}
