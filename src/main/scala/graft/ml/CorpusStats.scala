package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level statistics a tokenizer/training team runs before a big run:
  * collocation mining (which word pairs travel together), vocabulary
  * coverage (how big a vocab covers p% of occurrences), and length-bucketed
  * batching (how much padding a sorted batcher saves over arrival order).
  *
  * All three follow the house exactness rules: integer arithmetic wherever
  * a count flows, and when a ratio is unavoidable the SAME IEEE expression
  * tree on both engines (identical operands + identical op order → the
  * identical double, before any rounding).
  */
object CorpusStats {

  // --------------------------------------------------------- collocations

  /** Top-k collocations by lift over word pairs within a positional window.
    *
    * For every pair of words at distance 1..`window` inside a document,
    * lift = p(a,b) / (p(a)·p(b)) — the ratio form of PMI (monotone with it,
    * but free of the transcendental log whose last-ulp could differ across
    * engines). The double is computed left-to-right from exact BIGINTs:
    * `(((n_pair · N_w) / N_p) · N_w / c_a) / c_b` — both engines see the
    * same operands in the same order, so IEEE 754 gives bit-identical
    * results and the ORDER BY on the raw lift agrees everywhere.
    *
    * Scale shape: pairs are generated per-row with higher-order functions
    * (no self-join on position), then ONE exchange on the pair key with
    * map-side combine; the unigram table and the two 1-row totals ride
    * broadcasts (at web vocab size AQE keeps the unigram join a word-keyed
    * shuffle — still occurrence-free). `minCount` prunes the singleton tail
    * before the joins; top-k is TakeOrdered, never a global sort.
    */
  def collocations(docs: DataFrame, window: Int = 2, minCount: Long = 5,
      k: Int = 50): DataFrame = {
    val words = docs.select(
      split(TextDedup.normalizeCol(col("text")), " ").as("ws"))
    val uni = words.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val totals = uni.agg(sum(col("c")).as("nw"))
    // per-gap pair arrays; sequence() descends when start > stop, so the
    // short-document case must be guarded to an empty array explicitly
    val pairCols: Seq[Column] = (1 to window).map { d =>
      when(size(col("ws")) > d,
        transform(sequence(lit(0), size(col("ws")) - 1 - d), i =>
          struct(element_at(col("ws"), i + 1).as("a"),
            element_at(col("ws"), i + 1 + d).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))
    }
    val pairsAll = words
      .select(explode(flatten(array(pairCols: _*))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_pair"))
    val np = pairsAll.agg(sum(col("n_pair")).as("np"))
    val byA = uni.select(col("w").as("a"), col("c").as("ca"))
    val byB = uni.select(col("w").as("b"), col("c").as("cb"))
    pairsAll.filter(col("n_pair") >= minCount)
      .join(byA, "a").join(byB, "b")
      .crossJoin(broadcast(np)).crossJoin(broadcast(totals))
      .withColumn("lift_raw",
        col("n_pair").cast("double") * col("nw") / col("np") *
          col("nw") / col("ca") / col("cb"))
      .orderBy(col("lift_raw").desc, col("a"), col("b"))
      .limit(k)
      .select(col("a"), col("b"), col("n_pair"),
        round(col("lift_raw"), 4).as("lift"))
  }

  /** DuckDB twin of [[collocations]] — same normalization, same pair
    * generation (1-indexed list lambdas; `range(1, n)` is empty when
    * n ≤ 1, so short documents need no guard), same left-to-right double.
    */
  def collocationsSql(docsRel: String, window: Int = 2, minCount: Long = 5,
      k: Int = 50): String = {
    val norm = TextDedup.normalizeSql("text")
    val gaps = (1 to window).map { d =>
      s"list_transform(range(1, len(ws) + 1 - $d), i -> {'a': ws[i], 'b': ws[i + $d]})"
    }.mkString("flatten([", ", ", "])")
    s"""WITH w0 AS (SELECT string_split($norm, ' ') AS ws FROM $docsRel),
       |uni AS (SELECT w, count(*) AS c FROM (SELECT unnest(ws) AS w FROM w0) GROUP BY w),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS nw FROM uni),
       |pairs AS (SELECT p['a'] AS a, p['b'] AS b, count(*) AS n_pair
       |  FROM (SELECT unnest($gaps) AS p FROM w0) GROUP BY 1, 2),
       |np AS (SELECT CAST(sum(n_pair) AS BIGINT) AS np FROM pairs)
       |SELECT a, b, n_pair, round(lift_raw, 4) AS lift
       |FROM (SELECT p.a, p.b, p.n_pair,
       |    CAST(p.n_pair AS DOUBLE) * t.nw / np.np * t.nw / ua.c / ub.c AS lift_raw
       |  FROM pairs p
       |  JOIN uni ua ON ua.w = p.a JOIN uni ub ON ub.w = p.b, np, tot t
       |  WHERE p.n_pair >= $minCount)
       |ORDER BY lift_raw DESC, a, b LIMIT $k""".stripMargin.replace("\n", " ")
  }

  // ------------------------------------------------------- vocab coverage

  /** Smallest vocabulary size covering ≥ p% of token OCCURRENCES, for each
    * requested percentage — the sizing question every tokenizer build asks
    * (rank tokens by frequency, walk the cumulative mass).
    *
    * Never ranks individual tokens: after the one occurrence exchange
    * (token → count, map-side combined), the walk happens on the histogram
    * of COUNT VALUES — `(count, how many tokens have it)` — which is tiny
    * (≤ distinct frequencies), like [[graft.plans.Percentiles]]. Inside a
    * tie-cell the answer is closed-form: k = ⌈(target − mass_before) / c⌉
    * more tokens of frequency c. All BIGINT; both engines agree exactly.
    */
  def vocabCoverage(seqs: DataFrame, pcts: Seq[Int] = Seq(50, 90, 99),
      tokensCol: String = "tokens"): DataFrame = {
    val cnt = seqs.select(explode(col(tokensCol)).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val hist = cnt.groupBy("c").agg(count(lit(1)).as("n_toks"))
    // cumulative walk over count VALUES, most-frequent first (cells are
    // distinct after the groupBy, so the RANGE frame holds no tie traps)
    val w = Window.orderBy(col("c").desc)
    val walk = hist
      .withColumn("occ", col("c") * col("n_toks"))
      .withColumn("cum_occ", sum(col("occ")).over(w))
      .withColumn("cum_rank", sum(col("n_toks")).over(w))
      .withColumn("prev_occ", col("cum_occ") - col("occ"))
      .withColumn("prev_rank", col("cum_rank") - col("n_toks"))
    val total = cnt.agg(sum(col("c")).as("total"))
    val ps = seqs.sparkSession.createDataFrame(pcts.map(Tuple1(_)))
      .toDF("p_pct")
    ps.crossJoin(broadcast(total))
      .withColumn("target", expr("(p_pct * total + 99) div 100"))
      .join(broadcast(walk),
        col("prev_occ") < col("target") && col("cum_occ") >= col("target"))
      .withColumn("k", expr("(target - prev_occ + c - 1) div c"))
      .select(col("p_pct"),
        (col("prev_rank") + col("k")).as("vocab_size"),
        (col("prev_occ") + col("k") * col("c")).as("covered"),
        col("total"))
  }

  /** DuckDB twin of [[vocabCoverage]] — identical integer walk. */
  def vocabCoverageSql(seqsRel: String, pcts: Seq[Int] = Seq(50, 90, 99),
      tokensCol: String = "tokens"): String = {
    val plist = pcts.mkString("[", ", ", "]")
    s"""WITH cnt AS (SELECT t, count(*) AS c
       |  FROM (SELECT unnest($tokensCol) AS t FROM $seqsRel) GROUP BY t),
       |hist AS (SELECT c, count(*) AS n_toks FROM cnt GROUP BY c),
       |walk AS (SELECT c, n_toks, c * n_toks AS occ,
       |    CAST(sum(c * n_toks) OVER (ORDER BY c DESC) AS BIGINT) AS cum_occ,
       |    CAST(sum(n_toks) OVER (ORDER BY c DESC) AS BIGINT) AS cum_rank
       |  FROM hist),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM cnt),
       |ps AS (SELECT unnest($plist) AS p_pct)
       |SELECT p_pct, prev_rank + k AS vocab_size,
       |  prev_occ + k * c AS covered, total
       |FROM (SELECT p_pct, total, c,
       |    cum_occ - occ AS prev_occ, cum_rank - n_toks AS prev_rank,
       |    ((p_pct * total + 99) // 100 - (cum_occ - occ) + c - 1) // c AS k
       |  FROM ps, tot, walk
       |  WHERE cum_occ - occ < (p_pct * total + 99) // 100
       |    AND cum_occ >= (p_pct * total + 99) // 100)""".stripMargin
      .replace("\n", " ")
  }

  // -------------------------------------------------- length batching cost

  /** Padding cost of fixed-size batches under two batching orders: `sorted`
    * (length-descending — the standard dynamic-batching trick) vs `arrival`
    * (doc_id order). Each batch of `batch` sequences pads every member to
    * the batch max, so its overhead is `count·max(len) − sum(len)`; the
    * report is one exact-integer row per strategy.
    *
    * The global rank never runs as one window: both orders use the
    * two-phase block prefix sum (shard-export pattern) — blocks are the
    * LENGTH VALUE for `sorted` (bounded by the max sequence length, so the
    * offset table is broadcast-sized) and doc_id ranges for `arrival`;
    * row_number runs per-block in parallel and a broadcast offset join
    * assembles the exact global rank. The twin computes the same ranks with
    * a naive global row_number — the green row proves the two-phase rank IS
    * the global order.
    */
  def lengthBatchCost(seqs: DataFrame, batch: Int = 32,
      tokensCol: String = "tokens"): DataFrame = {
    val d = seqs.select(col("doc_id"),
      size(col(tokensCol)).cast("long").as("n_tok"))

    def summarize(ranked: DataFrame, name: String): DataFrame =
      ranked.withColumn("batch_id", expr(s"(rank - 1) div $batch"))
        .groupBy("batch_id")
        .agg(count(lit(1)).as("bn"), max(col("n_tok")).as("mx"),
          sum(col("n_tok")).as("sm"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("sm")).as("total_tokens"),
          sum(col("bn") * col("mx") - col("sm")).as("pad_tokens"))
        .withColumn("strategy", lit(name))

    val lenOff = d.groupBy("n_tok").agg(count(lit(1)).as("bn"))
      .withColumn("off",
        sum(col("bn")).over(Window.orderBy(col("n_tok").desc)) - col("bn"))
      .select(col("n_tok"), col("off"))
    val sortedRank = d
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("n_tok")).orderBy(col("doc_id"))))
      .join(broadcast(lenOff), "n_tok")
      .withColumn("rank", col("off") + col("rn"))

    val ab = d.withColumn("blk", expr("doc_id div 1000"))
    val blkOff = ab.groupBy("blk").agg(count(lit(1)).as("bn"))
      .withColumn("off",
        sum(col("bn")).over(Window.orderBy(col("blk"))) - col("bn"))
      .select(col("blk"), col("off"))
    val arrivalRank = ab
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("blk")).orderBy(col("doc_id"))))
      .join(broadcast(blkOff), "blk")
      .withColumn("rank", col("off") + col("rn"))

    summarize(sortedRank, "sorted")
      .unionByName(summarize(arrivalRank, "arrival"))
      .select(col("strategy"), col("n_batches"), col("total_tokens"),
        col("pad_tokens"))
  }

  /** DuckDB twin of [[lengthBatchCost]] — the DEFINITION (global
    * row_number) against the plan (two-phase block rank).
    */
  def lengthBatchCostSql(seqsRel: String, batch: Int = 32,
      tokensCol: String = "tokens"): String = {
    def leg(order: String, name: String): String =
      s"""SELECT '$name' AS strategy, count(*) AS n_batches,
         |  CAST(sum(sm) AS BIGINT) AS total_tokens,
         |  CAST(sum(bn * mx - sm) AS BIGINT) AS pad_tokens
         |FROM (SELECT (rank - 1) // $batch AS b, count(*) AS bn,
         |    max(n_tok) AS mx, CAST(sum(n_tok) AS BIGINT) AS sm
         |  FROM (SELECT row_number() OVER (ORDER BY $order) AS rank, n_tok
         |    FROM d)
         |  GROUP BY 1)""".stripMargin
    s"""WITH d AS (SELECT doc_id, CAST(len($tokensCol) AS BIGINT) AS n_tok
       |  FROM $seqsRel)
       |${leg("n_tok DESC, doc_id", "sorted")}
       |UNION ALL ${leg("doc_id", "arrival")}""".stripMargin
      .replace("\n", " ")
  }
}
