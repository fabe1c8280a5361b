package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic data-mixing operators for training pipelines.
  *
  * Sampling decisions are a pure function of (doc_id, salt) through the
  * cross-engine md5-prefix hash — the same document is kept or dropped on
  * every run, on every engine, at any parallelism (no RNG, no
  * partition-order dependence). That is what makes a 100 TB mixing job
  * reproducible and resumable: a re-run of any partition makes identical
  * decisions.
  */
object Sampling {
  val BUCKETS = 10000L

  /** Hash bucket in [0, BUCKETS) for a document id. */
  def bucket(docId: Column, salt: String): Column =
    pmod(TextDedup.hash64Col(concat(docId.cast("string"), lit(":" + salt))), lit(BUCKETS))

  def bucketSql(docIdExpr: String, salt: String): String =
    s"${TextDedup.hash64Sql(s"CAST($docIdExpr AS VARCHAR) || ':$salt'")} % $BUCKETS"

  /** Stratified sample: per-stratum keep fractions (data-mixing weights),
    * strata read from `stratumCol`. A document is kept iff its hash bucket
    * falls below its stratum's fraction — so raising a weight only ADDS
    * documents (nested samples), the property mixture tuning needs.
    */
  def stratified(docs: DataFrame, stratumCol: String,
      fractions: Map[String, Double], default: Double,
      salt: String = "mix-v1"): DataFrame = {
    val b = bucket(col("doc_id"), salt)
    val threshold = fractions.foldLeft(lit(default * BUCKETS)) {
      case (acc, (stratum, frac)) =>
        when(col(stratumCol) === stratum, lit(frac * BUCKETS)).otherwise(acc)
    }
    docs.filter(b < threshold)
  }

  def stratifiedSql(docsRel: String, stratumCol: String,
      fractions: Map[String, Double], default: Double,
      salt: String = "mix-v1"): String = {
    val cases = fractions.map { case (s, f) =>
      s"WHEN $stratumCol = '$s' THEN ${f * BUCKETS}"
    }.mkString(" ")
    s"""SELECT * FROM $docsRel
       | WHERE ${bucketSql("doc_id", salt)} < (CASE $cases ELSE ${default * BUCKETS} END)""".stripMargin.replace("\n", " ")
  }

  /** Temperature-scaled source mixing (the multilingual "sampling with
    * temperature" recipe, e.g. XLM-R, Conneau et al. ACL'20): reweight
    * source shares s_i to s_i^(1/T) so oversized sources shrink relative
    * to rare ones, realized by downsampling only (no upsampling) — the
    * keep probability normalizes so the rarest source keeps everything:
    * p_i = s_i^(1/T-1) / max_j s_j^(1/T-1), which at the standard T=2
    * collapses to sqrt(n_min / n_i) — a pure function of the integer
    * per-source counts through IEEE-exact divide + sqrt, hence
    * bit-reproducible in any engine (general T would need pow(), which is
    * only ~1-ulp and out of oracle scope).
    *
    * Plan shape: ONE tiny per-source aggregate (partial map-side combine,
    * source-cardinality rows), a 1-row min, then a broadcast equi-join back
    * and the deterministic hash filter — the 10^12-row side is touched by
    * exactly one agg pass and one map-only filter pass, and the decision is
    * a pure function of (doc_id, salt, counts): reproducible and resumable
    * at any parallelism.
    */
  def temperatureMix(docs: DataFrame, sourceCol: String,
      salt: String = "tmix-v1"): DataFrame = {
    val counts = docs.groupBy(col(sourceCol).as("src")).agg(count(lit(1)).as("n"))
    val minN = counts.agg(min(col("n")).as("n_min"))
    val probs = counts.crossJoin(broadcast(minN))
      .select(col("src"),
        round(sqrt(col("n_min").cast("double") / col("n")), 6).as("keep_prob"))
    docs.join(broadcast(probs), col(sourceCol) === col("src"))
      .filter(bucket(col("doc_id"), salt) < col("keep_prob") * BUCKETS)
      .select(col("doc_id"), col("src"), col("keep_prob"))
  }

  /** DuckDB twin of [[temperatureMix]] (same rounded keep probability and
    * hash threshold).
    */
  def temperatureMixSql(docsRel: String, sourceCol: String,
      salt: String = "tmix-v1"): String =
    s"""WITH counts AS (SELECT $sourceCol AS src, count(*) AS n FROM $docsRel GROUP BY 1),
       |probs AS (SELECT src,
       |    round(sqrt(CAST((SELECT min(n) FROM counts) AS DOUBLE) / n), 6) AS keep_prob
       |  FROM counts)
       |SELECT d.doc_id, p.src, p.keep_prob FROM $docsRel d
       |JOIN probs p ON d.$sourceCol = p.src
       |WHERE ${bucketSql("d.doc_id", salt)} < p.keep_prob * $BUCKETS""".stripMargin.replace("\n", " ")

  /** Token-budget epoch allocator — the per-source "epochs" table every
    * training-mix writeup publishes: given a total token budget, split it
    * across sources by sqrt-damped token shares (the T=2 temperature rule
    * on TOKENS) and report how many passes (epochs) over each source that
    * allocation implies (> 1 = the source repeats; Muennighoff et al.'s
    * data-constrained regime).
    *
    * Determinism: weights are INTEGER floor(sqrt(tokens)) — the
    * cross-source normalizer is a BIGINT sum, not a float fold, so no
    * engine-specific summation order can move a boundary; the only doubles
    * are two final per-row divides (IEEE-exact given identical operands)
    * rounded to 4 dp.
    *
    * Scale shape: ONE per-source aggregate over the corpus (map-side
    * combined to source cardinality); the normalizer and budget ride a
    * window over the tiny aggregated frame. The corpus is read once.
    */
  def mixEpochs(docs: DataFrame, budgetTokens: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perSource = docs
      .select(col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("tokens"))
      .withColumn("w", floor(sqrt(col("tokens").cast("double"))))
    perSource
      .withColumn("alloc_tokens",
        (lit(budgetTokens) * col("w")).cast("long") /
          sum(col("w")).over(Window.partitionBy()))
      .select(col("source"), col("n_docs"), col("tokens"),
        floor(col("alloc_tokens")).cast("long").as("alloc_tokens"),
        round(floor(col("alloc_tokens")) / col("tokens"), 4).as("epochs"))
  }

  /** DuckDB twin of [[mixEpochs]] (identical integer-sqrt weights and
    * BIGINT normalizer; both divides double with the same operands).
    */
  def mixEpochsSql(docsRel: String, budgetTokens: Long): String =
    s"""WITH per_source AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS tokens
       |  FROM $docsRel GROUP BY source),
       |w AS (SELECT *, CAST(floor(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) AS w
       |  FROM per_source)
       |SELECT source, n_docs, tokens,
       |  CAST(floor(($budgetTokens * w) / (SELECT sum(w) FROM w)) AS BIGINT)
       |    AS alloc_tokens,
       |  round(floor(($budgetTokens * w) / (SELECT sum(w) FROM w)) / tokens, 4)
       |    AS epochs
       |FROM w""".stripMargin.replace("\n", " ")

  // ------------------------------------------------- importance resampling

  /** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
    * 2023): pick raw documents whose hashed-n-gram distribution looks like
    * a small target corpus. Features are words hashed into `buckets` bins;
    * two add-one-smoothed bag-of-words models p̂_target / p̂_raw are fit
    * over the bins; a document's log importance weight is
    * Σ_b c_b·(log p̂_t[b] − log p̂_r[b]); and the selection samples k raw
    * documents without replacement ∝ weight via the Gumbel top-k trick —
    * with the uniform drawn from the deterministic md5 hash of the doc id,
    * so the "random" resample is a pure function of the corpus and salt
    * (reproducible and resumable at any parallelism, like every sampler
    * here).
    *
    * Scale shape (the 10^12-row side is `docs`): one explode+agg stages
    * per-(doc, bin) counts — that exchange is consumed twice (model fit
    * and scoring) so ReuseExchange evaluates the normalize+split pipeline
    * once; the two models come from ONE conditional aggregation over the
    * bins (bucket-cardinality rows, never a second corpus pass); scoring
    * joins the broadcast bin table and re-aggregates per doc; the final
    * selection is a global top-k (TakeOrdered — never a full sort). The
    * Gumbel key ordering uses the unrounded double (cross-engine libm
    * drift ~1e-15 relative — far inside the key spacing); outputs round
    * for the oracle like every fp-emitting operator here.
    */
  def dsirSelect(docs: DataFrame, isTarget: Column, k: Int,
      buckets: Int = 1024, salt: String = "dsir-v1"): DataFrame = {
    val feat = docs.select(col("doc_id"), isTarget.as("is_tgt"),
        explode(split(TextDedup.normalizeCol(col("text")), " ")).as("w"))
      .select(col("doc_id"), col("is_tgt"),
        pmod(TextDedup.hash64Col(col("w")), lit(buckets.toLong)).as("b"))
      .groupBy("doc_id", "is_tgt", "b").agg(count(lit(1)).as("cnt"))
    val dist = feat.groupBy("b").agg(
      sum(when(col("is_tgt"), col("cnt")).otherwise(0L)).as("ct"),
      sum(when(!col("is_tgt"), col("cnt")).otherwise(0L)).as("cr"))
    val tot = dist.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    val llr = dist.crossJoin(broadcast(tot)).select(col("b"),
      (log((col("ct") + 1).cast("double") / (col("tt") + buckets).cast("double")) -
        log((col("cr") + 1).cast("double") / (col("tr") + buckets).cast("double"))).as("llr"))
    // score ALL docs and drop targets on the AGGREGATED flag: a plain
    // feat.filter(!is_tgt) would push down to the scan, fork the two
    // consumers into separate corpus scans, and defeat ReuseExchange —
    // this way the normalize+explode pipeline runs once (plan-asserted)
    val logw = feat.join(broadcast(llr), Seq("b"))
      .groupBy("doc_id").agg(sum(col("cnt") * col("llr")).as("lw"),
        max(col("is_tgt")).as("tgt"))
      .filter(!col("tgt"))
    // Gumbel top-k = sample-without-replacement ∝ exp(lw); the uniform is
    // the doc's hash bucket midpoint, identical in both engines
    val u = (bucket(col("doc_id"), salt).cast("double") + 0.5) / BUCKETS.toDouble
    logw.select(col("doc_id"), col("lw"), (col("lw") - log(-log(u))).as("gk"))
      .orderBy(col("gk").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), round(col("lw"), 4).as("log_w"),
        round(col("gk"), 6).as("gumbel_key"))
  }

  /** DuckDB twin of [[dsirSelect]] — same bins, same smoothing, same
    * Gumbel key, same unrounded ordering. `isTargetSql` is a boolean SQL
    * expression over the doc relation's columns.
    */
  def dsirSelectSql(docsRel: String, isTargetSql: String, k: Int,
      buckets: Int = 1024, salt: String = "dsir-v1"): String = {
    val norm = TextDedup.normalizeSql("text")
    s"""WITH feat AS (
       |  SELECT doc_id, is_tgt, ${TextDedup.hash64Sql("w")} % $buckets AS b, count(*) AS cnt
       |  FROM (SELECT doc_id, ($isTargetSql) AS is_tgt,
       |          unnest(string_split($norm, ' ')) AS w FROM $docsRel)
       |  GROUP BY 1, 2, 3),
       |dist AS (SELECT b,
       |    CAST(sum(CASE WHEN is_tgt THEN cnt ELSE 0 END) AS BIGINT) AS ct,
       |    CAST(sum(CASE WHEN NOT is_tgt THEN cnt ELSE 0 END) AS BIGINT) AS cr
       |  FROM feat GROUP BY b),
       |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt, CAST(sum(cr) AS BIGINT) AS tr FROM dist),
       |llr AS (SELECT b,
       |    ln(CAST(ct + 1 AS DOUBLE) / CAST(tt + $buckets AS DOUBLE))
       |      - ln(CAST(cr + 1 AS DOUBLE) / CAST(tr + $buckets AS DOUBLE)) AS llr
       |  FROM dist, tot),
       |w AS (SELECT doc_id, sum(cnt * llr) AS lw, max(is_tgt) AS tgt
       |  FROM feat JOIN llr USING (b) GROUP BY doc_id),
       |keyed AS (SELECT doc_id, lw,
       |    lw - ln(-ln((${bucketSql("doc_id", salt)} + 0.5) / $BUCKETS.0)) AS gk
       |  FROM w WHERE NOT tgt)
       |SELECT doc_id, round(lw, 4) AS log_w, round(gk, 6) AS gumbel_key
       |FROM keyed ORDER BY gk DESC, doc_id LIMIT $k""".stripMargin.replace("\n", " ")
  }

  /** LEAKAGE-FREE train/validation split: the split decision is made per
    * NEAR-DUP CLUSTER, not per document — a doc-granular hash split puts
    * near-copies of the same page on both sides, and the validation loss
    * silently measures memorization. Clusters come from
    * [[TextDedup.nearDupClusters]] (MinHash-LSH pairs + connected
    * components); every member of a cluster inherits the cluster id's hash
    * bucket, so a page and all its near-copies land on the SAME side.
    * Deterministic, resumable: split = pure function of (cluster, salt).
    *
    * Scale shape: the clustering dominates (see nearDupClusters — banded
    * bucket join + label propagation over the near-dup sliver); the split
    * itself adds one map-only hash comparison on top of the labels.
    * Returns (doc_id, cluster_id, split).
    */
  def leakFreeSplit(docs: DataFrame, threshold: Double, valFrac: Double,
      salt: String = "split-v1"): DataFrame = {
    val clusters = TextDedup.nearDupClusters(docs, threshold)
    clusters.select(col("doc_id"), col("cluster_id"),
      when(bucket(col("cluster_id"), salt) < valFrac * BUCKETS, "val")
        .otherwise("train").as("split"))
  }

  /** DuckDB twin of [[leakFreeSplit]] — the transitive-closure cluster twin
    * with the same cluster-keyed hash gate.
    */
  def leakFreeSplitSql(docsRel: String, threshold: Double, valFrac: Double,
      salt: String = "split-v1"): String =
    s"""SELECT doc_id, cluster_id,
       | CASE WHEN ${bucketSql("cluster_id", salt)} < ${valFrac * BUCKETS}
       |   THEN 'val' ELSE 'train' END AS split
       | FROM (${TextDedup.nearDupClustersSql(docsRel, threshold)})""".stripMargin.replace("\n", " ")
}
