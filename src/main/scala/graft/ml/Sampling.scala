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
}
