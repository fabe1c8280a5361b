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
}
