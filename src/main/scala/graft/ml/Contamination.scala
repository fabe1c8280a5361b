package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-grams with a held-out evaluation set.
  *
  * Scale shape: both sides explode to (shingle-hash, id) rows; the
  * benchmark side is tiny (an eval set), so the match is a broadcast
  * equi-join on the hash — the corpus side stays map-only, no wide
  * shuffle. Exact string n-grams (not minhash): decontamination wants
  * zero false negatives at the chosen n.
  */
object Contamination {

  /** Deterministic holdout "benchmark": every doc with doc_id % mod == 0. */
  def holdout(docs: DataFrame, mod: Int = 97): DataFrame =
    docs.filter(pmod(col("doc_id"), lit(mod)) === 0)

  def holdoutSql(docsRel: String, mod: Int = 97): String =
    s"(SELECT * FROM $docsRel WHERE doc_id % $mod = 0)"

  /** (doc_id, n_contaminated_ngrams) for corpus docs sharing at least one
    * k-word shingle with the benchmark set.
    */
  def flag(docs: DataFrame, bench: DataFrame): DataFrame = {
    val docShingles = docs.select(col("doc_id"),
      explode(TextDedup.shinglesCol(col("text"))).as("sh"))
    val benchShingles = bench.select(
      explode(TextDedup.shinglesCol(col("text"))).as("sh")).distinct()
    docShingles.join(broadcast(benchShingles), Seq("sh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated_ngrams"))
  }

  def flagSql(docsRel: String, benchRel: String): String =
    s"""WITH ds AS (SELECT doc_id, unnest(${TextDedup.shinglesSql("text")}) AS sh FROM $docsRel),
       |bs AS (SELECT DISTINCT unnest(${TextDedup.shinglesSql("text")}) AS sh FROM $benchRel)
       |SELECT ds.doc_id, count(*) AS n_contaminated_ngrams
       |FROM ds JOIN bs ON ds.sh = bs.sh GROUP BY ds.doc_id""".stripMargin.replace("\n", " ")
}
