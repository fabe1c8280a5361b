package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.DocsAdapter
import graft.ml.{Funnel, TextAnalysis, TextCleaning, TextDedup}

/** Stage-prefix isolation for the curation funnel (guide §1.4 noop sink):
  * times each prefix of the chain so the dominant stage is visible.
  * Non-contractual profiling aid; numbers feed OPTIMIZATION_r06.md.
  */
object FunnelProfile {
  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.get("SPARK_GRAFT_EXTRA_REPS").flatMap(_.toIntOption).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-funnel-profile")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def bench(name: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(name)
      f // warmup
      val ts = (1 to reps).map(_ => time(f))
      println(f"[fprof] $name%-26s min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
      spark.sparkContext.setJobDescription(null)
    }

    def docs = DocsAdapter.funnelDocs(spark, sfDir)
    def marked = TextCleaning.urlDedupMarked(
      docs.select(col("doc_id"), col("url"), col("html")))
    def extracted = TextCleaning.htmlExtract(
      marked.filter(!col("is_dup")).select("doc_id", "html"))
    def quality = TextCleaning.gopherRules(
        TextCleaning.c4Filters(extracted, passThrough = Seq("text"))
          .withColumnRenamed("keep", "keep_c4"),
        passThrough = Seq("keep_c4", "text"))
      .filter(col("keep_c4") && col("keep")).select("doc_id", "text")
    def chunked = TextDedup.chunkDedup(quality)
      .filter(col("n_kept") * 2 >= col("n_chunks"))
      .select(col("doc_id"), col("text"))

    bench("p0-funnelDocs")(noop(docs))
    bench("p1-urlDedupMarked")(noop(marked))
    bench("p2-htmlExtract")(noop(extracted))
    bench("p3-quality")(noop(quality))
    bench("p4-chunkDedup")(noop(chunked))
    bench("p5-lmScore")(noop(TextAnalysis.lmScore(chunked)))
    bench("full-onePass")(
      Funnel.curationFunnelOnePass(DocsAdapter.funnelDocs(spark, sfDir)).count(): Unit)

    spark.stop()
  }
}
