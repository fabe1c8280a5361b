package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.data.SequenceGen
import graft.plans.LogPipeline
import graft.util.ProbeSupport.timeSecs

/** Diagnostic (not driver contract): which pipeline phase stops scaling
  * 8 -> 32 threads. Parse-only vs +shuffle vs +write, same input.
  */
object ScaleProbe4 {
  private def session(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"probe4-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("PROBE_ROWS", "16000000").toLong
    val in = Files.createTempDirectory("probe4-in").toString
    val out = Files.createTempDirectory("probe4-out").toString
    locally {
      val s = session(32)
      SequenceGen.sequences(s, rows, 64).write.mode("overwrite").parquet(in)
      s.stop()
    }
    Seq(8, 32, 8, 32).foreach { n =>
      val s = session(n)
      val seqs = s.read.parquet(in)
      def enriched = LogPipeline.run(s, seqs, SequenceGen.configs)
      enriched.agg(count(lit(1))).collect() // warmup
      val gc0 = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .stream.mapToLong(_.getCollectionTime).sum
      val tScan = timeSecs(seqs.agg(sum("n_tok")).collect())
      val tTs = timeSecs(enriched.agg(max(col("ts"))).collect())
      val tFields = timeSecs(enriched.agg(sum(size(col("fields")))).collect())
      val persisted = enriched.select(col("doc_id"), col("tokens"), col("n_tok"),
        col("source"), col("host"), col("source_id"), col("ts"), col("offset"), col("sink"))
      val tShuffle = timeSecs(persisted
        .withColumn("_salt", pmod(hash(col("doc_id")), lit(n * 8)))
        .repartition(n, col("sink"), col("_salt"))
        .agg(count(lit(1))).collect())
      val tWrite = timeSecs(LogPipeline.routeWrite(enriched, s"$out/w$n-${System.nanoTime()}", n))
      val gc1 = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .stream.mapToLong(_.getCollectionTime).sum
      println(f"PROBE4 cores=$n%2d scan=$tScan%6.2f ts=$tTs%6.2f fields=$tFields%6.2f shuffle=$tShuffle%6.2f fullWrite=$tWrite%6.2f gcSec=${(gc1 - gc0) / 1000.0}%6.2f")
      s.stop()
    }
  }
}
