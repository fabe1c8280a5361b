package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.data.SequenceGen
import graft.plans.LogPipeline

/** Diagnostic: phase-by-phase wall time at two parallelism levels to find
  * what limits scaling. Not part of the driver contract.
  */
object ScaleProbe {
  private def session(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"probe-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("PROBE_ROWS", "2000000").toLong
    val in = Files.createTempDirectory("probe-in").toString
    val out = Files.createTempDirectory("probe-out").toString
    locally {
      val s = session(32)
      SequenceGen.sequences(s, rows, 64).write.mode("overwrite").parquet(in)
      s.stop()
    }
    Seq(8, 32, 8, 32).foreach { n =>
      val s = session(n)
      val seqs = s.read.parquet(in)
      def enriched = LogPipeline.run(s, seqs, SequenceGen.configs)
      // warmup
      enriched.filter(col("n_tok") > 0).agg(count(lit(1))).collect()
      val gc0 = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .stream.mapToLong(_.getCollectionTime).sum
      val tScan = time(seqs.agg(sum("n_tok")).collect())
      val tFields = time(enriched.agg(sum(size(col("fields")))).collect())
      val tTs = time(enriched.agg(max(col("ts"))).collect())
      val tOffset = time(enriched.agg(max(col("offset"))).collect())
      // force the full extraction: consume ts + the whole fields map
      val tParse = time(enriched.agg(max(col("ts")), sum(size(col("fields")))).collect())
      val tRender = time(seqs.select(graft.functions.F.tokens_to_text(col("tokens")).as("r"))
        .agg(sum(length(col("r")))).collect())
      val tAgg = time(LogPipeline.sinkSummary(enriched).collect())
      val tWriteNoRex = time(seqs
        .withColumn("sink", LogPipeline.sinkCol)
        .write.mode("overwrite").parquet(s"$out/norex$n-${System.nanoTime()}"))
      val persisted = enriched.select(
        col("doc_id"), col("tokens"), col("n_tok"), col("source"),
        col("host"), col("source_id"), col("ts"), col("offset"), col("sink"))
      val tShuffle = time(persisted
        .withColumn("_salt", pmod(hash(col("doc_id")), lit(n * 8)))
        .repartition(n, col("sink"), col("_salt"))
        .agg(count(lit(1))).collect())
      val tWritePlain = time(persisted // no shuffle, no partitionBy
        .write.mode("overwrite").parquet(s"$out/plain$n-${System.nanoTime()}"))
      val statics = LogPipeline.enrichStatic(LogPipeline.parse(seqs), SequenceGen.configs)
        .withColumn("sink", LogPipeline.sinkCol)
      val w2 = time(statics.select(col("doc_id"), col("tokens"), col("n_tok"),
        col("source"), col("host"), col("source_id"), col("sink"))
        .write.mode("overwrite").parquet(s"$out/w2-$n-${System.nanoTime()}"))
      val w3 = time(statics.select(col("doc_id"), col("tokens"), col("n_tok"),
        col("source"), col("host"), col("source_id"), col("offset"), col("sink"))
        .write.mode("overwrite").parquet(s"$out/w3-$n-${System.nanoTime()}"))
      val w4 = time(statics.select(col("doc_id"), col("tokens"), col("n_tok"),
        col("source"), col("host"), col("source_id"), col("offset"), col("ts"), col("sink"))
        .write.mode("overwrite").parquet(s"$out/w4-$n-${System.nanoTime()}"))
      println(f"PROBE2 cores=$n%2d w2(+host)=$w2%6.2f w3(+offset)=$w3%6.2f w4(+ts)=$w4%6.2f")
      val tWrite = time(LogPipeline.routeWrite(enriched, s"$out/w$n-${System.nanoTime()}", n))
      val gc1 = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .stream.mapToLong(_.getCollectionTime).sum
      println(f"PROBE cores=$n%2d scan=$tScan%6.2f fields=$tFields%6.2f ts=$tTs%6.2f offset=$tOffset%6.2f parse=$tParse%6.2f render=$tRender%6.2f agg=$tAgg%6.2f shuffle=$tShuffle%6.2f writeNoRex=$tWriteNoRex%6.2f writePlain=$tWritePlain%6.2f write=$tWrite%6.2f gcSec=${(gc1 - gc0) / 1000.0}%6.2f")
      s.stop()
    }
  }
}
