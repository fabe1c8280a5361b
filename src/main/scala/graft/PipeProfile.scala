package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.data.SequenceGen
import graft.plans.LogPipeline

/** Phase-isolation microbench for the pipeline (guide §1.4 noop sink):
  * separates scan / parse / enrich(ts) / shuffle / sort+write so the CPU
  * budget of each stage is visible. Env: PROF_ROWS (default 4,000,000),
  * PROF_CPUS (32), PROF_REPS (3).
  */
object PipeProfile {
  private def deleteRecursively(f: File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("PROF_ROWS", "4000000").toLong
    val cpus = sys.env.getOrElse("PROF_CPUS", "32").toInt
    val reps = sys.env.getOrElse("PROF_REPS", "3").toInt
    val shm = new File("/dev/shm")
    val base = if (shm.isDirectory && shm.canWrite) "/dev/shm" else System.getProperty("java.io.tmpdir")
    val root = Files.createDirectory(
      Paths.get(base, s"graft-bench-${ProcessHandle.current().pid()}")).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pipe-profile")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", s"$root/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val in = s"$root/in"
      SequenceGen.sequences(spark, rows, 64).write.mode("overwrite").parquet(in)
      def noop(df: DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      def bench(name: String)(f: => Unit): Unit = {
        spark.sparkContext.setJobDescription(name)
        f // warmup
        val ts = (1 to reps).map(_ => time(f))
        println(f"[prof] $name%-28s min=${ts.min}%.2f s all=${ts.map(t => f"$t%.2f").mkString(",")}")
        spark.sparkContext.setJobDescription(null)
      }
      val seqs = spark.read.parquet(in)
      bench("scan-only")(noop(seqs))
      bench("scan+parse")(noop(LogPipeline.parse(spark.read.parquet(in))))
      bench("scan+parse+enrich")(noop(
        LogPipeline.run(spark, spark.read.parquet(in), SequenceGen.configs)))
      bench("routeWrite-select-noop") {
        val e = LogPipeline.run(spark, spark.read.parquet(in), SequenceGen.configs)
        noop(e.select(col("doc_id"), col("tokens"), col("n_tok"), col("source"),
          col("host"), col("ts"), col("offset"), col("sink")))
      }
      // shuffle + sort, no file write: repartition like routeWrite then noop
      bench("route-shuffle+sort-noop") {
        val e = LogPipeline.run(spark, spark.read.parquet(in), SequenceGen.configs)
        val persisted = e.select(col("doc_id"), col("tokens"), col("n_tok"),
          col("source"), col("host"), col("ts"), col("offset"), col("sink"))
        val parts = spark.sparkContext.defaultParallelism
        noop(persisted.withColumn("_salt", pmod(hash(col("doc_id")), lit(parts * 8)))
          .repartition(parts, col("sink"), col("_salt")).drop("_salt")
          .sortWithinPartitions(col("sink"), col("ts")))
      }
      bench("full-routeWrite") {
        val e = LogPipeline.run(spark, spark.read.parquet(in), SequenceGen.configs)
        LogPipeline.routeWrite(e, s"$root/out", spark.sparkContext.defaultParallelism)
        deleteRecursively(new File(s"$root/out"))
      }
      bench("full-pipelineRun") {
        val e = LogPipeline.run(spark, spark.read.parquet(in), SequenceGen.configs)
        LogPipeline.routeWrite(e, s"$root/out", spark.sparkContext.defaultParallelism)
        spark.read.parquet(s"$root/out").groupBy("sink").count().collect()
        deleteRecursively(new File(s"$root/out"))
      }
    } finally {
      spark.stop()
      deleteRecursively(new File(root))
    }
  }
}
