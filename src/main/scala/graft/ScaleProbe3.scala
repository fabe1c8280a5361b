package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.data.SequenceGen
import graft.plans.LogPipeline

/** Diagnostic (not driver contract): scaling N vs 4N *executor processes*
  * via Spark's `local-cluster[workers,cores,memMB]` master — each executor
  * is its own JVM with its own heap/GC, matching a real cluster's process
  * isolation far better than local[k] threads sharing one heap. Requires
  * the app jar (sbt package) so executors can load graft classes.
  */
object ScaleProbe3 {
  private def jarPath: String = {
    val f = new java.io.File("target/scala-2.13").listFiles()
      .filter(f => f.getName.endsWith(".jar") && !f.getName.contains("sources"))
      .maxBy(_.lastModified())
    f.getAbsolutePath
  }

  private def session(workers: Int, cores: Int, memMb: Int): SparkSession = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val mult = sys.env.getOrElse("PROBE_PARTS_MULT", "1").toInt
    val s = SparkSession.builder()
      .master(s"local-cluster[$workers,$cores,$memMb]")
      .appName(s"probe-lc-$workers")
      .config("spark.sql.shuffle.partitions", (workers * cores * mult).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.memory", s"${memMb}m")
      .config("spark.jars", jarPath)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def run(spark: SparkSession, in: String, out: String): Double = time {
    val enriched = LogPipeline.run(spark, spark.read.parquet(in), SequenceGen.configs)
    LogPipeline.routeWrite(enriched, out, spark.sparkContext.defaultParallelism)
    spark.read.parquet(out).groupBy("sink").count().collect()
  }

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("PROBE_ROWS", "8000000").toLong
    val in = Files.createTempDirectory("probe3-in").toString
    val out = Files.createTempDirectory("probe3-out").toString
    locally {
      val s = SparkSession.builder().master("local[32]")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      SequenceGen.sequences(s, rows, 64).write.mode("overwrite").parquet(in)
      s.stop()
    }
    // N executors x cores vs 4N executors x cores (separate JVMs per worker)
    val nSmall = sys.env.getOrElse("PROBE_N", "1").toInt
    val cores = sys.env.getOrElse("PROBE_CORES", "4").toInt
    val reps = sys.env.getOrElse("PROBE_REPS", "3").toInt
    val nLarge = nSmall * 4
    val memMb = sys.env.getOrElse("PROBE_MEM_MB", "3072").toInt
    val results = Seq(nSmall, nLarge).flatMap { w =>
      val s = session(w, cores, memMb)
      run(s, in, s"$out/warm-$w-${System.nanoTime()}")
      val secs = (1 to reps).map { _ =>
        // flush dirty pages OUTSIDE the timed window: the previous run's
        // ~GBs of page-cache writeback otherwise stalls a later run at
        // random (observed +/-15s on identical runs)
        val od = s"$out/t-$w-${System.nanoTime()}"
        new ProcessBuilder("sync").inheritIO().start().waitFor()
        val t = run(s, in, od)
        println(f"PROBE3 workers=$w%2d x$cores secs=$t%7.2f thr=${rows / t}%9.0f")
        t
      }
      s.stop()
      secs.map(t => w -> (rows / t))
    }
    val byW = results.groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).max }
    println(f"PROBE3 efficiency=${byW(nLarge) / (4 * byW(nSmall))}%.3f")
  }
}
