package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.data.SequenceGen
import graft.metrics.PipelineMetrics
import graft.plans.LogPipeline

/** Benchmark main (driver contract): prints ONE JSON line
  * {"metric":…,"value":…,"unit":"sec","queries":{…},"sf":…} plus extra keys:
  *   pipeline — full parse->enrich->route->aggregate throughput (seqs/sec)
  *              with per-stage listener metrics (records, shuffle, skew)
  *   scaling  — the north-rule N vs 4N protocol run at local[8] vs local[32]
  *              on the same input (BASELINE.md measurement protocol)
  */
object Bench {
  private def session(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** N-executor cluster simulation: `local-cluster[workers,cores,mem]` spawns
    * one JVM per executor (own heap/GC), the honest stand-in for a real
    * multi-executor cluster on one box. Executor heap is sized to cover the
    * fan-out write buffers (sinks x concurrent writers x parquet rowgroup) —
    * undersized heaps (3g) measurably GC-thrash the route stage.
    */
  private def clusterSession(workers: Int, cores: Int, memMb: Int): Option[SparkSession] = try {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val jarFile = new java.io.File("target/scala-2.13").listFiles()
      .filter(f => f.getName.endsWith(".jar") && !f.getName.contains("sources"))
      .maxBy(_.lastModified())
    // a stale jar would ship old code to the executor JVMs — refuse it
    val newestClass = {
      def walk(d: java.io.File): Long =
        Option(d.listFiles()).map(_.map(f =>
          if (f.isDirectory) walk(f) else f.lastModified()).foldLeft(0L)(_ max _)).getOrElse(0L)
      walk(new java.io.File("target/scala-2.13/classes"))
    }
    require(jarFile.lastModified() >= newestClass,
      s"app jar ${jarFile.getName} is older than compiled classes — run `sbt package`")
    val jar = jarFile.getAbsolutePath
    val s = SparkSession.builder()
      .master(s"local-cluster[$workers,$cores,$memMb]")
      .appName(s"graft-scale-$workers")
      .config("spark.sql.shuffle.partitions", (workers * cores).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.executor.memory", s"${memMb}m")
      .config("spark.jars", jar)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Some(s)
  } catch { case e: Throwable =>
    System.err.println(s"[bench] local-cluster unavailable (${e.getMessage}); " +
      "falling back to local[n] threads for the scaling runs")
    None
  }

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  /** One full pipeline pass: scan -> parse -> enrich -> route(write) ->
    * per-sink aggregate; returns wall seconds.
    */
  private def pipelineRun(spark: SparkSession, inputDir: String, outDir: String): Double = time {
    val seqs = spark.read.parquet(inputDir)
    val enriched = LogPipeline.run(spark, seqs, SequenceGen.configs)
    LogPipeline.routeWrite(enriched, outDir,
      spark.sparkContext.defaultParallelism)
    // per-sink aggregate over the routed output: partition-pruned, projects
    // zero data columns (counts come from parquet footers)
    spark.read.parquet(outDir).groupBy("sink").count().collect()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val pipelineRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "1000000").toLong
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") == "1"

    // ---- per-query timings (steady state: 1 warmup + 1 timed run) ----
    var spark = session(cpus)
    SparkEntry.queries.head._2(spark, sfDir).count() // JVM/codegen warmup
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      val secs = try time(fn(spark, sfDir).count()) catch { case _: Throwable => -1.0 }
      name -> secs
    }

    // ---- full-pipeline throughput with stage metrics ----
    // A failure below must still emit the one-line JSON (the driver's only
    // signal), so the pipeline and scaling blocks degrade to error strings.
    val benchIn = Files.createTempDirectory("graft-bench-in").toString
    val benchOut = Files.createTempDirectory("graft-bench-out").toString
    val metrics = new PipelineMetrics
    val pipelineJson = try {
      SequenceGen.sequences(spark, pipelineRows, cpus * 2)
        .write.mode("overwrite").parquet(benchIn)
      pipelineRun(spark, benchIn, benchOut + "/warm") // warmup
      spark.sparkContext.addSparkListener(metrics)
      // flush the warmup's dirty pages outside the timed window (same hygiene
      // as the scaling runs; writeback stalls showed +/-40% here)
      new ProcessBuilder("sync").inheritIO().start().waitFor()
      val pipeSecs = pipelineRun(spark, benchIn, benchOut + "/timed")
      spark.sparkContext.removeSparkListener(metrics)
      val pipeThr = pipelineRows / pipeSecs
      f""""pipeline":{"rows":$pipelineRows,"secs":$pipeSecs%.2f,"seqs_per_sec":$pipeThr%.1f,"stages":${metrics.toJson}},"""
    } catch { case e: Throwable =>
      s""""pipeline":{"error":"${e.getClass.getSimpleName}"},"""
    }
    spark.stop()

    // ---- scaling efficiency: N vs 4N executor processes, same input ----
    // Protocol (BASELINE.md): identical job at local-cluster[N,4,8g] and
    // local-cluster[4N,4,8g] — one JVM per executor, matching a real
    // cluster's process isolation. Input sized so per-run compute dwarfs
    // fixed job overheads (scheduling, commit, the enrich dim subquery).
    // Dirty page-cache writeback from a previous run stalls a later one at
    // random (+/-15s observed), so each rep starts with a sync, outside the
    // timed window, identically for both sizes; best-of-reps estimates
    // capacity.
    val scaling = if (doScaling) try {
      val scaleRows = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "16000000").toLong
      val nSmall = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "1").toInt
      val coresPerExec = sys.env.getOrElse("SPARK_GRAFT_SCALE_CORES", "4").toInt
      val execMemMb = sys.env.getOrElse("SPARK_GRAFT_SCALE_MEM_MB", "8192").toInt
      // 2 reps (plus warmup) keeps the whole bench under the driver's
      // command budget; the sync hygiene makes run-to-run spread small
      val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "2").toInt
      val nLarge = nSmall * 4
      val scaleIn = Files.createTempDirectory("graft-scale-in").toString
      locally {
        val s = session(cpus)
        SequenceGen.sequences(s, scaleRows, 64).write.mode("overwrite").parquet(scaleIn)
        s.stop()
      }
      def measure(mkSession: Int => Option[SparkSession]): Option[Map[Int, Double]] = {
        val pairs = Seq(nSmall, nLarge).map { n =>
          mkSession(n) match {
            case None => n -> None
            case Some(s) =>
              pipelineRun(s, scaleIn, benchOut + s"/scale-warm-$n")
              val secs = (1 to reps).map { r =>
                new ProcessBuilder("sync").inheritIO().start().waitFor()
                pipelineRun(s, scaleIn, benchOut + s"/scale-$n-$r")
              }.min
              s.stop()
              n -> Some(scaleRows / secs)
          }
        }
        if (pairs.forall(_._2.isDefined)) Some(pairs.map(p => p._1 -> p._2.get).toMap)
        else None
      }
      val thr = measure(n => clusterSession(n, coresPerExec, execMemMb))
        .getOrElse(measure(n => Some(session(n * coresPerExec))).get) // thread fallback
      val eff = thr(nLarge) / (4.0 * thr(nSmall))
      f""""scaling":{"rows":$scaleRows,"n_small":$nSmall,"n_large":$nLarge,"cores_per_executor":$coresPerExec,"throughput_n":${thr(nSmall)}%.1f,"throughput_4n":${thr(nLarge)}%.1f,"efficiency":$eff%.3f},"""
    } catch { case e: Throwable =>
      s""""scaling":{"error":"${e.getClass.getSimpleName}"},"""
    } else ""

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      pipelineJson +
      scaling +
      s""""sf":"$sfDir"}""")
  }
}
