package graft

import java.io.File
import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.data.SequenceGen
import graft.plans.LogPipeline

/** Diagnosis harness for the N-vs-4N scaling efficiency (Bench's scaling
  * phase replicated verbatim — local-cluster[n,4,8g], same input, same
  * pipelineRun), with a per-stage listener that additionally captures
  * stage WALL time (submit→complete), executor run/GC/fetch-wait/ser-deser
  * CPU, and shuffle volumes — the breakdown Bench's one-number-per-rep
  * protocol cannot show. Guide §7.1/§2.2: find which stage stops scaling.
  *
  * Env: DIAG_ROWS (default 16000000), DIAG_NS (default "1,4"),
  * DIAG_REPS (default 2), DIAG_MEM_MB (8192), DIAG_CORES (4).
  */
object ScaleDiag {
  private def deleteRecursively(f: File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  final class StageDiag extends SparkListener {
    final case class T(run: Long, gc: Long, fetch: Long, cpuNs: Long,
      deser: Long, serRes: Long, srBytes: Long, swBytes: Long,
      swTime: Long, dur: Long)
    private val tasks = new ConcurrentHashMap[Int, java.util.List[T]]()
    private val submitted = new ConcurrentHashMap[Int, Long]()
    private val completed = new ConcurrentHashMap[Int, Long]()
    private val names = new ConcurrentHashMap[Int, String]()
    override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
      submitted.put(e.stageInfo.stageId, System.currentTimeMillis()): Unit
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      completed.put(e.stageInfo.stageId, System.currentTimeMillis())
      names.put(e.stageInfo.stageId, e.stageInfo.name.takeWhile(_ != '\n')): Unit
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        tasks.computeIfAbsent(e.stageId,
            _ => java.util.Collections.synchronizedList(new java.util.ArrayList[T]()))
          .add(T(m.executorRunTime, m.jvmGCTime,
            m.shuffleReadMetrics.fetchWaitTime, m.executorCpuTime,
            m.executorDeserializeTime, m.resultSerializationTime,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.shuffleWriteMetrics.writeTime,
            e.taskInfo.duration)): Unit
      }
    }
    def reset(): Unit = { tasks.clear(); submitted.clear(); completed.clear(); names.clear() }
    def report(): String = {
      tasks.asScala.toSeq.sortBy(_._1).map { case (id, l) =>
        val ts = l.asScala.toSeq
        val wall = (for { s <- Option(submitted.get(id)); c <- Option(completed.get(id)) }
          yield c - s).getOrElse(0L)
        val durs = ts.map(_.dur).sorted
        f"stage=$id%-5d tasks=${ts.size}%-4d wall=${wall}ms " +
          f"sumRun=${ts.map(_.run).sum}ms sumCpu=${ts.map(_.cpuNs).sum / 1000000}ms " +
          f"gc=${ts.map(_.gc).sum}ms fetchWait=${ts.map(_.fetch).sum}ms " +
          f"deser=${ts.map(_.deser).sum}ms serRes=${ts.map(_.serRes).sum}ms " +
          f"swTime=${ts.map(_.swTime).sum / 1000000}ms " +
          f"srMB=${ts.map(_.srBytes).sum / 1048576}MB swMB=${ts.map(_.swBytes).sum / 1048576}MB " +
          f"maxTask=${if (durs.isEmpty) 0L else durs.last}ms medTask=${if (durs.isEmpty) 0L else durs(durs.size / 2)}ms " +
          s"name=${names.getOrDefault(id, "")}"
      }.mkString("\n")
    }
  }

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("DIAG_ROWS", "16000000").toLong
    val ns = sys.env.getOrElse("DIAG_NS", "1,4").split(",").map(_.trim.toInt).toSeq
    val reps = sys.env.getOrElse("DIAG_REPS", "2").toInt
    val memMb = sys.env.getOrElse("DIAG_MEM_MB", "8192").toInt
    val cores = sys.env.getOrElse("DIAG_CORES", "4").toInt
    val shm = new File("/dev/shm")
    val base = if (shm.isDirectory && shm.canWrite) "/dev/shm" else System.getProperty("java.io.tmpdir")
    val root = Files.createDirectory(
      Paths.get(base, s"graft-bench-${ProcessHandle.current().pid()}")).toString

    val jar = new java.io.File("target/scala-2.13").listFiles()
      .filter(f => f.getName.endsWith(".jar") && !f.getName.contains("sources"))
      .maxBy(_.lastModified()).getAbsolutePath

    // stage the input with a plain local session
    locally {
      val s = SparkSession.builder().master("local[32]")
        .appName("diag-stage")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.local.dir", s"$root/spark-local")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      SequenceGen.sequences(s, rows, 64).write.mode("overwrite").parquet(s"$root/in")
      SequenceGen.sequences(s, rows / 4, 16).write.mode("overwrite").parquet(s"$root/warm")
      s.stop()
    }

    def pipelineRun(spark: SparkSession, inputDir: String, outDir: String): Double = time {
      val seqs = spark.read.parquet(inputDir)
      val enriched = LogPipeline.run(spark, seqs, SequenceGen.configs)
      LogPipeline.routeWrite(enriched, outDir, spark.sparkContext.defaultParallelism)
      spark.read.parquet(outDir).groupBy("sink").count().collect()
    }

    ns.foreach { n =>
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val b = SparkSession.builder()
        .master(s"local-cluster[$n,$cores,$memMb]")
        .appName(s"graft-diag-$n")
        .config("spark.sql.shuffle.partitions", (n * cores).toString)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.locality.wait", "0")
        .config("spark.executor.memory", s"${memMb}m")
        .config("spark.local.dir", s"$root/spark-local")
        .config("spark.jars", jar)
        .config("spark.ui.enabled", "false")
      sys.env.get("DIAG_EXEC_OPTS").filter(_.nonEmpty)
        .foreach(o => b.config("spark.executor.extraJavaOptions", o))
      val s = b.getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      try {
        val tw = pipelineRun(s, s"$root/warm", s"$root/out-warm-$n")
        deleteRecursively(new File(s"$root/out-warm-$n"))
        System.err.println(f"[diag] n=$n warmup $tw%.2f s")
        val diag = new StageDiag
        s.sparkContext.addSparkListener(diag)
        (1 to reps).foreach { r =>
          diag.reset()
          val out = s"$root/out-$n-$r"
          val t = pipelineRun(s, s"$root/in", out)
          deleteRecursively(new File(out))
          Thread.sleep(400) // let the listener bus drain
          println(f"\n===== n=$n rep=$r wall=$t%.2f s =====")
          println(diag.report())
        }
        s.sparkContext.removeSparkListener(diag)
      } finally s.stop()
    }
    deleteRecursively(new File(root))
  }
}
