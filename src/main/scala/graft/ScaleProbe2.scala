package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.data.SequenceGen
import graft.metrics.PipelineMetrics
import graft.plans.LogPipeline

/** Stage-level scaling diagnosis on the full route at 8M rows. */
object ScaleProbe2 {
  private def session(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"probe2-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val rows = 8000000L
    val in = Files.createTempDirectory("probe2-in").toString
    val out = Files.createTempDirectory("probe2-out").toString
    locally {
      val s = session(32)
      SequenceGen.sequences(s, rows, 64).write.mode("overwrite").parquet(in)
      s.stop()
    }
    Seq(8, 32).foreach { n =>
      val s = session(n)
      // warmup
      LogPipeline.routeWrite(LogPipeline.run(s, s.read.parquet(in), SequenceGen.configs),
        s"$out/warm$n", n)
      val m = new PipelineMetrics
      s.sparkContext.addSparkListener(m)
      val t0 = System.nanoTime()
      LogPipeline.routeWrite(LogPipeline.run(s, s.read.parquet(in), SequenceGen.configs),
        s"$out/timed$n", n)
      val wall = (System.nanoTime() - t0) / 1e9
      s.sparkContext.removeSparkListener(m)
      println(f"PROBE3 cores=$n wall=$wall%.2f")
      m.summary().foreach { st =>
        val cpuSec = st.tasks * st.medianTaskMs / 1000.0
        println(f"  stage=${st.stageId}%4d tasks=${st.tasks}%3d med=${st.medianTaskMs}%6d max=${st.maxTaskMs}%6d sumMed=$cpuSec%8.1f rRead=${st.recordsRead}%9d rWrit=${st.recordsWritten}%9d")
      }
      s.stop()
    }
  }
}
