package graft.util

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Shared measurement helpers for the `ScaleProbe*` diagnostics mains —
  * previously five private copies, which meant a fix to the listener-drain
  * logic had to land in five places or the probes silently diverged in what
  * they measured.
  */
object ProbeSupport {

  /** Wall-clock the body; returns (result, seconds). */
  def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Wall-clock the body, seconds only (result discarded). */
  def timeSecs(f: => Any): Double = time(f)._2

  /** Runs `body` under a stage-completion listener summing `pick` over the
    * completed stages' task metrics. The listener bus is ASYNC: completion
    * events for the body's final stages may still be in flight when `body`
    * returns, so the bus is drained (deterministically via
    * `LiveListenerBus.waitUntilEmpty`, with a sleep fallback) before the
    * listener unregisters — otherwise late-posted stages are dropped and a
    * shuffle-record bound reads lower than reality.
    */
  def withStageSum[A](spark: SparkSession)(
      pick: org.apache.spark.executor.TaskMetrics => Long)(body: => A): (A, Long) = {
    val total = new AtomicLong()
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        Option(s.stageInfo.taskMetrics).foreach(m => total.addAndGet(pick(m)): Unit)
    }
    spark.sparkContext.addSparkListener(listener)
    val a = try body finally {
      try org.apache.spark.sql.graftbridge.Bridge
        .waitListenerBusEmpty(spark.sparkContext, 10000L)
      catch { case _: Throwable => Thread.sleep(500) }
      spark.sparkContext.removeSparkListener(listener)
    }
    (a, total.get())
  }
}
