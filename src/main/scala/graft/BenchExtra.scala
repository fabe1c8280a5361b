package graft

import org.apache.spark.sql.SparkSession

/** Extra, non-contractual benchmarks for the optimization rounds (guide
  * §1.1/§1.4): isolate single queries, repeat them, time through the noop
  * sink, and dump `.explain("formatted")` plans. The driver's contract
  * bench is [[Bench]] (frozen); this main exists so optimization evidence
  * (before/after walls, plan shapes) can be produced without touching it.
  *
  * Usage (all via env, like Bench):
  *   SPARK_GRAFT_EXTRA_ONLY=q_a,q_b   queries to run (default: all)
  *   SPARK_GRAFT_EXTRA_REPS=3         timed reps per query (default 3)
  *   SPARK_GRAFT_EXTRA_MODE=count     count | noop (default count — the
  *                                    same action Bench times)
  *   SPARK_GRAFT_EXTRA_EXPLAIN=dir    also write <dir>/<query>.txt with the
  *                                    formatted physical plan
  * Prints one line per query: name, reps, min/median seconds.
  */
object BenchExtra {
  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.get("SPARK_GRAFT_EXTRA_REPS").flatMap(_.toIntOption).getOrElse(3)
    val mode = sys.env.getOrElse("SPARK_GRAFT_EXTRA_MODE", "count")
    val explainDir = sys.env.get("SPARK_GRAFT_EXTRA_EXPLAIN")
    val only = sys.env.get("SPARK_GRAFT_EXTRA_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    SparkEntry.queries.head._2(spark, sfDir).count() // JVM/codegen warmup

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.isEmpty || only(q._1))
    qs.foreach { case (name, fn) =>
      spark.sparkContext.setJobDescription(s"extra:$name")
      def action(): Unit = mode match {
        case "noop" => fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        case _ => fn(spark, sfDir).count(): Unit
      }
      try { action() } catch { case e: Throwable =>
        System.err.println(s"[extra] $name warmup FAILED: $e") }
      val ts = (1 to reps).map(_ => try time(action()) catch { case _: Throwable => -1.0 })
      val ok = ts.filter(_ >= 0).sorted
      val minS = if (ok.nonEmpty) ok.head else -1.0
      val medS = if (ok.nonEmpty) ok(ok.length / 2) else -1.0
      println(f"[extra] $name%-28s reps=${ok.length} min=$minS%.3f med=$medS%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
      explainDir.foreach { d =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val p = java.nio.file.Paths.get(d)
          java.nio.file.Files.createDirectories(p)
          java.nio.file.Files.write(p.resolve(s"$name.txt"),
            plan.getBytes("UTF-8")): Unit
        } catch { case e: Throwable =>
          System.err.println(s"[extra] $name explain FAILED: $e") }
      }
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
