package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.ProbeSupport.{time, withStageSum}

/** Scaling probe for the template-mining operators and the range-join
  * rewrite rule, whose scale stories the tiny oracle corpora cannot show:
  *
  *   - templates: the occurrence explode is 6 tokens/line = 6M rows at 1M
  *     lines, but the map-side combine collapses every repeated token to
  *     one (source, len, pos, token) cell before the exchange — what
  *     actually crosses is bounded by the corpus's DISTINCT-token content
  *     (here the ~1M unique user-id params; the 5 constant/low-card
  *     positions vanish). Closed-form check: exactly one template per
  *     source with wildcards at the two variable positions.
  *   - assign: map-only after the dictionary broadcast — the lines (with
  *     their token arrays) never shuffle; per-line params are verified
  *     against the closed form derived from doc_id.
  *   - range rule: a 1M-event × 10k-window containment join with NO key is
  *     10^10 comparisons under the nested-loop plan Spark would pick; the
  *     injected RangeJoinAsEquiJoin rule makes it a broadcast hash join on
  *     the day bucket. Windows are aligned so every window holds exactly
  *     50 events — the full result is closed-form.
  *
  * Env: PROBE_LINES (default 1,000,000), PROBE_CPUS (default 32),
  * PROBE_SOURCES (default 20), PROBE_WINDOWS (default 10,000).
  */
object ScaleProbeTemplates {

  /** 1M log lines over S sources, one latent template per source:
    *   svc-<s> request user=<id%100k> path=/p/<id%7> status done
    * positions 2 and 3 vary (wildcards), the rest are literal.
    */
  def lines(spark: SparkSession, n: Long, sources: Int): DataFrame =
    spark.range(n).select(
      col("id").cast("string").as("doc_id"),
      concat(lit("src"), pmod(col("id"), lit(sources.toLong))).as("source"),
      concat(
        lit("svc-"), pmod(col("id"), lit(sources.toLong)),
        lit(" request user="), pmod(col("id"), lit(100000L)),
        lit(" path=/p/"), pmod(col("id"), lit(7L)),
        lit(" status done")).as("raw"))

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("PROBE_LINES", "1000000").toLong
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32").toInt
    val sources = sys.env.getOrElse("PROBE_SOURCES", "20").toInt
    val nWin = sys.env.getOrElse("PROBE_WINDOWS", "10000").toLong
    require(n % sources == 0, "PROBE_LINES must divide by PROBE_SOURCES")
    val shm = new File("/dev/shm")
    val base = if (shm.isDirectory && shm.canWrite) "/dev/shm"
      else System.getProperty("java.io.tmpdir")
    val root = Files.createDirectory(
      Paths.get(base, s"probe3-tpl-${ProcessHandle.current().pid()}")).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-templates-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", s"$root/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val in = s"$root/lines"
      lines(spark, n, sources).write.mode("overwrite").parquet(in)
      val corpus = spark.read.parquet(in)
      graft.plans.LogTemplates.templatesFlat(
        corpus.filter(col("doc_id") < 1000)).count() // JIT warmup

      // ---- template mining ------------------------------------------------
      val ((tpl, mineSecs), mineShuffle) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time { graft.plans.LogTemplates.templatesFlat(corpus).collect() }
        }
      require(tpl.length == sources, s"${tpl.length} templates != $sources")
      tpl.foreach { r =>
        val src = r.getString(0).stripPrefix("src")
        require(r.getInt(1) == 6 &&
          r.getString(2) == s"svc-$src request <*> <*> status done" &&
          r.getString(3) == "2,3" &&
          r.getLong(4) == n / sources,
          s"unexpected template row: $r")
      }
      // what crosses = distinct cells: the ~n unique user-id cells (unique
      // params are the irreducible information content) + low-card cells;
      // the 6x occurrence explode itself must NOT cross
      require(mineShuffle <= n + n / 10,
        s"mining shuffled $mineShuffle records (cells bound ${n + n / 10})")
      println(f"""{"probe":"templates","lines":$n,"sources":$sources,""" +
        f""""occurrences":${6 * n},"shuffle_records":$mineShuffle,""" +
        f""""secs":$mineSecs%.2f,"lines_per_sec":${n / mineSecs}%.0f}""")

      // ---- assignment (map-only after the dictionary broadcast) ----------
      val expected = concat(lit("user="),
        pmod(col("doc_id").cast("long"), lit(100000L)),
        lit(" path=/p/"), pmod(col("doc_id").cast("long"), lit(7L)))
      val ((okRows, asgSecs), asgShuffle) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time {
            graft.plans.LogTemplates.assign(corpus)
              .filter(col("params") === expected).count()
          }
        }
      require(okRows == n, s"only $okRows/$n params reconstruct")
      // the dictionary subtree re-mines (same cells bound); the corpus side
      // adds NOTHING to the shuffle — a corpus crossing would double this
      require(asgShuffle <= n + n / 10,
        s"assign shuffled $asgShuffle records — the corpus crossed an exchange")
      println(f"""{"probe":"assign","lines":$n,"verified":$okRows,""" +
        f""""shuffle_records":$asgShuffle,""" +
        f""""secs":$asgSecs%.2f,"lines_per_sec":${n / asgSecs}%.0f}""")

      // ---- range-join rewrite at 10^10 naive pairs ------------------------
      GraftExtensions.register(spark)
      val epoch = "TIMESTAMP_NTZ '2024-01-01 00:00:00'"
      val ev = spark.range(n).select(
        col("id").cast("string").as("doc_id"),
        expr(s"timestampadd(SECOND, id, $epoch)").as("ts"))
      val win = spark.range(nWin).select(
        concat(lit("w"), col("id")).as("window_id"),
        expr(s"timestampadd(SECOND, id * 100, $epoch)").as("start_ts"),
        expr(s"timestampadd(SECOND, id * 100 + 50, $epoch)").as("end_ts"))
      val joined = ev.join(win,
        ev("ts") >= win("start_ts") && ev("ts") < win("end_ts"))
        .groupBy("window_id").agg(count(lit(1)).as("n_events"))
      val plan = joined.queryExecution.executedPlan.toString
      require(!plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"rule did not fire:\n$plan")
      require(plan.contains("graft_probe_day"), s"day key missing:\n$plan")
      val (stats, rjSecs) = time {
        joined.agg(count(lit(1)), min(col("n_events")), max(col("n_events"))).head()
      }
      // every window spans [100j, 100j+50) seconds -> exactly 50 events
      require(stats.getLong(0) == nWin && stats.getLong(1) == 50L &&
        stats.getLong(2) == 50L, s"closed form broken: $stats")
      println(f"""{"probe":"rangejoin","events":$n,"windows":$nWin,""" +
        f""""naive_pairs":${n * nWin},"matched":${50 * nWin},""" +
        f""""secs":$rjSecs%.2f,"events_per_sec":${n / rjSecs}%.0f}""")
    } finally {
      spark.stop()
      def rm(f: File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(new File(root))
    }
  }
}
