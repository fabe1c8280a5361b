package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-bucketed event-rate anomaly flags — the monitoring surface on top
  * of the histogram extension (reference: the search-page histogram,
  * web/static/.. time chart; SURVEY.md §2.3): flag (event_type, hour)
  * buckets whose count deviates from the type's median by more than
  * `k` × MAD (a Hampel-style robust filter; the classic z-score breaks on
  * the very outliers it should find because they inflate the mean/stddev).
  *
  * Integer-exact by construction: counts are integers, the median and MAD
  * are type-1 percentiles of integers ([[Percentiles.byGroup]] — rank
  * `ceil(0.5·n)`, no interpolation), and the flag is a strict `>` on
  * integer products — so the DuckDB twin agrees bit-for-bit, with none of
  * the cross-engine float-summation hazards a mean/stddev flag would have.
  * (The Gaussian-consistency constant 1.4826 is folded into the caller's
  * choice of `k`; keeping the rule integral is what keeps it exact.)
  *
  * Scale shape: the corpus crosses exactly ONE (window, type) combine
  * exchange into hour-bucket cells; everything after — both percentile
  * walks and the flag joins — runs over CELLS (types × hours, bounded by
  * the time range, never by event count), and the median/MAD sides join
  * back via broadcast. At 10^12 events the post-agg apparatus is
  * constant-sized.
  */
object Anomaly {

  /** The rule over PRE-AGGREGATED cells — any (group, bucket, count) frame
    * qualifies, notably the streaming histogram's merge-on-read serving
    * view ([[graft.streaming.StreamingPipeline.servedHistogram]]), so live
    * monitoring composes on the serving path without re-reading events.
    * Passes every input column through and appends med/dev/mad/is_anomaly.
    */
  def flagCells(cells: DataFrame, groupCol: String, nCol: String,
      k: Int = 3): DataFrame = {
    // pin the cell frame once: the rule consumes it FOUR times (median
    // walk, dev join, MAD walk via dev, final join) and each consumption
    // re-executed the upstream aggregation/serving subtree (guide §1.2).
    // Cells are (groups × buckets)-bounded by this object's scale contract,
    // so materializing them is constant-sized at any event volume.
    val c = cells.localCheckpoint(true)
    val med = Percentiles.byGroup(c, groupCol, nCol, Seq(0.5))
      .select(col(groupCol), col("p50").as("med"))
    // dev is itself read twice (MAD walk + final join) — same argument
    val dev = c.join(broadcast(med), groupCol)
      .withColumn("dev", abs(col(nCol) - col("med")))
      .localCheckpoint(true)
    val mad = Percentiles.byGroup(dev, groupCol, "dev", Seq(0.5))
      .select(col(groupCol), col("p50").as("mad"))
    dev.join(broadcast(mad), groupCol)
      .withColumn("is_anomaly", col("dev") > lit(k.toLong) * col("mad"))
  }

  def bucketCountAnomalies(events: DataFrame, k: Int = 3): DataFrame = {
    val cells = events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("event_type"), col("w.start").as("bucket_start"),
        col("n_events"))
    flagCells(cells, "event_type", "n_events", k)
      .select(col("event_type"),
        date_format(col("bucket_start"), "yyyy-MM-dd HH:mm:ss").as("bucket_start"),
        col("n_events"), col("med"), col("dev"), col("mad"),
        col("is_anomaly"))
  }

  /** DuckDB twin of [[flagCells]] over any cells relation — the same two
    * type-1 percentile walks ([[Percentiles.byGroupSql]]) and the same
    * strict-greater integer rule; `otherCols` are passed through like the
    * Spark side passes every input column through.
    */
  def flagCellsSql(cellsRel: String, groupCol: String, nCol: String,
      otherCols: Seq[String], k: Int = 3): String = {
    val medQ = Percentiles.byGroupSql(cellsRel, groupCol, nCol, Seq(0.5))
    val passThru = otherCols.map(c => s"c.$c, ").mkString
    val devCells = s"(SELECT c.$groupCol, $passThru c.$nCol," +
      s" m.p50 AS med, abs(c.$nCol - m.p50) AS dev" +
      s" FROM $cellsRel c JOIN ($medQ) m USING ($groupCol))"
    val madQ = Percentiles.byGroupSql(devCells, groupCol, "dev", Seq(0.5))
    val outThru = otherCols.map(c => s"d.$c, ").mkString
    s"""SELECT d.$groupCol, $outThru d.$nCol, d.med, d.dev,
       |  a.p50 AS mad, d.dev > $k * a.p50 AS is_anomaly
       |FROM $devCells d JOIN ($madQ) a USING ($groupCol)""".stripMargin
      .replace("\n", " ")
  }

  /** DuckDB twin of [[bucketCountAnomalies]]. */
  def bucketCountAnomaliesSql(eventsRel: String, k: Int = 3): String = {
    val cells = s"(SELECT event_type," +
      s" strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_start," +
      s" count(*) AS n_events FROM $eventsRel GROUP BY 1, 2)"
    flagCellsSql(cells, "event_type", "n_events", Seq("bucket_start"), k)
  }
}
