package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Usage analytics over the event stream — the aggregate views a log/
  * telemetry platform serves next to search (the reference's search-page
  * histogram is the 1-D case; SURVEY.md §2.3). Both operators are integer-
  * exact (counts and distinct counts only — no float sums to diverge
  * cross-engine).
  */
object EventAnalytics {

  /** Weekly cohort retention: users bucketed by first-seen week, and for
    * each (cohort week, week offset) the distinct users still active.
    *
    * Scale shape: ONE user-keyed aggregate finds each user's cohort; the
    * join back is on the same key so AQE reuses the exchange; the distinct
    * count collapses two-phase (partial distinct on (cohort, offset, user)
    * cells map-side — a user is active in a week thousands of times but
    * crosses the wire once per active week). Nothing ever sorts globally
    * and no week's data concentrates on one task.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val weeks = events.select(col("user_id"),
      date_trunc("week", col("ts")).as("week"))
    val first = weeks.groupBy("user_id").agg(min(col("week")).as("cohort"))
    weeks.join(first, "user_id")
      .groupBy(col("cohort"),
        (datediff(col("week"), col("cohort")) / 7).cast("long")
          .as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_users"))
  }

  /** DuckDB twin of [[cohortRetention]] (date_trunc('week') is
    * Monday-anchored in both engines; the offset divides an exact
    * day-difference between two week starts).
    */
  def cohortRetentionSql(eventsRel: String): String =
    s"""WITH wk AS (SELECT user_id, date_trunc('week', ts) AS week
       |            FROM $eventsRel),
       |fs AS (SELECT user_id, min(week) AS cohort FROM wk GROUP BY user_id)
       |SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
       |  date_diff('day', f.cohort, w.week) // 7 AS week_offset,
       |  count(DISTINCT w.user_id) AS n_users
       |FROM wk w JOIN fs f USING (user_id)
       |GROUP BY 1, 2""".stripMargin.replace("\n", " ")

  /** ROLLUP cube slice: (event_type, day) counts with per-type and grand
    * subtotals in ONE pass — Spark expands the grouping sets before the
    * single partial-aggregated exchange, so the corpus is read once, not
    * three times. Subtotal rows label their rolled-up dimensions 'ALL'
    * (the event columns are never null in this corpus, so the label is
    * unambiguous).
    */
  def rollupCounts(events: DataFrame): DataFrame =
    events.select(col("event_type"),
      date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
      .rollup("event_type", "day")
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("day"), lit("ALL")).as("day"),
        col("n"), col("n_users"))

  /** DuckDB twin of [[rollupCounts]]. */
  def rollupCountsSql(eventsRel: String): String =
    s"""SELECT COALESCE(event_type, 'ALL') AS event_type,
       |  COALESCE(day, 'ALL') AS day,
       |  count(*) AS n, count(DISTINCT user_id) AS n_users
       |FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, user_id
       |      FROM $eventsRel)
       |GROUP BY ROLLUP (event_type, day)""".stripMargin.replace("\n", " ")
}
