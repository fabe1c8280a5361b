package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap-based sessionization over the events table — the classic
  * log-analytics rollup (the reference has no session concept; builder
  * extension). Expressed with Spark's NATIVE `session_window` aggregate:
  * the plan is one shuffle on `user_id` + a session-merging hash aggregate
  * (`UpdatingSessionsExec`), never a windowed sort-and-scan pass, and the
  * same expression runs unchanged under Structured Streaming with a
  * watermark (state evicts once the gap closes a session).
  *
  * Merge rule, probed and MlSpec-pinned: an event EXTENDS the session iff
  * `ts - last_ts <= gap` (a new session starts strictly past the gap);
  * session bounds are the min/max event times of the merged run.
  */
object Sessionize {

  /** (user_id, session_start, session_end, n_events) for every maximal
    * gap-merged run of one user's events.
    */
  def sessions(events: DataFrame, gapSeconds: Long): DataFrame =
    events.groupBy(col("user_id"),
        session_window(col("ts"), s"$gapSeconds seconds"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))

  /** DuckDB twin of [[sessions]]: gaps-and-islands with the pinned STRICT
    * `> gap` boundary at microsecond precision.
    */
  def sessionsSql(eventsRel: String, gapSeconds: Long): String =
    s"""WITH o AS (SELECT user_id, ts,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > ${gapSeconds}000000
       |      THEN 1 ELSE 0 END AS newi
       |  FROM $eventsRel WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       |s AS (SELECT user_id, ts,
       |    sum(newi) OVER (PARTITION BY user_id ORDER BY ts) AS sess FROM o)
       |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       |  CAST(count(*) AS BIGINT) AS n_events
       |FROM s GROUP BY user_id, sess""".stripMargin.replace("\n", " ")
}
