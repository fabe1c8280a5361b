package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval containment join — events matched to the time windows that
  * cover them (maintenance windows, deploy windows, incident ranges): the
  * range analog of the as-of enrich ([[AsOfJoin]]), and like it a join
  * Spark has no native operator for. A naive `ts BETWEEN start AND end`
  * condition plans a nested-loop/cartesian join — quadratic at any scale.
  *
  * Spark-first shape: each interval EXPLODES into the calendar days it
  * covers (intervals are short; the blow-up is `ceil(span/1 day)`, a small
  * constant), events bucket to their own day map-only, and the join becomes
  * an EQUI-join on (key, day) with the exact `[start, end)` containment as
  * a post-join filter. The day-exploded window table stays tiny relative to
  * the corpus, so it broadcasts — the 10^12-row event stream crosses ZERO
  * exchanges to be matched; with a window table too big to broadcast the
  * same plan degrades gracefully to ONE hash exchange on (key, day).
  * Overlapping windows are fine (an event matches each cover), and a
  * window spanning k days appears k times on the build side but matches
  * each event exactly once (the event's day selects one replica).
  *
  * The DuckDB twin is the DEFINITION — a native range predicate join —
  * so the green row proves the explode+equi-join plan IS the containment
  * semantics.
  */
object IntervalJoin {

  /** Match events `(doc_id, <key>, ts)` to windows
    * `(window_id, <key>, start_ts, end_ts)` with `start_ts <= ts < end_ts`;
    * aggregate per window: event count + order-free bit_xor signature of
    * the matched doc_ids (row-set equality vs the twin without shuffling
    * row sets).
    */
  def eventsPerWindow(events: DataFrame, windows: DataFrame,
      key: String = "event_type"): DataFrame = {
    val days = windows.select(col("window_id"), col(key),
      col("start_ts"), col("end_ts"),
      explode(sequence(
        date_trunc("DAY", col("start_ts")),
        // last covered day: end is exclusive, so back off one microsecond
        date_trunc("DAY", col("end_ts") - expr("interval 1 microsecond")),
        expr("interval 1 day"))).as("day"))
    events
      .withColumn("day", date_trunc("DAY", col("ts")))
      .join(broadcast(days), Seq(key, "day"))
      .filter(col("ts") >= col("start_ts") && col("ts") < col("end_ts"))
      .groupBy(col("window_id"))
      .agg(count(lit(1)).as("n_events"),
        bit_xor(graft.ml.TextDedup.hash64Col(col("doc_id"))).as("sig"))
  }

  /** DuckDB twin — the native range join over the same relations. */
  def eventsPerWindowSql(eventsRel: String, windowsRel: String,
      key: String = "event_type"): String =
    s"""SELECT w.window_id, count(*) AS n_events,
       |  bit_xor(${graft.ml.TextDedup.hash64Sql("e.doc_id")}) AS sig
       |FROM $windowsRel w JOIN $eventsRel e
       |  ON e.$key = w.$key AND e.ts >= w.start_ts AND e.ts < w.end_ts
       |GROUP BY w.window_id""".stripMargin.replace("\n", " ")
}
