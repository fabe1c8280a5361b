package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.compile.QueryEngine
import graft.model.SourceConfig

/** Adapter exposing the driver testdata `events` parquet as the engine's
  * canonical event frame. The rendered log line is a pure function of the
  * structured columns, so the DuckDB oracle can verify every downstream
  * operator independently by recomputing from the same columns
  * (see SparkEntry.oracleSql — `RAW_SQL` is the SQL twin of `raw` here).
  *
  * Line shape mirrors the reference's kv corpus (cmd/logdunk/main.go:27-32):
  *   2024/01/01 00:09:58.778549 performing action eventType=error userId=13 eventId=0
  */
object EventsAdapter {
  /** DuckDB twin of the rendered line (string concat, same timestamp format). */
  val RAW_SQL: String =
    "strftime(ts, '%Y/%m/%d %H:%M:%S.%f') || ' performing action eventType=' || event_type || ' userId=' || user_id || ' eventId=' || event_id"

  val extractors: Seq[String] = SourceConfig.defaultExtractors

  def configs: Seq[SourceConfig] = Seq(
    SourceConfig("events-*.log", "kv", extractors, "_time",
      SourceConfig.defaultTimeLayout, "events-host", "app"))

  /** Canonical event frame from {sfDir}/events.parquet. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    ev.select(
      col("event_id").cast("string").as("doc_id"),
      concat(lit("events-"), col("event_type"), lit(".log")).as("source"),
      concat(lit("host-"), pmod(col("user_id"), lit(4L))).as("host"),
      concat(lit("events-"), col("event_type"), lit(".log")).as("source_id"),
      col("ts"),
      col("event_id").cast("long").as("offset"),
      concat(
        date_format(col("ts"), "yyyy/MM/dd HH:mm:ss.SSSSSS"),
        lit(" performing action eventType="), col("event_type"),
        lit(" userId="), col("user_id"),
        lit(" eventId="), col("event_id")).as("raw"))
  }

  /** DuckDB twins of the derived metadata columns. */
  val SOURCE_SQL = "'events-' || event_type || '.log'"
  val HOST_SQL = "'host-' || (user_id % 4)"

  def engine(spark: SparkSession, sfDir: String): QueryEngine =
    new QueryEngine(events(spark, sfDir), configs)

  /** The same events rendered as a pre-tokenized `sequences` table
    * (BASELINE.json input_hint shape) — lets the DuckDB oracle verify the
    * full tokens -> parse -> enrich -> route -> aggregate pipeline, because
    * the rendered line (and hence every downstream value) is recomputable
    * from the structured columns.
    */
  def sequences(spark: SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    val ev = events(spark, sfDir)
    val toks = graft.functions.F.text_to_tokens(col("raw"))
    ev.select(
      col("doc_id"),
      toks.as("tokens"),
      org.apache.spark.sql.functions.size(toks).as("n_tok"),
      col("source"))
  }
}
