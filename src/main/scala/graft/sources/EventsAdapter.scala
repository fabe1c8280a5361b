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

  /** Configs for the mixed-shape corpus: kv + access-combined + json —
    * all three parser paths (RegexFileParser kv dispatch, the access
    * extractor with Go ref-layout time, JsonFileParser with
    * UNIX_DECIMAL_NANOS), reusing the synthetic-corpus definitions.
    */
  def mixedConfigs: Seq[SourceConfig] =
    configs.head +: graft.data.SequenceGen.configs.drop(1)

  /** Mixed-shape sequences derived from the events parquet: `event_id % 3`
    * picks the rendered line (kv / access-combined / json). Every byte is a
    * pure function of the structured columns, so the DuckDB oracle can
    * recompute the full parse of each file type — including the
    * second-truncating access layout and the reference's
    * UNIX_DECIMAL_NANOS decimals-as-integer-nanos quirk
    * (pkg/logsuck/parser/ParseTime.go:37-52, JsonFileParser.go:41-50).
    */
  def mixedSequences(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val mode = pmod(col("event_id"), lit(3))
    val kvRaw = concat(
      date_format(col("ts"), "yyyy/MM/dd HH:mm:ss.SSSSSS"),
      lit(" performing action eventType="), col("event_type"),
      lit(" userId="), col("user_id"), lit(" eventId="), col("event_id"))
    val accessTime = concat(date_format(col("ts"), "dd/MMM/yyyy:HH:mm:ss"), lit(" +0000"))
    val status = lit(200) + pmod(col("user_id"), lit(4)) * 100
    val accessRaw = concat(
      lit("203.0.113."), pmod(col("user_id"), lit(255)),
      lit(" - - ["), accessTime, lit("] \"GET /e/"), col("event_id"),
      lit(".txt HTTP/1.1\" "), status, lit(" "), pmod(col("event_id"), lit(10000)),
      lit(" \"-\" Firefox"))
    val unixDecimal = concat(unix_timestamp(col("ts")).cast("string"), lit("."),
      date_format(col("ts"), "SSSSSS"))
    val level = when(pmod(col("user_id"), lit(5)) === 0, "warn").otherwise("info")
    val jsonRaw = concat(
      lit("{\"level\":\""), level, lit("\",\"ts\":"), unixDecimal,
      lit(",\"msg\":\"event recorded\",\"eventid\":"), col("event_id"), lit("}"))
    val source = when(mode === 0, concat(lit("events-"), col("event_type"), lit(".log")))
      .when(mode === 1, lit("access-0.log"))
      .otherwise(lit("json-0.log"))
    val raw = when(mode === 0, kvRaw).when(mode === 1, accessRaw).otherwise(jsonRaw)
    val toks = graft.functions.F.text_to_tokens(raw)
    ev.select(
      col("event_id").cast("string").as("doc_id"),
      toks.as("tokens"),
      size(toks).as("n_tok"),
      source.as("source"))
  }

  /** DuckDB twins for the mixed corpus (all keyed on `event_id % 3`). */
  val MIXED_SINK_SQL: String =
    """CASE WHEN event_id % 3 = 0 THEN regexp_replace('events-' || event_type || '.log', '[^A-Za-z0-9_-]', '_', 'g')
      |     WHEN event_id % 3 = 1 THEN 'access-0_log' ELSE 'json-0_log' END""".stripMargin.replace("\n", " ")
  val MIXED_HOST_SQL: String =
    """CASE WHEN event_id % 3 = 0 THEN 'events-host'
      |     WHEN event_id % 3 = 1 THEN 'web-host' ELSE 'svc-host' END""".stripMargin.replace("\n", " ")
  /** Parsed event time per shape: kv keeps full micros; the access layout
    * truncates to seconds; UNIX_DECIMAL_NANOS reads the 6 rendered decimal
    * digits as integer NANOS (Go quirk) -> micros = orig_micros / 1000.
    */
  val MIXED_TS_SQL: String =
    """CASE WHEN event_id % 3 = 0 THEN ts
      |     WHEN event_id % 3 = 1 THEN date_trunc('second', ts)
      |     ELSE make_timestamp((epoch_us(ts) // 1000000) * 1000000 + (epoch_us(ts) % 1000000) // 1000) END""".stripMargin.replace("\n", " ")

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
