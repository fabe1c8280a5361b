package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.F
import graft.model.SourceConfig

/** The parse -> enrich -> route -> aggregate pipeline over the pre-tokenized
  * sequences table (BASELINE.json north rule).
  *
  * Stage mapping (SURVEY.md §7.0):
  *   parse     — render tokens -> raw, extract dynamic fields, derive ts
  *               (reference P1-P3); tokens carried untouched (per-row
  *               token-array-equality invariant)
  *   enrich    — broadcast equi-join against the source_config dimension;
  *               the non-equi glob match is evaluated once per *distinct
  *               source* (tiny) and converted to an equi-join key, so the
  *               big side never sees a nested-loop join (reference J2)
  *   route     — salted repartition + fan-out write partitioned by sink
  *               (reference S5-S7 forwarder/recipient topology)
  *   aggregate — per-sink counts (A3), field stats (A1), time histogram
  *
  * All stages are Dataset/Catalyst expressions — one shuffle for the route
  * (repartition) and one tiny one for the enrich dimension; the parse stage
  * is pure whole-stage-codegen map work.
  */
object LogPipeline {

  /** parse: sequences(doc_id, tokens, n_tok, source) -> + raw, offset, source_id.
    * `offset` is the numeric doc index (monotone per generation order) —
    * the rebuild's analog of the file byte offset.
    */
  def parse(sequences: DataFrame): DataFrame =
    sequences
      .withColumn("raw", F.tokens_to_text(col("tokens")))
      .withColumn("offset", regexp_extract(col("doc_id"), "(\\d+)$", 1).cast("long"))
      .withColumn("source_id", col("source"))

  /** The config dimension as a DataFrame (broadcast side). */
  def configDim(spark: SparkSession, configs: Seq[SourceConfig]): DataFrame = {
    import spark.implicits._
    configs.zipWithIndex.map { case (c, i) =>
      (c.source_glob, F.globToRegex(c.source_glob), c.file_type, c.time_field,
        c.time_layout, c.host, c.host_type, i)
    }.toDF("source_glob", "glob_regex", "file_type", "time_field",
      "time_layout", "cfg_host", "host_type", "priority")
  }

  /** enrich: resolve each event's source to its config (first match wins by
    * priority) and stamp host/host_type/ts + the dynamic fields map.
    *
    * Scale shape: `distinct sources` is a partial-aggregated shuffle over a
    * low-cardinality key; the glob (non-equi) match runs on that tiny frame
    * only; the result is broadcast and the 10^12-row side does a broadcast
    * hash equi-join — no big-side shuffle at all.
    */
  def enrich(spark: SparkSession, parsed: DataFrame, configs: Seq[SourceConfig]): DataFrame = {
    val dim = configDim(spark, configs)
    val sources = parsed.select("source").distinct()
    val resolved = sources.join(dim, expr("source rlike glob_regex"), "left")
      .groupBy("source")
      .agg(min_by(
        struct(col("file_type"), col("time_field"), col("time_layout"),
          col("cfg_host"), col("host_type"), col("priority")),
        col("priority")).as("cfg"))
      .select(col("source"),
        coalesce(col("cfg.cfg_host"), lit("unknown-host")).as("host"),
        coalesce(col("cfg.host_type"), lit("unknown")).as("host_type"),
        coalesce(col("cfg.file_type"), lit("kv")).as("file_type"),
        // sink is a pure function of `source`: computing it here (once per
        // distinct source) instead of per row removes a regexp_replace from
        // the 10^12-row side (measured 13s/8M rows — the single biggest
        // map-side cost after the fix)
        sinkCol.as("sink"))

    val withHost = parsed.join(broadcast(resolved), Seq("source"), "left")

    // fields + ts are per-config *plan constants* (extractor regexes and time
    // layouts can't travel through a join), so they compile to expressions
    // with the same first-match-wins glob dispatch. Both run straight off the
    // tokens payload; ts goes through the time-only extraction so plans that
    // never touch `fields` (the fan-out write) prune the map build entirely.
    withHost
      .withColumn("fields",
        F.extract_event_tokens(col("tokens"), col("host"), col("source"), configs))
      .withColumn("ts", tsColumnTokens(configs))
  }

  /** enrich without the dimension join — host/host_type resolved through the
    * same first-match-wins CASE chain as fields/ts. Used on unbounded
    * (streaming) inputs where a distinct+join per micro-plan isn't legal, and
    * as the zero-shuffle enrich when the config set is small.
    */
  def enrichStatic(parsed: DataFrame, configs: Seq[SourceConfig]): DataFrame = {
    def chain(f: SourceConfig => String, dflt: String): Column =
      configs.foldRight(lit(dflt): Column) { (cfg, acc) =>
        when(F.globMatches(col("source"), cfg.source_glob), lit(f(cfg))).otherwise(acc)
      }
    parsed
      .withColumn("host", chain(_.host, "unknown-host"))
      .withColumn("host_type", chain(_.host_type, "unknown"))
      .withColumn("file_type", chain(_.file_type, "kv"))
      .withColumn("fields",
        F.extract_event_tokens(col("tokens"), col("host"), col("source"), configs))
      .withColumn("ts", tsColumnTokens(configs))
  }

  /** Search-time field extraction per source config (first glob match wins,
    * memoized inside one compact ExtractEvent expression — a CASE-WHEN chain
    * of per-config extractions blew generated methods past JIT limits).
    */
  def fieldsColumn(raw: Column, host: Column, source: Column,
      configs: Seq[SourceConfig]): Column =
    F.extract_event(raw, host, source, configs)

  /** Event-time: parse `_time` with the per-config layout; rows without an
    * extractable time get a deterministic fallback (the reference stamps
    * wall-clock at read — EventPublishers.go:86-98 — which we replace with a
    * fixed epoch for reproducibility; documented divergence).
    */
  def tsColumn(configs: Seq[SourceConfig]): Column = {
    val timeStr = try_element_at(col("fields"), lit("_time"))
    val fallbackTs = to_timestamp(lit("1970-01-01 00:00:00"))
    coalesce(F.event_time(timeStr, col("source"), configs), fallbackTs)
  }

  /** [[tsColumn]] from tokens without touching `fields`: the time-only
    * extraction yields the identical `_time` string, and not referencing
    * `fields` lets Catalyst prune the whole map build out of plans that
    * don't project it (the route write path).
    */
  def tsColumnTokens(configs: Seq[SourceConfig]): Column = {
    val timeStr = F.extract_time_tokens(col("tokens"), col("source"), configs)
    val fallbackTs = to_timestamp(lit("1970-01-01 00:00:00"))
    coalesce(F.event_time(timeStr, col("source"), configs), fallbackTs)
  }

  /** Sink key for the fan-out write: filesystem-safe source name. */
  def sinkCol: Column = regexp_replace(col("source"), "[^A-Za-z0-9_-]", "_")

  /** Route-shuffle width from DATA volume, not cluster width. At a fixed
    * width the per-task volume grows linearly with input, and the write
    * stage falls off a memory cliff once sort buffers + parquet encoders
    * outgrow their share of the executor heap (measured on the scaling rig:
    * 64M rows over 16 tasks = 160 s vs 79 s over 64 tasks — BASELINE.md
    * headroom notes). A real cluster sizes tasks by bytes; so do we: exact
    * input-file byte sum (driver metadata, no job), `floor` = writer
    * parallelism for small inputs, ~96 MB of input parquet per writer task,
    * rounded UP to a whole multiple of the writer slots — a ragged last
    * wave (e.g. 19 tasks on 16 slots) costs a full extra wave of wall time
    * for 3 tasks' worth of work (measured: 20.3 s vs 14.9 s at 16M rows).
    * Non-file-backed inputs (tests, streaming micro-batches) keep the floor.
    */
  private def routeParts(df: DataFrame, floor: Int,
      targetBytes: Long = 192L << 20): Int = {
    val bytes = try {
      val files = df.inputFiles
      if (files.isEmpty) 0L
      else {
        val conf = df.sparkSession.sparkContext.hadoopConfiguration
        files.iterator.map { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(conf).getFileStatus(p).getLen
        }.sum
      }
    } catch { case _: Exception => 0L }
    val byParts = math.min(1 << 24, (bytes + targetBytes - 1) / targetBytes).toInt
    val waves = (byParts + floor - 1) / floor
    math.max(floor, math.max(1, waves) * floor)
  }

  /** route: salted repartition + fan-out write, one directory per sink.
    *
    * The salt spreads each (possibly huge) source across all writer tasks so
    * a 50%-skewed source can't serialize into one task — the explicit skew
    * handling the north rule demands (AQE would also rebalance; we don't
    * rely on it). The salt domain is 8x the partition count: with a domain
    * equal to the partition count, hash collisions of (sink, salt) combos
    * leave some writers with 3-4x the median load (observed skew 3.8); an
    * oversized domain evens the per-partition combo count (observed < 1.3).
    * The explicit partition count also stops AQE coalescing the salt away
    * on small inputs. `numPartitions` is the writer-parallelism floor; the
    * actual width scales with input bytes via [[routeParts]].
    */
  def routeWrite(enriched: DataFrame, outDir: String, numPartitions: Int,
      mode: String = "overwrite"): Unit = {
    // Schema-on-read, like the reference ("fields are not stored",
    // SURVEY.md §1.2): persist only the payload + metadata. `raw` and
    // `fields` are pure functions of `tokens` and re-derived at search time —
    // at 10^12 rows this halves the write volume of the fan-out. `source_id`
    // is `source` by construction on every write path ([[parse]] defines it
    // so), so it is NOT stored either — [[openSinks]] re-derives it; that's
    // one string column off every shuffled and written row (guide §2.3
    // narrower rows / §6 write volume).
    val persisted = enriched.select(
      col("doc_id"), col("tokens"), col("n_tok"), col("source"),
      col("host"), col("ts"), col("offset"), col("sink"))
    val parts = routeParts(persisted, numPartitions)
    val salted = persisted
      .withColumn("_salt", pmod(hash(col("doc_id")), lit(parts * 8)))
    salted.repartition(parts, col("sink"), col("_salt")).drop("_salt")
      // cluster each output file by event time: the dynamic-partition writer
      // must sort by `sink` anyway, and adding `ts` gives parquet row-group
      // min/max stats that prune time-bounded queries (logsuck queries are
      // time-bounded) — the 100 TB analog of the reference's DESC index
      .sortWithinPartitions(col("sink"), col("ts"))
      .write.mode(mode).partitionBy("sink").parquet(outDir)
  }

  /** Re-open a routed sink directory as the query layer's canonical event
    * frame (raw re-rendered from tokens; fields re-extracted per query;
    * source_id re-derived — [[routeWrite]] stores neither).
    */
  def openSinks(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
      .withColumn("raw", F.tokens_to_text(col("tokens")))
      .withColumn("source_id", col("source"))

  /** aggregate: per-sink counts + order-independent routed-row-set checksum
    * (count + bit_xor of xxhash64(doc_id, tokens) — verifies row-set AND
    * token-array equality without collecting), per the north rule's
    * "per-sink aggregate counts + routed-row-set equality + per-row
    * token-array equality".
    */
  def sinkSummary(enriched: DataFrame): DataFrame =
    (if (enriched.columns.contains("sink")) enriched
     else enriched.withColumn("sink", sinkCol))
      .groupBy("sink")
      .agg(
        count(lit(1)).as("n"),
        bit_xor(xxhash64(col("doc_id"), col("tokens"))).as("rowset_sig"),
        sum(col("n_tok").cast("long")).as("total_tokens"))

  /** A1 field stats over the enriched frame. */
  def fieldStats(enriched: DataFrame): DataFrame =
    enriched.select(col("sink"), explode(col("fields")).as(Seq("key", "value")))
      .groupBy("sink", "key", "value").agg(count(lit(1)).as("occurrences"))

  /** Time-bucketed histogram per sink (1h tumbling). */
  def histogram(enriched: DataFrame, bucket: String = "1 hour"): DataFrame =
    enriched.groupBy(window(col("ts"), bucket).as("w"), col("sink"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("bucket_start"), col("sink"), col("n"))

  /** Numeric-literal shape (integers + %f-style decimals); anchored, in the
    * Java ∩ RE2 subset so both engines agree.
    */
  val NUMERIC_RX = "^-?[0-9]+(\\.[0-9]+)?$"

  /** Schema-on-read field profile — the admin panel for a log store whose
    * fields exist only because extraction discovered them (the reference's
    * entire data model): per (source, key) how many events carry the field,
    * how many distinct values it takes, and how many values look numeric —
    * the "is this field a dimension or a measure, and did a deploy change
    * its shape" view.
    *
    * Scale shape: the fields-map explode collapses MAP-SIDE to distinct
    * (source, key, value) cells before the one exchange (a field carried by
    * a billion events with 200 values crosses as 200 cells), then the
    * profile aggregates cell counts at (source, key) cardinality. The
    * numeric classification runs on cells, not events.
    */
  def fieldProfile(enriched: DataFrame): DataFrame =
    profileFromCells(
      enriched.select(col("source"), explode(col("fields")).as(Seq("key", "value")))
        .groupBy("source", "key", "value").agg(count(lit(1)).as("n")))

  /** The profile aggregation over (source, key, value, n) cells — shared by
    * the batch face above and the streaming face (the served update-delta
    * cells from `StreamingPipeline.fieldCellsToSink`; cells may be further
    * split by a window column, which changes no total — counts sum and
    * values stay distinct).
    */
  def profileFromCells(cells: DataFrame): DataFrame =
    cells.groupBy("source", "key")
      .agg(sum(col("n")).as("n"),
        countDistinct(col("value")).as("ndv"),
        sum(when(col("value").rlike(NUMERIC_RX), col("n")).otherwise(0L))
          .as("n_numeric"))

  /** Full batch pipeline: returns the enriched frame (lazily) with sink col
    * (already provided by the enrich dimension — no per-row recompute).
    */
  def run(spark: SparkSession, sequences: DataFrame,
      configs: Seq[SourceConfig]): DataFrame =
    enrich(spark, parse(sequences), configs)
}
