package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.{Schemas, SourceConfig}
import graft.plans.LogPipeline

/** Structured Streaming face of the pipeline (reference ingest dataflow,
  * SURVEY.md §2.7): the file-tail + batch-flush machinery of the reference
  * (FileWatcher 1s poll, 5000/1s channel flush) collapses into Spark's file
  * source + micro-batch triggers; at-least-once + idempotent-insert becomes
  * checkpointed exactly-once.
  */
object StreamingPipeline {

  /** Streaming ingest: watch `inputDir` for new sequence parquet files,
    * parse -> enrich -> salted fan-out write per sink. The streaming
    * checkpoint tracks processed input files (the "offsets"); a restart with
    * the same checkpoint processes only new files — the streaming twin of
    * RouteJob's lineage manifests.
    *
    * Exactly-once: each micro-batch overwrites its OWN directory
    * (`batch=<id>/sink=.../`), keyed by the checkpointed batchId — a batch
    * replayed after a mid-write crash lands in the same place instead of
    * appending duplicates. (A blind `append` here would only be
    * at-least-once; the reference plays the same trick with its
    * UNIQUE-constraint dedup insert, SqliteEventRepository.go:33-35.)
    */
  def ingest(spark: SparkSession, inputDir: String, outDir: String,
      checkpointDir: String, configs: Seq[SourceConfig],
      saltBuckets: Int = 32,
      trigger: Trigger = Trigger.AvailableNow(),
      indexDir: Option[String] = None): StreamingQuery = {
    val stream = spark.readStream
      .schema(Schemas.sequences)
      .parquet(inputDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val enriched = LogPipeline.run(batch.sparkSession, batch, configs)
        LogPipeline.routeWrite(enriched, s"$outDir/batch=$batchId", saltBuckets)
        // maintain the inverted full-text index at ingest time, like the
        // reference inserts into FTS4 EventRaws alongside Events (S5);
        // same per-batch-id idempotence as the row write
        indexDir.foreach { d =>
          graft.plans.FullTextIndex.build(enriched, s"$d/batch=$batchId", saltBuckets)
        }
      }
      .start()
  }

  /** Streaming time-bucketed histogram with a watermark (the extension
    * aggregate, SURVEY.md §2.3/2.7): tumbling window per sink, late data
    * beyond the watermark dropped.
    */
  def histogram(spark: SparkSession, inputDir: String, configs: Seq[SourceConfig],
      queryName: String, bucket: String = "1 hour",
      watermark: String = "2 hours",
      checkpointDir: Option[String] = None): StreamingQuery = {
    val stream = spark.readStream
      .schema(Schemas.sequences)
      .parquet(inputDir)
    val enriched = LogPipeline.enrichStatic(LogPipeline.parse(stream), configs)
      .withColumn("sink", LogPipeline.sinkCol)
    val writer = enriched
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), bucket), col("sink"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket_start"), col("sink"), col("n"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
    // an explicit (e.g. tmpfs-backed) checkpoint skips the default
    // disk-temp-dir state-store/commit-log churn — a fixed per-query cost
    // that dwarfs the actual aggregation on small-batch benches
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }
}
