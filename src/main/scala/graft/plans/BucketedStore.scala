package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed storage layout for the events store — the disk-layout lever
  * for repeated per-key analytics at 100 TB: write once bucketed (and
  * sorted) by the analytics key, then every downstream `groupBy(key)` /
  * self-join / sessionization reads co-located buckets and skips its
  * exchange entirely (the bucketed scan reports
  * `HashPartitioning(user_id, n)`, so the planner drops the shuffle —
  * PlanSpec pins this with a zero-Exchange assertion).
  *
  * The reference's storage keeps one SQLite table and pays no shuffles
  * anywhere (single process — reference
  * plugins/sqlite_events/SqliteEventRepository.go); THIS is the
  * distributed analog of that locality: the key's rows live together on
  * disk, so per-key work is partition-local forever after one write.
  *
  * Buckets are a FIXED count chosen at write time (like shuffle
  * partitions, not like data volume): at 10^12 rows you size buckets so
  * one bucket's hottest key set fits a task, and the per-file sort keeps
  * per-key runs contiguous for range scans.
  */
object BucketedStore {

  /** Write `events` as a parquet table bucketed by `user_id`, sorted
    * within each bucket by (user_id, ts). External table: data lands at
    * `dir`, only metadata enters the session catalog (re-registering the
    * same name replaces it).
    */
  def writeBucketed(events: DataFrame, table: String, dir: String,
      buckets: Int = 32): Unit = {
    val spark = events.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    events.write.mode("overwrite")
      .format("parquet").option("path", dir)
      .bucketBy(buckets, "user_id").sortBy("user_id", "ts")
      .saveAsTable(table)
  }

  /** Per-user activity stats over the bucketed table — the repeated-query
    * shape the layout pays for: groupBy on the bucket key plans as scan →
    * partial agg → final agg with NO exchange.
    */
  def userStats(spark: SparkSession, table: String): DataFrame =
    spark.table(table).groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))

  def userStatsSql(eventsRel: String): String =
    s"""SELECT user_id, count(*) AS n_events,
       | min(ts) AS first_ts, max(ts) AS last_ts
       | FROM $eventsRel GROUP BY user_id""".stripMargin.replace("\n", " ")
}
