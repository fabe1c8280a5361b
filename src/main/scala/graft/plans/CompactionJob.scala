package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for routed sinks.
  *
  * The streaming fan-out accumulates one directory per micro-batch
  * (`batch=N/sink=S/part-*`); at cluster scale the file count, not the
  * byte count, becomes the metastore/planning bottleneck. Compaction
  * rewrites a routed output into ~`targetRows`-sized files per sink,
  * keeping the time clustering (sort by ts within files -> row-group
  * min/max pruning survives).
  *
  * Safety: the order-independent row-set signature (count + bit_xor of
  * xxhash64(doc_id, tokens), the same invariant the north rule uses for
  * routed-row equality) is computed per sink on both sides and the job
  * REFUSES to commit a mismatch — the rewrite lands in a staging dir and
  * is renamed into `outDir` only after the signatures match, so a failed
  * verification leaves no partial output behind. The reference has no
  * compaction (SQLite is one file); this is pure scale machinery.
  */
object CompactionJob {

  private def summarize(df: DataFrame): Map[String, (Long, Long)] =
    df.groupBy("sink")
      .agg(count(lit(1)).as("n"),
        bit_xor(xxhash64(col("doc_id"), col("tokens"))).as("sig"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  final case class Result(sinks: Int, rows: Long, filesBefore: Long, filesAfter: Long)

  /** Compact `inDir` (any batch/sink partition layout) into `outDir` (per sink). */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetRows: Long = 2000000L): Result = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val outPath = new Path(outDir)
    val fs = outPath.getFileSystem(hconf) // works for local, hdfs, s3a alike
    val staging = new Path(outPath.getParent,
      s".${outPath.getName}.compact-staging-${System.nanoTime()}")

    val in = spark.read.parquet(inDir)
      .select("doc_id", "tokens", "n_tok", "source", "host", "source_id",
        "ts", "offset", "sink")
    val before = summarize(in)
    val rows = before.values.map(_._1).sum
    val parts = math.max(1, math.min(Int.MaxValue.toLong, (rows + targetRows - 1) / targetRows)).toInt
    try {
      in.repartition(parts, col("sink"), pmod(hash(col("doc_id")), lit(parts * 8)))
        .sortWithinPartitions(col("sink"), col("ts"))
        .write.mode("overwrite").partitionBy("sink").parquet(staging.toString)
      val after = summarize(spark.read.parquet(staging.toString))
      require(before == after,
        s"compaction changed the routed row set: before=$before after=$after")
      // verified: swap the staging dir in (rename is atomic-enough on HDFS/
      // local; on object stores it is a copy, but still happens only after
      // the signature check)
      if (fs.exists(outPath)) fs.delete(outPath, true)
      if (!fs.rename(staging, outPath))
        throw new java.io.IOException(s"failed to rename $staging to $outPath")
    } finally {
      if (fs.exists(staging)) fs.delete(staging, true): Unit
    }
    def fileCount(dir: String): Long = {
      val p = new Path(dir)
      val dfs = p.getFileSystem(hconf)
      if (!dfs.exists(p)) return 0L
      val it = dfs.listFiles(p, true)
      var n = 0L
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    Result(before.size, rows, fileCount(inDir), fileCount(outDir))
  }
}
