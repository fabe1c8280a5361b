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

  /** Order-independent row-set signature over sink-tagged rows: (count,
    * bit_xor of xxhash64(sink, doc_id, tokens)). Including `sink` in the
    * hash makes a row silently CHANGING sinks flip the global xor, so one
    * (count, xor) pair carries the same per-sink-row-set guarantee the old
    * per-sink map did — while being computable as a plain global aggregate
    * (and hence as an [[org.apache.spark.sql.Observation]] riding the
    * rewrite itself, guide §1.2: one pass, not two).
    */
  private def rowSetSig(df: DataFrame): (Long, Long) = {
    val r = df.agg(count(lit(1)),
      bit_xor(xxhash64(col("sink"), col("doc_id"), col("tokens")))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  final case class Result(sinks: Int, rows: Long, filesBefore: Long, filesAfter: Long)

  /** Write `staged` via `write`, verify it with `sig` (recomputed on both
    * sides), then swap it into `outPath`. The old output is renamed ASIDE —
    * not deleted — before the swap, and the backup is dropped only after the
    * swap succeeds: a failed rename (or a crash between the two) always
    * leaves at least one complete output behind, old or new. A failed
    * write/verification leaves no partial output; once verified, the staging
    * dir may be the only complete copy, so post-verification failures keep
    * it for recovery instead of destroying both sides.
    */
  private def verifiedSwap[S](fs: org.apache.hadoop.fs.FileSystem,
      staging: Path, outPath: Path)(write: String => Unit)(sig: String => S,
      before: => S): Unit = { // by-name: the input signature may ride the
    var verified = false      // write itself as an Observation
    try {
      write(staging.toString)
      val after = sig(staging.toString)
      require(before == after,
        s"compaction changed the row set: before=$before after=$after")
      verified = true
      val backup = new Path(outPath.getParent,
        s".${outPath.getName}.compact-old-${System.nanoTime()}")
      val hadOld = fs.exists(outPath)
      if (hadOld && !fs.rename(outPath, backup))
        throw new java.io.IOException(s"failed to move $outPath aside to $backup")
      if (!fs.rename(staging, outPath)) {
        if (hadOld) fs.rename(backup, outPath): Unit // restore the old output
        throw new java.io.IOException(s"failed to rename $staging to $outPath")
      }
      if (hadOld) fs.delete(backup, true): Unit
      // a fresh verified output supersedes recovery copies kept by EARLIER
      // failed runs (post-verification rename failures, crash windows) —
      // reclaim them now instead of accumulating full-size orphans.
      // Single-writer-per-outDir assumption, like any compaction job.
      // Best-effort: the commit already happened, so a cleanup hiccup must
      // not turn a successful compaction into a reported failure.
      try {
        val stale = Seq(s".${outPath.getName}.compact-staging-",
          s".${outPath.getName}.compact-old-")
        fs.listStatus(outPath.getParent)
          .filter(s => stale.exists(s.getPath.getName.startsWith))
          .foreach(s => fs.delete(s.getPath, true): Unit)
      } catch { case _: java.io.IOException => () }
    } finally {
      if (!verified && fs.exists(staging)) fs.delete(staging, true): Unit
    }
  }

  private def fileCount(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val dfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!dfs.exists(p)) return 0L
    val it = dfs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
    n
  }

  /** Compact `inDir` (any batch/sink partition layout) into `outDir` (per sink). */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetRows: Long = 2000000L): Result = {
    val outPath = new Path(outDir)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(outPath.getParent,
      s".${outPath.getName}.compact-staging-${System.nanoTime()}")

    val in = spark.read.parquet(inDir)
      .select("doc_id", "tokens", "n_tok", "source", "host",
        "ts", "offset", "sink")
    // writer sizing from a column-less count (parquet footer row counts, no
    // data pass); the input row-set signature rides the rewrite itself as
    // an Observation — the previous shape read the full input TWICE (one
    // summarize pass + the rewrite). The output side is still recomputed
    // independently from the written files. A retried/replayed task would
    // double-fold the observed signature: the gate then REFUSES (staging
    // kept, no commit) — fail-safe, never a silent wrong commit.
    val rows = spark.read.parquet(inDir).count()
    val parts = math.max(1, math.min(Int.MaxValue.toLong, (rows + targetRows - 1) / targetRows)).toInt
    val obs = org.apache.spark.sql.Observation()
    verifiedSwap(fs, staging, outPath) { dst =>
      in.observe(obs, count(lit(1)).as("n"),
          bit_xor(xxhash64(col("sink"), col("doc_id"), col("tokens"))).as("sig"))
        .repartition(parts, col("sink"), pmod(hash(col("doc_id")), lit(parts * 8)))
        .sortWithinPartitions(col("sink"), col("ts"))
        .write.mode("overwrite").partitionBy("sink").parquet(dst)
    }(dst => rowSetSig(spark.read.parquet(dst)), {
      val m = obs.get
      (m("n").asInstanceOf[Long],
        m.get("sig").collect { case l: Long => l }.getOrElse(0L))
    })
    val sinks = {
      val it = fs.listStatus(outPath)
      it.count(s => s.isDirectory && s.getPath.getName.startsWith("sink="))
    }
    Result(sinks, rows, fileCount(spark, inDir), fileCount(spark, outDir))
  }

  /** Compact a [[graft.streaming.StreamingPipeline.histogramToSink]] delta
    * store: fold the newest base (if any) + all deltas into ONE base
    * snapshot ranked at the newest delta's batch id, then drop the
    * superseded parts. The streaming writer keeps appending deltas with
    * HIGHER batch ids concurrently (its ids only grow), and the serving
    * view composes `newest base + newer deltas`, so compaction never
    * blocks ingest or serving.
    *
    * Crash safety is the single atomic rename of the verified staging dir
    * to `base-<id>`: until it lands, readers see the old parts untouched;
    * after it lands, superseded parts (old bases, deltas <= id) are
    * invisible to every NEW reader (the serving view's base floor skips
    * them) but stay at their paths for `graceMs` so a CONCURRENT reader
    * whose plan listed them before the commit keeps reading — a
    * merge-on-read store may never delete under a live scan. Supersede
    * time is recorded as a tombstone marker (`.graft-reclaim/<part>`);
    * any marked part older than the grace is reclaimed by a LATER
    * compaction (including debris a crashed run left behind). The same
    * refuse-to-commit signature gate as the data compaction guards the
    * fold itself.
    */
  def compactHistogram(spark: SparkSession, outDir: String,
      graceMs: Long = 600000L): Result = {
    import graft.streaming.StreamingPipeline
    val outPath = new Path(outDir)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (oldBase, deltas) = StreamingPipeline.storeParts(spark, outDir)
    val filesBefore = fileCount(spark, outDir)
    // reclaim pass runs on EVERY call (even a no-op one): delete parts
    // whose tombstone aged past the grace, then stale staging debris
    val marks = new Path(outPath, ".graft-reclaim")
    val now = System.currentTimeMillis()
    try {
      if (fs.exists(marks)) fs.listStatus(marks).foreach { m =>
        if (now - m.getModificationTime > graceMs) {
          fs.delete(new Path(outPath, m.getPath.getName), true): Unit
          fs.delete(m.getPath, false): Unit
        }
      }
      if (fs.exists(outPath)) fs.listStatus(outPath)
        .filter { s =>
          s.getPath.getName.startsWith(".histbase-staging-") &&
            now - s.getModificationTime > graceMs
        }
        .foreach(s => fs.delete(s.getPath, true): Unit)
      // a crash between commit and tombstoning leaves superseded parts
      // unmarked (invisible to readers, never reclaimed): start their
      // grace clock now
      if (fs.exists(outPath)) {
        val floor = oldBase.map(_._1).getOrElse(-1L)
        fs.listStatus(outPath).map(_.getPath.getName).filter { n =>
          (n.startsWith("base-") &&
            n.stripPrefix("base-").toLongOption.exists(_ < floor)) ||
          (n.startsWith("delta=") &&
            n.stripPrefix("delta=").toLongOption.exists(_ <= floor))
        }.foreach { name =>
          val m = new Path(marks, name)
          if (!fs.exists(m)) { fs.mkdirs(marks): Unit; fs.create(m, true).close() }
        }
      }
    } catch { case _: java.io.IOException => () }
    if (deltas.isEmpty) // nothing newer than the base: no-op
      return Result(1, 0L, filesBefore, filesBefore)
    val newId = deltas.map(_._1).max
    // ONE listing snapshot feeds the signature AND the rewrite: a delta the
    // streaming writer appends while we run is simply not in this fold (the
    // next compaction takes it) — re-listing per phase would see different
    // file sets and fail the gate under steady ingest
    val served = StreamingPipeline.servedFrom(spark, outDir, oldBase, deltas)

    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        bit_xor(xxhash64(col("bucket_start"), col("sink"), col("n")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    val staging = new Path(outPath, s".histbase-staging-${System.nanoTime()}")
    var committed = false
    var rowsBefore = 0L
    try {
      // the "before" signature rides the staging write as an Observation
      // (CollectMetrics) instead of a separate full evaluation of the
      // merge-on-read view — one pass, same gate: `after` is still
      // recomputed independently from the written files
      val obs = org.apache.spark.sql.Observation()
      served.observe(obs, count(lit(1)).as("n"),
          bit_xor(xxhash64(col("bucket_start"), col("sink"), col("n"))).as("sig"))
        .write.mode("overwrite").parquet(staging.toString)
      val m = obs.get
      val before = (m("n").asInstanceOf[Long],
        m.get("sig").collect { case l: Long => l }.getOrElse(0L))
      rowsBefore = before._1
      val after = sig(spark.read.parquet(staging.toString))
      require(before == after,
        s"histogram compaction changed the served rows: before=$before after=$after")
      if (!fs.rename(staging, new Path(outPath, s"base-$newId")))
        throw new java.io.IOException(s"failed to commit $staging as base-$newId")
      committed = true
    } finally {
      if (!committed && fs.exists(staging)) fs.delete(staging, true): Unit
    }
    // tombstone the just-superseded parts (best-effort: the commit already
    // happened); their marker mtime IS the supersede time, so the grace
    // clock starts now, not at the part's write time
    try {
      fs.mkdirs(marks): Unit
      (oldBase.map { case (id, _) => s"base-$id" } ++
        deltas.map { case (id, _) => s"delta=$id" }).foreach { name =>
        val m = new Path(marks, name)
        if (!fs.exists(m)) fs.create(m, true).close()
      }
    } catch { case _: java.io.IOException => () }
    Result(1, rowsBefore, filesBefore, fileCount(spark, outDir))
  }

  /** Compact the per-batch inverted-index dirs that streaming ingest
    * accumulates (`indexDir/batch=N/`, StreamingPipeline.ingest) back into
    * one globally word-ordered postings table — restoring the row-group
    * min/max pruning that FullTextIndex.build establishes (a word's postings
    * scattered across every batch dir defeats it). Same verified-swap
    * signature gate as the data compaction: count + bit_xor of
    * xxhash64(word, doc_id) must survive the rewrite.
    */
  def compactIndex(spark: SparkSession, inDir: String, outDir: String,
      numPartitions: Int = 0): Result = {
    val outPath = new Path(outDir)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(outPath.getParent,
      s".${outPath.getName}.compact-staging-${System.nanoTime()}")
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism

    def sig(dir: String): (Long, Long) = {
      val r = spark.read.parquet(dir).select("word", "doc_id")
        .agg(count(lit(1)), bit_xor(xxhash64(col("word"), col("doc_id")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val before = sig(inDir)
    verifiedSwap(fs, staging, outPath) { dst =>
      spark.read.parquet(inDir).select("word", "doc_id")
        .repartitionByRange(parts, col("word"), col("doc_id"))
        .sortWithinPartitions("word", "doc_id")
        .write.mode("overwrite").parquet(dst)
    }(sig, before)
    Result(1, before._1, fileCount(spark, inDir), fileCount(spark, outDir))
  }
}
