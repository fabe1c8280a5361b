package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.ProbeSupport.{time, withStageSum}

/** Scaling probe for the event-sequence operators (transitions,
  * sessionPaths) and token-window chunking, whose scale stories the 60k-row
  * oracle tables cannot show:
  *
  *   - transitions / sessionPaths: the 10M-event corpus crosses ONE
  *     user-keyed exchange for every window pass (the stacked leads and the
  *     session-id cumulative sum share the partitioning+ordering), and the
  *     path/pair counts collapse map-side to cell cardinality — the shuffle
  *     stays ~n records, never n × passes. Event types cycle t0→t1→…→t4
  *     per user, so every count is closed-form and every p is exactly 1.0;
  *     all five trigram paths TIE, so the result also pins the
  *     deterministic (n DESC, path ASC) k-cut order at scale.
  *   - chunking: map-only generate — ZERO shuffle records at any corpus
  *     size; total chunk count is the exact per-word-count formula summed
  *     over the deterministic length distribution.
  *   - field profile: n×K field occurrences must cross the wire as the
  *     S×K×V distinct value CELLS (map-side collapse), never as
  *     occurrences; carry/ndv/numeric closed-form per (source, key).
  *
  * Session geometry: each user's events come in 5-event bursts 60 s apart,
  * bursts 3600 s apart — the strict >1800 s gap rule must split exactly at
  * burst boundaries (3360 s between bursts) and never inside one.
  *
  * Env: PROBE_USERS (default 10,000), PROBE_EPER (events/user, default
  * 1,000), PROBE_CHUNK_DOCS (default 900,000 — must divide by 90),
  * PROBE_CPUS (default 32).
  */
object ScaleProbeEvents {

  /** u = id div eper, i = id mod eper;
    * ts = (i div 5) * 3600 s + (i mod 5) * 60 s past a fixed epoch;
    * event_type = t<(u+i) mod 5>.
    */
  def events(spark: SparkSession, users: Long, eper: Long): DataFrame =
    spark.range(users * eper).select(
      col("id").as("event_id"),
      expr(s"id div $eper").as("user_id"),
      expr(s"timestampadd(SECOND, ((id % $eper) div 5) * 3600 + (id % 5) * 60, " +
        "TIMESTAMP_NTZ '2024-01-01 00:00:00')").as("ts"),
      concat(lit("t"), pmod(expr(s"id div $eper") + pmod(col("id"), lit(5L)),
        lit(5L))).as("event_type"))

  /** Docs with word count 8 + (id mod 90): spans the below-width,
    * exact-width, and multi-chunk regimes of width=32 / stride=24.
    */
  def chunkDocs(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("doc_id"),
      array_join(transform(sequence(lit(1L), lit(8L) + pmod(col("id"), lit(90L))),
        x => concat(lit("tok"), pmod(x, lit(50L)))), " ").as("text"))

  def nChunks(words: Long, width: Long = 32, stride: Long = 24): Long =
    if (words <= width) 1L else (words - width + stride - 1) / stride + 1

  def main(args: Array[String]): Unit = {
    val users = sys.env.getOrElse("PROBE_USERS", "10000").toLong
    val eper = sys.env.getOrElse("PROBE_EPER", "1000").toLong
    val nChunkDocs = sys.env.getOrElse("PROBE_CHUNK_DOCS", "900000").toLong
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32").toInt
    require(users % 5 == 0, "PROBE_USERS must divide by 5 (type-cycle uniformity)")
    require(eper % 5 == 0, "PROBE_EPER must divide by 5 (whole 5-event bursts)")
    require(nChunkDocs % 90 == 0, "PROBE_CHUNK_DOCS must divide by 90 (length cycle)")
    val n = users * eper
    val shm = new File("/dev/shm")
    val base = if (shm.isDirectory && shm.canWrite) "/dev/shm"
      else System.getProperty("java.io.tmpdir")
    val root = Files.createDirectory(
      Paths.get(base, s"probe3-ev-${ProcessHandle.current().pid()}")).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-events-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", s"$root/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val in = s"$root/events"
      events(spark, users, eper).write.mode("overwrite").parquet(in)
      val ev = spark.read.parquet(in)
      graft.plans.EventAnalytics.transitions(
        ev.filter(col("user_id") < 10)).count() // JIT warmup

      // ---- transitions ---------------------------------------------------
      // per user, pair (t_k, t_{k+1}) appears #{i <= eper-2 : (u+i)%5 = k}
      // times; summed over the uniform user residues each of the 5 cyclic
      // pairs gets exactly (eper-1) * users / 5, and p = 1.0 (the cycle is
      // deterministic — each from-type has ONE successor).
      val ((tr, trSecs), trShuffle) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time { graft.plans.EventAnalytics.transitions(ev).collect() }
        }
      require(tr.length == 5, s"${tr.length} transition rows != 5")
      tr.foreach { r =>
        val from = r.getString(0).stripPrefix("t").toInt
        require(r.getString(1) == s"t${(from + 1) % 5}", s"non-cyclic pair: $r")
        require(r.getLong(2) == (eper - 1) * users / 5, s"count off: $r")
        require(r.getDouble(3) == 1.0, s"p != 1.0: $r")
      }
      // one user-keyed exchange (n records) + |types|^2 cells
      require(trShuffle <= n + n / 10,
        s"transitions shuffled $trShuffle records (bound ${n + n / 10})")
      println(f"""{"probe":"transitions","events":$n,"users":$users,""" +
        f""""shuffle_records":$trShuffle,"secs":$trSecs%.2f,""" +
        f""""events_per_sec":${n / trSecs}%.0f}""")

      // ---- session paths ---------------------------------------------------
      // bursts of 5 (60 s apart) split by the 3360 s inter-burst gap: each
      // burst yields 3 trigrams starting at burst offsets 0,1,2, i.e. path
      // residues (u+0),(u+1),(u+2) — over uniform u every cyclic path gets
      // 3/5 * users * (eper/5) occurrences; ALL FIVE TIE, pinning the
      // (n DESC, path ASC) order.
      val ((paths, spSecs), spShuffle) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time {
            graft.plans.EventAnalytics.sessionPaths(ev, gapSeconds = 1800)
              .collect()
          }
        }
      val wantPer = 3L * users / 5 * (eper / 5)
      require(paths.length == 5, s"${paths.length} paths != 5")
      val wantOrder = (0 until 5)
        .map(k => s"t$k>t${(k + 1) % 5}>t${(k + 2) % 5}").sorted
      paths.zip(wantOrder).foreach { case (r, want) =>
        require(r.getString(0) == want && r.getLong(1) == wantPer,
          s"path row off: $r (want $want -> $wantPer)")
      }
      require(spShuffle <= n + n / 10,
        s"sessionPaths shuffled $spShuffle records (bound ${n + n / 10})")
      println(f"""{"probe":"session_paths","events":$n,"per_path":$wantPer,""" +
        f""""shuffle_records":$spShuffle,"secs":$spSecs%.2f,""" +
        f""""events_per_sec":${n / spSecs}%.0f}""")

      // ---- chunking (map-only) ---------------------------------------------
      val cin = s"$root/cdocs"
      chunkDocs(spark, nChunkDocs).write.mode("overwrite").parquet(cin)
      val cdocs = spark.read.parquet(cin)
      graft.ml.TextAnalysis.chunkWindows(
        cdocs.filter(col("doc_id") < 1000)).count() // JIT warmup
      val wantChunks =
        nChunkDocs / 90 * (0 until 90).map(r => nChunks(8L + r)).sum
      val ((gotChunks, chSecs), chShuffle) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time { graft.ml.TextAnalysis.chunkWindows(cdocs).count() }
        }
      require(gotChunks == wantChunks,
        s"chunk count $gotChunks != closed form $wantChunks")
      // the only exchange is count()'s own partial-agg collapse: one cell
      // per scan partition — the chunk rows themselves never shuffle
      require(chShuffle <= 4L * cpus,
        s"chunking shuffled $chShuffle records — must be map-only")
      println(f"""{"probe":"chunking","docs":$nChunkDocs,"chunks":$gotChunks,""" +
        f""""shuffle_records":$chShuffle,"secs":$chSecs%.2f,""" +
        f""""docs_per_sec":${nChunkDocs / chSecs}%.0f}""")

      // ---- field profile: cells cross, occurrences don't --------------------
      // S sources × K fields × V values each, every event carrying all K
      // fields: the explode is n×K occurrences, but the wire must carry only
      // the S×K×V distinct cells (+ final profile rows). Closed form: each
      // (source, key) row has n/S carries, exactly V distinct values, and
      // the one numeric key classifies fully numeric.
      val (srcs, keys, vals) = (20L, 5, 100L)
      require(n % (srcs * vals) == 0, "event count must cycle sources × values evenly")
      val fieldCols = (0 until keys).flatMap { k =>
        val v = pmod(expr(s"(id div $srcs) + $k"), lit(vals))
        Seq(lit(s"f$k"),
          if (k == 0) v.cast("string") else concat(lit("v"), v))
      }
      val pin = s"$root/pdocs"
      spark.range(n).select(
          concat(lit("src"), pmod(col("id"), lit(srcs))).as("source"),
          map(fieldCols: _*).as("fields"))
        .write.mode("overwrite").parquet(pin)
      val pdocs = spark.read.parquet(pin)
      graft.plans.LogPipeline.fieldProfile(
        pdocs.limit(1000)).count() // JIT warmup
      val ((prof, fpSecs), fpShuffle) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time { graft.plans.LogPipeline.fieldProfile(pdocs).collect() }
        }
      require(prof.length == (srcs * keys).toInt, s"${prof.length} profile rows")
      prof.foreach { r =>
        require(r.getLong(2) == n / srcs && r.getLong(3) == vals,
          s"carry/ndv off: $r")
        val wantNum = if (r.getString(1) == "f0") n / srcs else 0L
        require(r.getLong(4) == wantNum, s"numeric off: $r")
      }
      // the map-side-combine guarantee: each task emits at most the cells
      // IT saw (≤ the global cell count), so the wire is bounded by
      // tasks × cells no matter how many occurrences exploded — at the
      // 10M default that is 320k vs 50M occurrences
      val cellBound = cpus.toLong * srcs * keys * vals + 4L * srcs * keys
      require(fpShuffle <= cellBound,
        s"profile shuffled $fpShuffle records (tasks×cells bound $cellBound) — occurrences crossed")
      println(f"""{"probe":"field_profile","events":$n,"occurrences":${n * keys},""" +
        f""""cells":${srcs * keys * vals},"shuffle_records":$fpShuffle,""" +
        f""""secs":$fpSecs%.2f,"events_per_sec":${n / fpSecs}%.0f}""")
    } finally {
      spark.stop()
      graft.util.Dirs.deleteRecursively(new File(root))
    }
  }
}
