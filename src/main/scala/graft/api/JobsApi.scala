package graft.api

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.compile.{EventsFrame, Frame, QueryEngine, TableFrame}

/** The reference's job API surface (internal/web/Web.go:163-276 —
  * startJob / jobStats / jobResults / jobFieldStats) rebuilt over the query
  * engine. A "job" is a compiled, lazily-evaluated frame; its ORDERED result
  * and field-stats aggregate materialize once into Spark block storage on
  * the first action (the JobResults/JobFieldValues store of the reference,
  * plugins/sqlite_jobs/SqliteJobRepository.go:34-49) and every later page /
  * stat / field-stat serves from those caches. The first action pays the
  * one-time sort (exactly like the reference's insert-sorted store);
  * [[releaseJob]] is the eviction valve for long-lived processes.
  *
  * Lifecycle mirrors pkg/logsuck/jobs/Job.go:24-40 (Running/Finished/
  * Aborted) and internal/jobs/Engine.go:84-174 (Abort cancels the running
  * work): every action for job N runs under Spark job group `graft-job-N`
  * with interruptOnCancel, and abortJob cancels that group — in-flight
  * stages stop, not just the bookkeeping entry.
  */
class JobsApi(engine: QueryEngine, indexDir: Option[String] = None,
    jobTtlMillis: Option[Long] = None) {

  final class Job private[JobsApi] (val id: Long, val query: String,
      val frame: Frame, val sortMode: String, val columnOrder: Seq[String]) {
    @volatile private[JobsApi] var stateRef: String = JobsApi.Running
    def state: String = stateRef

    /** Wall-clock millis when the job reached a terminal state (Finished /
      * Aborted); 0 while Running. The TTL sweep ([[expireJobs]]) ages jobs
      * out from this mark — a long-poll client keeps its job alive by
      * design only until it finishes, after which the TTL clock runs.
      */
    @volatile private[JobsApi] var terminalAtMs: Long = 0L
    private[JobsApi] def markTerminal(state: String): Unit = {
      stateRef = state
      if (terminalAtMs == 0L) terminalAtMs = System.currentTimeMillis()
    }

    /** Persisted-results analog of the reference's per-job results store
      * (plugins/sqlite_jobs/SqliteJobRepository.go:34-49,99-186 persists
      * JobResults/JobTableResults once and serves every page from it): the
      * ORDERED result materializes once into executor block storage
      * (memory, spilling to disk) on the job's first stats/results action;
      * every later page, stat, and field-stat reads the cache instead of
      * re-running the compiled query + sort. lazy val = exactly-once under
      * concurrent first actions.
      */
    private[JobsApi] lazy val results: DataFrame = {
      val ordered = frame match {
        case TableFrame(df, _) => df
        case f: EventsFrame if sortMode == "preserveArgOrder" => f.df
        case f: EventsFrame => QueryEngine.newestFirst(f)
      }
      track(ordered.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }

    /** The cached results re-wrapped as a Frame (same shape as `frame`) so
      * the engine's aggregate operators run over the persisted rows.
      */
    private[JobsApi] def resultsFrame: Frame = frame match {
      case TableFrame(_, order) => TableFrame(results, order)
      case _: EventsFrame => EventsFrame(results)
    }

    /** JobFieldValues analog: the (key, value, occurrences) aggregate,
      * computed over the persisted results and itself persisted on first
      * use — jobFieldStats for different fields then only filters it.
      * An imported job serves the aggregate written at export time instead
      * of recomputing it.
      */
    private[JobsApi] var fieldStatsOverride: Option[DataFrame] = None
    private[JobsApi] lazy val fieldStatsCached: DataFrame =
      track(fieldStatsOverride.getOrElse(engine.fieldStats(resultsFrame))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    /** Partition-offset index over the pinned results cache: prefix row
      * starts per cached partition, built in ONE narrow pass with the
      * first results/stats action. Positional pages then read ONLY the
      * cached partitions containing [skip, skip+take) — no per-page
      * global shuffle (the previous offset+limit plan funneled the whole
      * skipped prefix through a single-partition exchange on EVERY page),
      * no scan of partitions before or after the page. The matched-event
      * count is the index's last entry, so the pass doubles as the
      * jobStats count. lazy val = exactly-once, like `results`.
      */
    private[JobsApi] lazy val partStarts: Array[Long] = {
      val counts = results.rdd
        .mapPartitionsWithIndex((i, it) => Iterator((i, {
          var n = 0L
          while (it.hasNext) { it.next(); n += 1 }
          n
        })))
        .collect().sortBy(_._1).map(_._2)
      counts.scanLeft(0L)(_ + _)
    }

    /** First (ts, doc_id) key per cached partition — the range bounds of
      * the newest-first sort, one narrow pass, built lazily on the first
      * keyset page. [[jobResultsAfter]] locates the anchor's partition in
      * these bounds and prunes the scan to partitions at/after it: without
      * the bounds, a filter+limit still scanned the whole prefix (every
      * row with ts >= anchor fails the predicate but is read), making a
      * deep keyset page O(prefix) like OFFSET. Only meaningful for
      * timestampDesc jobs (the only mode with the total key).
      */
    private[JobsApi] lazy val partFirstKeys: Array[Option[(java.time.LocalDateTime, String)]] = {
      val schema = results.schema
      val tsIdx = schema.fieldIndex("ts")
      val didIdx = schema.fieldIndex("doc_id")
      results.rdd.mapPartitionsWithIndex((i, it) =>
        Iterator((i, if (it.hasNext) {
          val r = it.next()
          Some((JobsApi.rowLdt(r.get(tsIdx)), r.getString(didIdx)))
        } else None)))
        .collect().sortBy(_._1).map(_._2)
    }

    /** The events wire JSON (reference EventWithExtractedFields keys,
      * pkg/logsuck/events/Event.go:46-54) rendered ONCE per job and pinned:
      * one narrow map pass over the persisted results (same partitioning,
      * so [[partStarts]] slices apply verbatim). Serving a page is then a
      * partition-pruned RDD job over cached strings — the previous
      * per-page path built a fresh DataFrame + analysis + codegen for
      * EVERY page (40+ pages per exhaustive client), which dominated the
      * HTTP serving wall (guide §1.2: don't re-plan per request).
      * Events frames only (tables keep the per-page DataFrame path).
      */
    private[JobsApi] lazy val wireJsonRdd: org.apache.spark.rdd.RDD[String] = {
      val r = results.select(
          col("doc_id").as("Id"), col("raw").as("Raw"),
          col("ts").as("Timestamp"), col("host").as("Host"),
          col("source").as("Source"), col("source_id").as("SourceId"),
          col("fields").as("Fields"))
        .toJSON.rdd
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      persistedRdds.add(r)
      r
    }

    /** Driver-held page cache for SMALL results: when the whole result is
      * at most [[JobsApi.LocalPageCacheMaxRows]] rows, the rendered wire
      * JSON collects once and every page is an in-memory array slice —
      * zero Spark jobs per page (the reference serves pages straight from
      * its job-results table the same way). Bounded by the row threshold
      * so a huge result keeps the executor-side partition-pruned path; the
      * strings are the same [[wireJsonRdd]] output, so the wire bytes are
      * identical either way.
      */
    private[JobsApi] lazy val wireJsonLocal: Option[Array[String]] =
      if (partStarts.last <= JobsApi.LocalPageCacheMaxRows)
        Some(wireJsonRdd.collect())
      else None

    // memoized jobStats — the second stats call launches zero Spark jobs
    @volatile private[JobsApi] var statsCache: JobStats = null

    // every frame this job actually persisted, in materialization order —
    // unpersistAll drops exactly these (touching the lazy vals there would
    // BUILD unmaterialized plans just to unpersist them, and a flag on one
    // lazy val alone would miss a cache the other one created, e.g. an
    // imported job that only ever materialized fieldStatsCached)
    private val persistedFrames =
      new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
    private val persistedRdds =
      new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]()
    private def track(df: DataFrame): DataFrame = { persistedFrames.add(df); df }

    /** Drop every cached artifact of this job. */
    private[JobsApi] def unpersistAll(): Unit = {
      var df = persistedFrames.poll()
      while (df != null) { df.unpersist(blocking = false); df = persistedFrames.poll() }
      var r = persistedRdds.poll()
      while (r != null) { r.unpersist(blocking = false); r = persistedRdds.poll() }
    }
  }

  final case class JobStats(state: String, numMatchedEvents: Long,
      fieldOccurrences: Map[String, Long])

  private val nextId = new java.util.concurrent.atomic.AtomicLong(1)
  private val jobs = new java.util.concurrent.ConcurrentHashMap[Long, Job]()

  private def sc = engine.events.sparkSession.sparkContext
  private def groupId(id: Long) = s"graft-job-$id"

  /** Run a Spark action on behalf of a job: tagged with the job's group (so
    * abort can cancel it); a cancellation surfaces as state=aborted.
    */
  private def withJobGroup[A](job: Job)(body: => A): A = {
    sc.setJobGroup(groupId(job.id), s"graft query: ${job.query}", interruptOnCancel = true)
    try body
    catch { case e: Throwable =>
      if (job.stateRef == JobsApi.Running && JobsApi.isCancellation(e))
        job.markTerminal(JobsApi.Aborted)
      throw e
    }
    finally sc.clearJobGroup()
  }

  /** Go time.ParseDuration subset: [+-]?(<num><unit>)+ with units
    * ns, us, ms, s, m, h (Web.go:349 passes relativeTime through it).
    * Returns millis.
    */
  def parseGoDuration(s: String): Long = {
    val m = java.util.regex.Pattern
      .compile("([0-9]*\\.?[0-9]+)(ns|us|µs|ms|s|m|h)").matcher(s)
    var millis = 0.0
    var any = false
    while (m.find()) {
      any = true
      val v = m.group(1).toDouble
      millis += (m.group(2) match {
        case "ns" => v / 1e6
        case "us" | "µs" => v / 1e3
        case "ms" => v
        case "s" => v * 1000
        case "m" => v * 60000
        case "h" => v * 3600000
      })
    }
    if (!any) throw new IllegalArgumentException(s"invalid duration: $s")
    val sign = if (s.startsWith("-")) -1 else 1
    sign * millis.round
  }

  /** Retention-style duration (plugins/tasks/DeleteOldEventsTask.go:97-129):
    * positive integer + one of s m h d M y (1d=24h, 1M=30d, 1y=365d).
    */
  def parseRetentionDuration(s: String): Long = {
    val m = java.util.regex.Pattern.compile("^(\\d+)(s|m|h|d|M|y)$").matcher(s)
    if (!m.matches()) throw new IllegalArgumentException(
      s"str='$s' does not match the duration pattern")
    val n = m.group(1).toLong
    m.group(2) match {
      case "s" => n * 1000
      case "m" => n * 60000
      case "h" => n * 3600000
      case "d" => n * 86400000
      case "M" => n * 30L * 86400000
      case "y" => n * 365L * 86400000
    }
  }

  /** startJob (Web.go:163-176): relativeTime (Go duration, usually negative)
    * resolves to startTime = now + d with no end bound; otherwise absolute
    * RFC3339 bounds. Sort mode comes from the COMPILED steps (a surrounding
    * generator preserves its own order — events/Repository.go:23-29), never
    * from substring-matching the query text.
    */
  def startJob(query: String,
      relativeTime: Option[String] = None,
      startTime: Option[Timestamp] = None,
      endTime: Option[Timestamp] = None,
      now: Instant = Instant.now()): Job = {
    val (s, e) = relativeTime match {
      case Some(rt) =>
        (Some(Timestamp.from(now.plusMillis(parseGoDuration(rt)))), None)
      case None => (startTime, endTime)
    }
    val steps = engine.compile(query.trim, s, e)
    // fragment searches route through the inverted index when one is
    // attached — the reference serves every search via its FTS MATCH
    // prefilter (SqliteEventRepository.go:327-352); non-indexable shapes
    // fall back to the scan transparently inside searchFrame. The index
    // probe runs EAGER Spark jobs (posting counts + candidate-id collect),
    // so it is tagged with the job's group up front — cancelJobGroup on
    // this id interrupts the probe exactly like any later action.
    val id = nextId.getAndIncrement()
    val frame = indexDir match {
      case Some(d) =>
        sc.setJobGroup(groupId(id), s"graft query: ${query.trim}", interruptOnCancel = true)
        try graft.plans.FullTextIndex.searchFrame(
          engine.events.sparkSession, engine, d, query.trim, s, e)
        finally sc.clearJobGroup()
      case None => engine.runSteps(steps)
    }
    val (sortMode, cols) = frame match {
      case TableFrame(_, order) => ("none", order)
      case _: EventsFrame =>
        val mode = if (steps.exists(_.name == "surrounding")) "preserveArgOrder"
          else "timestampDesc"
        (mode, Seq.empty)
    }
    val job = new Job(id, query, frame, sortMode, cols)
    jobs.put(job.id, job)
    job
  }

  /** Abort (Engine.go:157-174 + Web.go abortJob): cancels the job's Spark
    * job group — running stages are interrupted — and moves a running job
    * to Aborted. Returns whether the job exists. Aborting an already
    * finished job is accepted but doesn't change its state (the reference's
    * cancel func is nil once the pump exits).
    */
  def abortJob(id: Long): Boolean = {
    val job = jobs.get(id)
    if (job == null) return false
    sc.cancelJobGroup(groupId(id))
    if (job.stateRef == JobsApi.Running) {
      job.markTerminal(JobsApi.Aborted)
      job.unpersistAll() // free partially-cached result blocks
    }
    true
  }

  /** Drop a job and every cached artifact it holds — the manual lifecycle
    * valve that keeps a long-lived API process from accumulating result
    * caches. (The reference keeps job rows forever in its jobs store —
    * plugins/sqlite_jobs/SqliteJobRepository.go has no delete path; at
    * Spark scale a job pins executor block-storage, so eviction is
    * mandatory here, manual via this method or automatic via
    * [[expireJobs]].)
    */
  def releaseJob(id: Long): Boolean = {
    val job = jobs.remove(id)
    if (job == null) return false
    job.unpersistAll()
    true
  }

  /** TTL sweep (scale extension; no reference analog — its sqlite job rows
    * cost nothing to keep, a Spark job's result cache does): release every
    * job that reached a terminal state more than `jobTtlMillis` ago.
    * Running jobs never expire — a slow first materialization must not be
    * evicted under its own pump. No-op when the API was built without a
    * TTL. Returns how many jobs were released. `now` is injectable for
    * tests; callers use the default.
    */
  def expireJobs(now: Long = System.currentTimeMillis()): Int =
    jobTtlMillis match {
      case None => 0
      case Some(ttl) =>
        var released = 0
        jobs.forEach { (id, job) =>
          val t = job.terminalAtMs
          if (t > 0L && now - t > ttl && releaseJob(id)) released += 1
        }
        released
    }

  def job(id: Long): Option[Job] = Option(jobs.get(id))

  /** Lookup that refuses unknown ids with a typed error — the in-process
    * analog of the reference's HTTP 404 (internal/web/Web.go:192-257), and
    * the guard that keeps stats/results/fieldStats from NPE-ing.
    */
  private def jobOrThrow(id: Long): Job = {
    val job = jobs.get(id)
    if (job == null) throw JobsApi.NoSuchJobException(id)
    job
  }

  /** EstimatedProgress (reference jobs.Stats, pkg/logsuck/jobs/Job.go:42-47):
    * completed / total tasks across the job group's Spark jobs via the
    * status tracker — live while a stats/results action runs on another
    * thread. 1 once the job left the Running state; 0 before any stage.
    */
  def estimatedProgress(id: Long): Float = {
    val job = jobs.get(id)
    if (job == null) return 0f
    if (job.stateRef != JobsApi.Running) return 1f
    val t = sc.statusTracker
    val stages = t.getJobIdsForGroup(groupId(id))
      .flatMap(j => t.getJobInfo(j).map(_.stageIds).getOrElse(Array.empty[Int]))
      .flatMap(sid => t.getStageInfo(sid))
    val total = stages.map(_.numTasks).sum
    if (total <= 0) 0f
    else math.min(1f, stages.map(_.numCompletedTasks).sum.toFloat / total)
  }

  /** jobStats (Web.go:192-218): state + A3 matched count + A2 distinct-value
    * count per field key. A job whose full stats pass completed is Finished
    * (the lazy-frame analog of the reference's pump draining); an aborted
    * job reports aborted without touching the cluster again.
    */
  def jobStats(id: Long): JobStats = {
    val job = jobOrThrow(id)
    if (job.stateRef == JobsApi.Aborted)
      return JobStats(JobsApi.Aborted, 0, Map.empty)
    val cached = job.statsCache
    if (cached != null) return cached // memoized: zero Spark jobs
    withJobGroup(job) {
      // both actions read the persisted results (first action materializes
      // them), so the count and the occurrence agg never re-run the
      // compiled query — the count is the partition index's last prefix
      // entry (one pass builds both), and the distinct-value agg folds the
      // already persisted fieldStats aggregate
      val n = job.partStarts.last
      val occ = job.fieldStatsCached
        .groupBy(col("key")).agg(count(lit(1)).as("n_values")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      if (job.stateRef == JobsApi.Running) job.markTerminal(JobsApi.Finished)
      val stats = JobStats(job.stateRef, n, occ)
      job.statsCache = stats
      stats
    }
  }

  /** jobResults (Web.go:220-257): skip/take pagination over the sorted
    * result (O3). Events sorted newest-first (O1/O4 TimestampDesc);
    * surrounding keeps its own offset-desc order (SortModePreserveArgOrder);
    * tables keep declared column order.
    *
    * The page is served through the job's partition-offset index: only the
    * cached partitions overlapping [skip, skip+take) are read (a
    * one-stage, no-shuffle job of 1-2 tasks for page-sized takes), and
    * rows are sliced positionally inside them. The sort ran once at
    * materialization; its range partitioning IS the positional order, so
    * partition-index order + in-partition slice reproduces exactly the
    * offset+limit semantics without touching the skipped prefix.
    */
  def jobResults(id: Long, skip: Int, take: Int): DataFrame = {
    val job = jobOrThrow(id)
    require(skip >= 0 && take >= 0, s"skip/take must be non-negative ($skip, $take)")
    val starts = withJobGroup(job)(job.partStarts) // may materialize the store
    val spark = job.results.sparkSession
    val schema = job.results.schema
    val lo = skip.toLong
    val hi = lo + take
    if (take == 0 || lo >= starts.last) {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else {
      val touched = (0 until starts.length - 1)
        .filter(i => starts(i) < hi && starts(i + 1) > lo).toArray
      val touchedSet = touched.toSet
      val pruned = org.apache.spark.rdd.PartitionPruningRDD.create(
        job.results.rdd, touchedSet.contains)
      val rows = pruned.mapPartitionsWithIndex { (pi, it) =>
        val orig = touched(pi)
        val base = starts(orig)
        it.slice((math.max(base, lo) - base).toInt,
          (math.min(starts(orig + 1), hi) - base).toInt)
      }
      spark.createDataFrame(rows, schema)
    }
  }

  /** [[jobResults]] for the HTTP events wire: the page's rows as their
    * final JSON strings, sliced positionally from the job's pinned
    * [[Job#wireJsonRdd]] — a one-stage partition-pruned job over cached
    * strings, with no per-page DataFrame/plan/codegen. Same ordering and
    * page boundaries as [[jobResults]] (the JSON cache is a narrow map of
    * the persisted results, partition counts unchanged).
    */
  def jobResultsWireJson(id: Long, skip: Int, take: Int): Array[String] = {
    val job = jobOrThrow(id)
    require(skip >= 0 && take >= 0, s"skip/take must be non-negative ($skip, $take)")
    withJobGroup(job) {
      val starts = job.partStarts // may materialize the store
      val lo = skip.toLong
      val hi = lo + take
      if (take == 0 || lo >= starts.last) Array.empty[String]
      else job.wireJsonLocal match {
        case Some(all) => // small result: in-memory slice, no Spark job
          java.util.Arrays.copyOfRange(all, lo.toInt,
            math.min(starts.last, hi).toInt)
        case None =>
          val touched = (0 until starts.length - 1)
            .filter(i => starts(i) < hi && starts(i + 1) > lo).toArray
          val touchedSet = touched.toSet
          val pruned = org.apache.spark.rdd.PartitionPruningRDD.create(
            job.wireJsonRdd, touchedSet.contains)
          pruned.mapPartitionsWithIndex { (pi, it) =>
            val orig = touched(pi)
            val base = starts(orig)
            it.slice((math.max(base, lo) - base).toInt,
              (math.min(starts(orig + 1), hi) - base).toInt)
          }.collect()
      }
    }
  }

  /** Keyset pagination (O2 — the reference's scan pages are keyset-anchored,
    * SqliteEventRepository.go:37,353): the page starts strictly AFTER the
    * last-seen (ts, doc_id) anchor in newest-first order, as a filter +
    * limit over the persisted results — O(page), where OFFSET pagination
    * still scans the skipped prefix. The anchor is total (doc_id breaks ts
    * ties), so pages are gap- and dup-free under any interleaving. Only
    * timestampDesc jobs have the total key; other sort modes page by
    * [[jobResults]] skip/take.
    */
  def jobResultsAfter(id: Long, lastTs: Timestamp, lastDocId: String,
      take: Int): DataFrame = {
    val job = jobOrThrow(id)
    require(job.sortMode == "timestampDesc",
      s"keyset pagination needs the (ts, doc_id) sort key; job ${job.id} sorts ${job.sortMode}")
    require(take >= 0, s"take must be non-negative ($take)")
    // Spark's java8 datetime rows carry LocalDateTime; the wire anchor is
    // a java.sql.Timestamp — normalize both to UTC LocalDateTime
    val anchorTs = java.time.LocalDateTime.ofInstant(
      lastTs.toInstant, java.time.ZoneOffset.UTC)
    // strictly-after predicate in the (ts desc, doc_id asc) result order
    def after(ts: java.time.LocalDateTime, docId: String): Boolean =
      ts.isBefore(anchorTs) || (ts.equals(anchorTs) && docId > lastDocId)
    val bounds = withJobGroup(job)(job.partFirstKeys) // may materialize the store
    val spark = job.results.sparkSession
    val schema = job.results.schema
    val n = bounds.length
    // Matches form a SUFFIX of the global order (the predicate is
    // "strictly after the anchor" in the total sort key), so the first
    // partition that can hold one is either the first whose FIRST row is
    // already after the anchor, or the non-empty partition just before it
    // (its tail can cross the anchor). The in-partition filter below still
    // applies the exact predicate, so the pruning only needs to be a
    // superset — it never decides correctness.
    val firstAfter = bounds.indexWhere(_.exists { case (t, d) => after(t, d) })
    val lo = if (firstAfter < 0) {
      val lastNonEmpty = bounds.lastIndexWhere(_.nonEmpty)
      if (lastNonEmpty < 0) n else lastNonEmpty // all-empty cache: nothing
    } else {
      val prev = bounds.lastIndexWhere(_.nonEmpty, firstAfter - 1)
      if (prev < 0) firstAfter else prev
    }
    if (take == 0 || lo >= n) {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else {
      val tsIdx = schema.fieldIndex("ts")
      val didIdx = schema.fieldIndex("doc_id")
      // local copies: the task closure must capture values, not this Job
      val (anchorT, anchorDoc) = (anchorTs, lastDocId)
      val pruned = org.apache.spark.rdd.PartitionPruningRDD.create(
        job.results.rdd, _ >= lo)
      val rows = pruned.mapPartitions(_.filter { r =>
        val t = JobsApi.rowLdt(r.get(tsIdx))
        t.isBefore(anchorT) || (t.equals(anchorT) && r.getString(didIdx) > anchorDoc)
      })
      // CollectLimit over the pruned RDD starts at the anchor's partition
      // and scales up only if the page isn't filled — O(touched
      // partitions) per page, however deep the anchor sits
      spark.createDataFrame(rows, schema).limit(take)
    }
  }

  /** jobFieldStats (Web.go:259-276): A1 occurrences for one field key —
    * a filter over the persisted per-job (key, value, occurrences) store.
    */
  def jobFieldStats(id: Long, field: String): DataFrame = {
    val job = jobOrThrow(id)
    job.fieldStatsCached
      .filter(col("key") === field)
      .select(col("value"), col("occurrences"))
  }

  /** Persist a job's stores to `dir` — the cross-process analog of the
    * reference's job tables (plugins/sqlite_jobs/SqliteJobRepository.go
    * JobResults/JobFieldValues survive the process): the ordered results
    * (order pinned by an explicit `_pos` column), the field-stats
    * aggregate, and a one-row metadata table. Forces the stats pass first,
    * so an exported job is always a Finished snapshot.
    */
  def exportJob(id: Long, dir: String): Unit = {
    val job = jobOrThrow(id)
    val stats = jobStats(id)
    require(stats.state == JobsApi.Finished, s"cannot export a ${stats.state} job")
    withJobGroup(job) {
      // A small result written through the full cached partitioning is a
      // store of dozens of near-empty part files — size the store by row
      // count instead (the stats pass above already counted). Narrow
      // coalesce concatenates the cached partitions IN ORDER, so `_pos`
      // (partition-indexed monotonically_increasing_id, computed on either
      // side of the coalesce) still sorts back to the pinned cache order.
      val parts = math.max(1L, math.min(
        job.results.rdd.getNumPartitions.toLong,
        (stats.numMatchedEvents + JobsApi.StoreRowsPerFile - 1) /
          JobsApi.StoreRowsPerFile)).toInt
      // monotonically_increasing_id over the PINNED cache is a stable
      // order key (partition-indexed, and the cached partitions are fixed)
      job.results.withColumn("_pos", monotonically_increasing_id())
        .coalesce(parts)
        .write.mode("overwrite").parquet(s"$dir/results")
      job.fieldStatsCached.coalesce(parts).write.mode("overwrite").parquet(s"$dir/fieldstats")
      val spark = job.results.sparkSession
      import spark.implicits._
      Seq((job.query, job.sortMode, job.columnOrder, stats.numMatchedEvents))
        .toDF("query", "sort_mode", "column_order", "n_matched")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    }
  }

  /** Open an [[exportJob]] snapshot as a job in THIS process: pages, stats,
    * and field-stats serve from the written stores — stats launch zero new
    * Spark jobs (memoized from the metadata), results keep the exported
    * order, and a timestampDesc job keeps keyset pagination. The compiled
    * frame is gone by design: an imported job is a results snapshot, like
    * the reference loading job rows after a restart.
    */
  def importJob(spark: org.apache.spark.sql.SparkSession, dir: String): Job = {
    val meta = spark.read.parquet(s"$dir/meta").head()
    val query = meta.getAs[String]("query")
    val sortMode = meta.getAs[String]("sort_mode")
    val cols0 = meta.getSeq[String](meta.fieldIndex("column_order"))
    val results = spark.read.parquet(s"$dir/results")
      .orderBy(col("_pos")).drop("_pos")
    val frame: Frame =
      if (sortMode == "none") TableFrame(results, cols0)
      else EventsFrame(results)
    val job = new Job(nextId.getAndIncrement(), query, frame, sortMode, cols0)
    job.fieldStatsOverride = Some(spark.read.parquet(s"$dir/fieldstats"))
    val occ = job.fieldStatsCached.groupBy(col("key"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    job.markTerminal(JobsApi.Finished)
    job.statsCache = JobStats(JobsApi.Finished, meta.getAs[Long]("n_matched"), occ)
    jobs.put(job.id, job)
    job
  }
}

object JobsApi {
  val Running = "running"
  val Finished = "finished"
  val Aborted = "aborted"

  /** Target rows per part file in an [[JobsApi.exportJob]] store — sized so
    * a typical page-serving read touches one file, while a huge result
    * still splits across writers.
    */
  private[api] val StoreRowsPerFile = 1000000L

  /** Row cap for the driver-held wire-JSON page cache (Job.wireJsonLocal):
    * results at or under it serve every page as an array slice with zero
    * Spark jobs; bigger results keep the executor-side partition-pruned
    * path. ~200 B/row of JSON -> at most ~20 MB on the driver, the same
    * order as one collected page burst under the old per-page path.
    */
  private[api] val LocalPageCacheMaxRows = 100000L

  /** Row timestamp normalization: Spark's java8 datetime API yields
    * LocalDateTime (TIMESTAMP_NTZ rows) but legacy configs yield
    * java.sql.Timestamp — keyset code compares in UTC LocalDateTime.
    */
  private[api] def rowLdt(v: Any): java.time.LocalDateTime = v match {
    case l: java.time.LocalDateTime => l
    // via the instant AT UTC — Timestamp.toLocalDateTime renders in the
    // JVM default zone, which would skew rows against the UTC anchor on
    // any non-UTC JVM (every comparison here is UTC wall-clock)
    case t: java.sql.Timestamp =>
      java.time.LocalDateTime.ofInstant(t.toInstant, java.time.ZoneOffset.UTC)
    case i: java.time.Instant =>
      java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
    case other => throw new IllegalStateException(
      s"unexpected ts type: ${other.getClass}")
  }

  /** Unknown job id — the typed stand-in for the reference's 404 response
    * (internal/web/Web.go:192-257 looks the job up and errors the request).
    */
  final case class NoSuchJobException(id: Long)
    extends NoSuchElementException(s"no job with id $id")

  /** Did this throwable originate from a job-group cancellation? Spark wraps
    * cancellations in SparkException chains whose messages carry
    * "cancelled"/"canceled" (either spelling appears across versions).
    */
  private[api] def isCancellation(e: Throwable): Boolean = {
    var t: Throwable = e
    while (t != null) {
      val m = Option(t.getMessage).getOrElse("").toLowerCase
      if (m.contains("cancel") || t.isInstanceOf[InterruptedException]) return true
      t = t.getCause
    }
    false
  }
}
