package graft.api

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.compile.{EventsFrame, Frame, QueryEngine, TableFrame}

/** The reference's job API surface (internal/web/Web.go:163-276 —
  * startJob / jobStats / jobResults / jobFieldStats) rebuilt over the query
  * engine. A "job" is a compiled, lazily-evaluated frame; stats/results/
  * field-stats are Spark actions over it (no job-results tables: Catalyst
  * recomputation + caching replace the JobResults/JobFieldValues store).
  */
class JobsApi(engine: QueryEngine) {

  final case class Job(id: Long, query: String, frame: Frame,
      sortMode: String, columnOrder: Seq[String])

  final case class JobStats(state: String, numMatchedEvents: Long,
      fieldOccurrences: Map[String, Long])

  private val nextId = new java.util.concurrent.atomic.AtomicLong(1)
  private val jobs = new java.util.concurrent.ConcurrentHashMap[Long, Job]()

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
    * RFC3339 bounds.
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
    val frame = engine.run(query.trim, s, e)
    val (sortMode, cols) = frame match {
      case TableFrame(_, order) => ("none", order)
      case _: EventsFrame =>
        val mode = if (query.contains("surrounding")) "preserveArgOrder" else "timestampDesc"
        (mode, Seq.empty)
    }
    val job = Job(nextId.getAndIncrement(), query, frame, sortMode, cols)
    jobs.put(job.id, job)
    job
  }

  def abortJob(id: Long): Boolean = jobs.remove(id) != null

  /** jobStats (Web.go:192-218): state + A3 matched count + A2 distinct-value
    * count per field key.
    */
  def jobStats(id: Long): JobStats = {
    val job = jobs.get(id)
    val n = engine.matchedCount(job.frame)
    val occ = engine.fieldOccurrences(job.frame).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    JobStats("finished", n, occ)
  }

  /** jobResults (Web.go:220-257): skip/take pagination over the sorted
    * result (O3). Events sorted newest-first (O1/O4 TimestampDesc);
    * surrounding keeps its own offset-desc order (SortModePreserveArgOrder);
    * tables keep declared column order.
    */
  def jobResults(id: Long, skip: Int, take: Int): DataFrame = {
    val job = jobs.get(id)
    val ordered = job.frame match {
      case TableFrame(df, _) => df
      case f: EventsFrame if job.sortMode == "preserveArgOrder" => f.df
      case f: EventsFrame => QueryEngine.newestFirst(f)
    }
    ordered.offset(skip).limit(take)
  }

  /** jobFieldStats (Web.go:259-276): A1 occurrences for one field key. */
  def jobFieldStats(id: Long, field: String): DataFrame = {
    val job = jobs.get(id)
    engine.fieldStats(job.frame)
      .filter(col("key") === field)
      .select(col("value"), col("occurrences"))
  }
}
