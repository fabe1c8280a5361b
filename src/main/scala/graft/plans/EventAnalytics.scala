package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Usage analytics over the event stream — the aggregate views a log/
  * telemetry platform serves next to search (the reference's search-page
  * histogram is the 1-D case; SURVEY.md §2.3). Both operators are integer-
  * exact (counts and distinct counts only — no float sums to diverge
  * cross-engine).
  */
object EventAnalytics {

  /** Weekly cohort retention: users bucketed by first-seen week, and for
    * each (cohort week, week offset) the distinct users still active.
    *
    * Scale shape: ONE user-keyed aggregate finds each user's cohort; the
    * join back is on the same key so AQE reuses the exchange; the distinct
    * count collapses two-phase (partial distinct on (cohort, offset, user)
    * cells map-side — a user is active in a week thousands of times but
    * crosses the wire once per active week). Nothing ever sorts globally
    * and no week's data concentrates on one task.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val weeks = events.select(col("user_id"),
      date_trunc("week", col("ts")).as("week"))
    val first = weeks.groupBy("user_id").agg(min(col("week")).as("cohort"))
    weeks.join(first, "user_id")
      .groupBy(col("cohort"),
        (datediff(col("week"), col("cohort")) / 7).cast("long")
          .as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_users"))
  }

  /** DuckDB twin of [[cohortRetention]] (date_trunc('week') is
    * Monday-anchored in both engines; the offset divides an exact
    * day-difference between two week starts).
    */
  def cohortRetentionSql(eventsRel: String): String =
    s"""WITH wk AS (SELECT user_id, date_trunc('week', ts) AS week
       |            FROM $eventsRel),
       |fs AS (SELECT user_id, min(week) AS cohort FROM wk GROUP BY user_id)
       |SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
       |  date_diff('day', f.cohort, w.week) // 7 AS week_offset,
       |  count(DISTINCT w.user_id) AS n_users
       |FROM wk w JOIN fs f USING (user_id)
       |GROUP BY 1, 2""".stripMargin.replace("\n", " ")

  /** Ordered step-conversion funnel (view -> click -> purchase): a user
    * completes step k+1 at the EARLIEST step-k+1 event STRICTLY AFTER
    * their step-k completion time — the conditional-min recurrence
    * (t1 = min view; t2 = min click > t1; ...), i.e. the greedy
    * first-occurrence scan. Emits one row per step with the count of
    * users who reached it.
    *
    * Scale shape: each step touches only ITS event type's rows (the type
    * filter pushes to the scan), which cross one user-keyed aggregate;
    * the reached-set joins are user-key-to-user-key (co-partitioned, never
    * broadcast-sized assumptions). Per-user state is one timestamp — no
    * collect-and-sort of a user's history, so a hot user costs nothing
    * extra.
    */
  def stepFunnel(events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val byUser = events.select(col("user_id"), col("event_type"), col("ts"))
    val reachedPerStep = steps.tail.scanLeft(
      byUser.filter(col("event_type") === steps.head)
        .groupBy("user_id").agg(min(col("ts")).as("t"))) { (reached, st) =>
      byUser.filter(col("event_type") === st)
        .join(reached, "user_id")
        .filter(col("ts") > col("t"))
        .groupBy("user_id").agg(min(col("ts")).as("t"))
    }
    steps.zip(reachedPerStep).zipWithIndex.map { case ((st, df), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(st).as("event_type"),
          col("n_users"))
    }.reduce(_ unionAll _)
  }

  /** Rolling N-day active users: for every window-end day, the distinct
    * users active in the preceding N days. No window function and no
    * self-join — each (user, day) contributes to the N window-end days it
    * falls in (an integer-day explode), and the distinct collapses
    * TWO-PHASE: a user's thousands of daily events become one
    * (window, user) cell map-side before the exchange, so the wire cost
    * is active-user-days × N, independent of event volume. Emits every
    * generated window end (the trailing N−1 days past the last event are
    * the ramp-down of a well-defined trailing window).
    */
  def rollingActiveUsers(events: DataFrame, days: Int = 7): DataFrame = {
    val epoch = lit("1970-01-01").cast("date")
    val dayNum = datediff(col("ts").cast("date"), epoch)
    events.select(col("user_id"), dayNum.as("d"))
      .select(col("user_id"),
        explode(sequence(col("d"), col("d") + lit(days - 1))).as("win"))
      .groupBy(col("win"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(
        date_format(date_add(epoch, col("win")), "yyyy-MM-dd").as("window_end"),
        col("n_users"))
  }

  /** DuckDB twin of [[rollingActiveUsers]]. */
  def rollingActiveUsersSql(eventsRel: String, days: Int = 7): String =
    s"""SELECT strftime(DATE '1970-01-01' + to_days(CAST(win AS INTEGER)), '%Y-%m-%d')
       |    AS window_end,
       |  count(DISTINCT user_id) AS n_users
       |FROM (SELECT user_id,
       |        unnest(range(d, d + $days)) AS win
       |      FROM (SELECT user_id,
       |              date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
       |            FROM $eventsRel))
       |GROUP BY win""".stripMargin.replace("\n", " ")

  /** DuckDB twin of [[stepFunnel]]. */
  def stepFunnelSql(eventsRel: String,
      steps: Seq[String] = Seq("view", "click", "purchase")): String = {
    val ctes = steps.zipWithIndex.map { case (st, i) =>
      if (i == 0)
        s"s1 AS (SELECT user_id, min(ts) AS t FROM $eventsRel" +
          s" WHERE event_type = '$st' GROUP BY user_id)"
      else
        s"s${i + 1} AS (SELECT e.user_id, min(e.ts) AS t FROM $eventsRel e" +
          s" JOIN s$i USING (user_id)" +
          s" WHERE e.event_type = '$st' AND e.ts > s$i.t GROUP BY e.user_id)"
    }.mkString(", ")
    val rows = steps.zipWithIndex.map { case (st, i) =>
      s"SELECT ${i + 1} AS step, '$st' AS event_type," +
        s" count(*) AS n_users FROM s${i + 1}"
    }.mkString(" UNION ALL ")
    s"WITH $ctes $rows"
  }

  /** Event-type transition matrix (first-order Markov view of user
    * behavior): for each user's time-ordered event sequence, count every
    * adjacent (from_type, to_type) pair and normalize per from-row —
    * the "what happens after an error?" panel next to search. Ordering
    * ties on ts break by event_id in both engines, so the sequence — and
    * therefore every count — is fully deterministic.
    *
    * Scale shape: ONE user-keyed exchange feeds the lead() window (a
    * user's history sorts within its partition only — no global sort),
    * then the pair counts collapse map-side into at most |types|² cells.
    * The per-from normalization runs over that tiny aggregated frame,
    * never over events. A hot user costs one partition's sort, not a
    * driver collect.
    */
  def transitions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seq = events.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("to_type", lead("event_type", 1).over(
        Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
      .filter(col("to_type").isNotNull)
    transitionStats(
      seq.select(col("event_type").as("from_type"), col("to_type")))
  }

  /** Count + per-from normalization over a bare (from_type, to_type) pair
    * stream — shared by the batch face above and the streaming face
    * (`StreamingPipeline.transitionsToSink`'s served pairs).
    */
  def transitionStats(pairs: DataFrame): DataFrame =
    pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n") / sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("from_type")), 4))

  /** DuckDB twin of [[transitions]] (same (ts, event_id) tie-break; both
    * engines divide BIGINT/BIGINT as double before the 4-dp round).
    */
  def transitionsSql(eventsRel: String): String =
    s"""WITH seq AS (SELECT event_type,
       |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |      AS to_type
       |  FROM $eventsRel)
       |SELECT event_type AS from_type, to_type, count(*) AS n,
       |  round(count(*) / sum(count(*)) OVER (PARTITION BY event_type), 4) AS p
       |FROM seq WHERE to_type IS NOT NULL
       |GROUP BY 1, 2""".stripMargin.replace("\n", " ")

  /** Top-k within-session event paths of length `n` (the "what do users do
    * around an error?" drill-down next to [[transitions]]): sessions split
    * on the same strict `> gap` boundary [[Sessionize]] pins (microsecond-
    * exact integer arithmetic — no float epoch rounding for the engines to
    * disagree on), every n-gram of consecutive events INSIDE one session
    * counts, and the k-cut orders (n DESC, path ASC) so the boundary is
    * deterministic.
    *
    * Scale shape: ONE user-keyed exchange feeds every window pass (gap
    * flag, session id, the n−1 leads share the same partitioning+ordering,
    * so Catalyst stacks them over a single sort); path counts collapse
    * map-side to path-cardinality cells and the k-cut is a TakeOrdered,
    * never a global sort.
    */
  def sessionPaths(events: DataFrame, gapSeconds: Long = 1800,
      n: Int = 3, k: Int = 10): DataFrame = {
    require(n >= 2, s"a path needs at least 2 steps, got $n")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val withSess = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("_prev", lag(col("ts"), 1).over(w))
      .withColumn("_newi", when(col("_prev").isNull ||
        // ts arrives TIMESTAMP_NTZ; the session tz is pinned UTC, so the
        // cast is value-preserving and unix_micros stays integer-exact
        unix_micros(col("ts").cast("timestamp")) -
          unix_micros(col("_prev").cast("timestamp")) >
          gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("_sess", sum(col("_newi")).over(w))
    val withLeads = (1 until n).foldLeft(withSess) { (df, i) =>
      df.withColumn(s"_t$i", lead(col("event_type"), i).over(w))
        .withColumn(s"_s$i", lead(col("_sess"), i).over(w))
    }
    val sameSession = (1 until n).map(i => col(s"_s$i") === col("_sess"))
      .reduce(_ && _)
    val path = concat_ws(">",
      col("event_type") +: (1 until n).map(i => col(s"_t$i")): _*)
    withLeads.filter(sameSession)
      .groupBy(path.as("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(k)
  }

  /** DuckDB twin of [[sessionPaths]] (same epoch_us gap rule, same
    * (ts, event_id) ordering, same deterministic k-cut).
    */
  def sessionPathsSql(eventsRel: String, gapSeconds: Long = 1800,
      n: Int = 3, k: Int = 10): String = {
    val leads = (1 until n).map(i =>
      s"lead(event_type, $i) OVER w AS t$i, lead(sess, $i) OVER w AS s$i")
      .mkString(", ")
    val same = (1 until n).map(i => s"s$i = sess").mkString(" AND ")
    val path = ("event_type" +: (1 until n).map(i => s"t$i"))
      .mkString(" || '>' || ")
    s"""WITH o AS (SELECT user_id, ts, event_id, event_type,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > ${gapSeconds}000000
       |      THEN 1 ELSE 0 END AS newi
       |  FROM $eventsRel WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |s AS (SELECT user_id, ts, event_id, event_type,
       |    sum(newi) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess
       |  FROM o),
       |g AS (SELECT event_type, sess, $leads
       |  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT $path AS path, count(*) AS n
       |FROM g WHERE $same
       |GROUP BY 1 ORDER BY n DESC, path LIMIT $k""".stripMargin.replace("\n", " ")
  }

  /** ROLLUP cube slice: (event_type, day) counts with per-type and grand
    * subtotals in ONE pass — Spark expands the grouping sets before the
    * single partial-aggregated exchange, so the corpus is read once, not
    * three times. Subtotal rows label their rolled-up dimensions 'ALL'
    * (the event columns are never null in this corpus, so the label is
    * unambiguous).
    */
  def rollupCounts(events: DataFrame): DataFrame =
    events.select(col("event_type"),
      date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
      .rollup("event_type", "day")
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("day"), lit("ALL")).as("day"),
        col("n"), col("n_users"))

  /** DuckDB twin of [[rollupCounts]]. */
  def rollupCountsSql(eventsRel: String): String =
    s"""SELECT COALESCE(event_type, 'ALL') AS event_type,
       |  COALESCE(day, 'ALL') AS day,
       |  count(*) AS n, count(DISTINCT user_id) AS n_users
       |FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, user_id
       |      FROM $eventsRel)
       |GROUP BY ROLLUP (event_type, day)""".stripMargin.replace("\n", " ")
}
