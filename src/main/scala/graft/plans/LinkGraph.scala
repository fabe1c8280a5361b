package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-graph PageRank — the canonical iterative-graph computation a crawl
  * curation pipeline runs to weight domains (seed scoring, crawl-frontier
  * prioritization, per-domain quality priors à la the quality-vs-popularity
  * mixes in C4/CCNet derivatives).
  *
  * The whole recurrence runs in FIXED-POINT BIGINT (scale 10^12): rank
  * flows as `pr div out_degree` integer contributions and the damping
  * `d = 0.85` is the exact rational `·85 div 100`, so three iterations stay
  * bit-exact across engines — no floating-point drift for the oracle to
  * trip on, and the DuckDB twin is simply the same integer recurrence
  * unrolled as CTEs.
  *
  * Scale shape: the edge list is the big table and it is touched once per
  * iteration by a join keyed on `src` followed by ONE exchange on `dst`
  * (map-side combined sum). The rank and degree tables are host-cardinality
  * (≪ edges — AQE broadcasts them here; at web scale they stay keyed
  * shuffle joins on the same `src` partitioning, which ReuseExchange keeps
  * co-located across iterations). Nothing driver-side; iterations extend
  * one lineage and a single action executes the unrolled plan, exactly like
  * the label-propagation dedup clustering.
  */
object LinkGraph {
  /** Fixed-point scale: 10^12 — headroom for `sum(contrib) * 85` within
    * a signed 64-bit long (≤ 8.5e13 · hosts share).
    */
  val FP: Long = 1000000000000L

  /** Synthetic deterministic host link graph over the documents table (the
    * corpus has no link column, so — like the URL/PII adapters — both
    * engines derive the same edges by pure column arithmetic): each doc at
    * host `doc_id % hosts` emits `1 + doc_id % 3` out-links whose targets
    * are offset by `1 + (doc_id·7 + k·13) % (hosts−1)` — never a self-loop
    * by construction. Distinct edges.
    */
  def hostEdges(docs: DataFrame, hosts: Int = 50): DataFrame = {
    val h = lit(hosts.toLong)
    val src = pmod(col("doc_id"), h)
    docs.select(src.as("src"),
        explode(transform(
          sequence(lit(0), pmod(col("doc_id"), lit(3L)).cast("int")),
          k => pmod(src + 1 + pmod(col("doc_id") * 7 + k.cast("long") * 13,
            h - 1), h))).as("dst"))
      .distinct()
  }

  /** DuckDB twin of [[hostEdges]] as a relation expression. */
  def hostEdgesSql(docsRel: String, hosts: Int = 50): String =
    s"""(SELECT DISTINCT src, dst FROM (
       | SELECT doc_id % $hosts AS src,
       |   unnest(list_transform(range(doc_id % 3 + 1), k ->
       |     (doc_id % $hosts + 1 + (doc_id * 7 + k * 13) % ${hosts - 1})
       |       % $hosts)) AS dst
       | FROM $docsRel))""".stripMargin.replace("\n", " ")

  /** `iters` damped power iterations over `(src, dst)` edges; returns the
    * exact fixed-point rank per host. `pr_0 = FP/hosts`;
    * `pr_{i+1}(v) = base + (Σ_{u→v} pr_i(u) div deg(u)) · 85 div 100` with
    * `base = (FP·15 div 100) div hosts`. Hosts with no in-links keep the
    * base mass; every host has out-links by the adapter's construction
    * (dangling-mass redistribution is therefore out of scope here and
    * documented as such).
    */
  def pagerank(edges: DataFrame, hosts: Int = 50, iters: Int = 3): DataFrame = {
    val spark = edges.sparkSession
    val base = FP * 15 / 100 / hosts
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val hostsDf = spark.range(hosts.toLong).select(col("id").as("host"))
    var pr = hostsDf.withColumn("pr", lit(FP / hosts))
    for (_ <- 1 to iters) {
      val inflow = edges.join(deg, "src")
        .join(pr.select(col("host").as("src"), col("pr")), "src")
        .select(col("dst").as("host"), expr("pr div deg").as("cb"))
        .groupBy("host").agg(sum(col("cb")).as("inflow"))
      pr = hostsDf.join(inflow, Seq("host"), "left")
        .select(col("host"),
          (lit(base) + expr("coalesce(inflow, 0L) * 85 div 100")).as("pr"))
    }
    pr
  }

  /** DuckDB twin of [[pagerank]]: the identical integer recurrence unrolled
    * as one CTE per iteration.
    */
  def pagerankSql(edgesRel: String, hosts: Int = 50, iters: Int = 3): String = {
    val base = FP * 15 / 100 / hosts
    val iterCtes = (1 to iters).map { i =>
      s"""r$i AS (SELECT h.host AS host,
         |  $base + CAST(coalesce(infl.s, 0) * 85 // 100 AS BIGINT) AS pr
         | FROM h LEFT JOIN (
         |   SELECT e.dst AS host, CAST(sum(r.pr // d.deg) AS BIGINT) AS s
         |   FROM edges e JOIN deg d ON e.src = d.src
         |   JOIN r${i - 1} r ON r.host = e.src
         |   GROUP BY e.dst) infl ON infl.host = h.host)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS (SELECT * FROM $edgesRel),
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
       |h AS (SELECT CAST(range AS BIGINT) AS host FROM range($hosts)),
       |r0 AS (SELECT host, CAST(${FP / hosts} AS BIGINT) AS pr FROM h),
       |$iterCtes
       |SELECT host, pr FROM r$iters""".stripMargin.replace("\n", " ")
  }
}
