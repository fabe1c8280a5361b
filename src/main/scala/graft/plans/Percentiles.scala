package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group percentiles WITHOUT a global sort — the field-stats
  * upgrade (the reference surfaces top values per field,
  * jobs/engine.go fieldStats; a monitoring surface also wants p50/p90/p99
  * of numeric fields). A naive exact percentile sorts every row
  * (percentile_approx trades exactness); at 10^12 rows neither is
  * acceptable when the VALUE DOMAIN is bounded (metrics, prices,
  * latencies at fixed precision): aggregate to a (group, value) histogram
  * first — one shuffle with map-side combine, cells = groups × distinct
  * values — then walk the per-group cumulative distribution with a
  * window over CELLS, never rows.
  *
  * Percentile definition is type-1 (lower value at rank ceil(p·n)) —
  * integer-rank based, no interpolation, hence bit-identical across
  * engines.
  */
object Percentiles {

  def byGroup(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double]): DataFrame = {
    val hist = df.groupBy(col(groupCol), col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val byG = Window.partitionBy(groupCol)
    val cum = hist
      .withColumn("cum", sum(col("c")).over(byG.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(byG))
    cum.groupBy(groupCol)
      .agg(max(col("n")).as("n"),
        ps.map(p => min(when(col("cum") >= ceil(lit(p) * col("n")), col("v")))
          .as(s"p${(p * 100).round}")): _*)
  }

  /** DuckDB twin of [[byGroup]] — same histogram, cumulative walk, and
    * type-1 rank rule.
    */
  def byGroupSql(rel: String, groupCol: String, valueCol: String,
      ps: Seq[Double]): String = {
    val picks = ps.map(p =>
      s"min(CASE WHEN cum >= ceil($p * n) THEN v END) AS p${(p * 100).round}")
      .mkString(", ")
    s"""WITH ph AS (SELECT $groupCol, $valueCol AS v, count(*) AS c
       |  FROM $rel GROUP BY 1, 2),
       |pc AS (SELECT $groupCol, v,
       |    CAST(sum(c) OVER (PARTITION BY $groupCol ORDER BY v
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
       |    CAST(sum(c) OVER (PARTITION BY $groupCol) AS BIGINT) AS n
       |  FROM ph)
       |SELECT $groupCol, max(n) AS n, $picks
       |FROM pc GROUP BY $groupCol""".stripMargin.replace("\n", " ")
  }
}
