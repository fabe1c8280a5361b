package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — attach to every left row the latest right row whose order
  * key is <= the left row's, per join key. The reference reloads source
  * configs dynamically while events stream in (logsuck config/dynamic,
  * jobs read the config that was live at the time); at 10^12 rows the
  * batch analog is exactly an as-of join of events against the config
  * version history. Spark has no native as-of operator; the usual
  * workarounds are a range-exploded theta join (quadratic blowup) or a
  * per-row correlated lookup (driver death).
  *
  * Spark-native plan: TAG-AND-UNION — version rows and event rows union
  * into one stream, ONE hash exchange on the join key, and a running
  * `last(v, ignoreNulls)` window ordered by (order key, tag) carries each
  * version forward to every later event row (tag orders a version BEFORE
  * events at the identical key, so a version taking effect at t applies
  * to events at t). Filter back to event rows. Cost: one shuffle of
  * events + versions, one per-partition sort — the same shape as any
  * keyed window; never a range join, never a blowup. Both inputs can be
  * arbitrarily large (neither side broadcasts), and skew on the join key
  * is the ordinary window skew, AQE-visible.
  *
  * The DuckDB twin states the DEFINITION natively (`ASOF LEFT JOIN ... ON
  * e.key = v.key AND e.ord >= v.ord`), so a green oracle row proves the
  * union-window plan IS the as-of semantics, the way q_embed_diversity's
  * quadratic twin proves the linear identity.
  */
object AsOfJoin {

  /** Enrich `left` with the as-of-latest `right` payload columns.
    *
    * @param left      event-side frame
    * @param right     version-side frame (key, ord, payload...)
    * @param key       join key column name (same name both sides)
    * @param ord       order column name (same name both sides, any
    *                  orderable type)
    * @param payload   right-side payload column names to carry onto left
    */
  def enrich(left: DataFrame, right: DataFrame, key: String, ord: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lhs = left
      .withColumn("_tag", lit(1))
      .select(col(key) +: col(ord) +: col("_tag") +:
        (leftCols.filterNot(c => c == key || c == ord).map(col) ++
          payload.map(p => lit(null).cast(right.schema(p).dataType).as(p))): _*)
    val rhs = right
      .withColumn("_tag", lit(0))
      .select(col(key) +: col(ord) +: col("_tag") +:
        (leftCols.filterNot(c => c == key || c == ord)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payload.map(col)): _*)
    val w = Window.partitionBy(key).orderBy(col(ord).asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lhs.unionByName(rhs)
      .select(col("*") +: payload.map(p =>
        last(col(p), ignoreNulls = true).over(w).as(s"_asof_$p")): _*)
    carried.filter(col("_tag") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"_asof_$p").as(p)): _*)
  }
}
