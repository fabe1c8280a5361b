package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

/** Catalyst optimizer rule: rewrite a pure range-containment join
  * (`probe.ts >= build.lo AND probe.ts < build.hi`, no cross-side equality
  * anywhere in the condition) into [[IntervalJoin]]'s day-bucketed
  * EQUI-join. Without this, Spark has no equi keys to hash on and plans a
  * BroadcastNestedLoopJoin — O(|probe|·|build|) comparisons, the plan that
  * dies first at scale. With it, the build side explodes into the calendar
  * days each interval covers (a small constant per interval), the probe
  * side buckets to its own day map-only, and the planner gets a hash join
  * on the day key with the original containment kept as the post-join
  * filter — O(|probe| + |build|·days) and broadcast/shuffle-hash eligible.
  *
  * The rewrite is EXACT for any bounds: a probe row inside `[lo, hi)`
  * always shares a day with one of the interval's covered days (the
  * inclusive day span `[date(lo), date(hi)]` over-covers by at most one
  * replica, which the kept containment filter discards), and each probe
  * row equi-matches at most ONE replica of a given interval — its own day
  * — so no duplicates arise. Null timestamps/bounds produce null equi keys
  * and null range predicates: rejected either way, inner-join semantics
  * preserved.
  *
  * The rule fires only when no conjunct is already a cross-side equality
  * (then Spark hash-joins on it natively and the day key would only
  * dilute it), which also makes it idempotent: the rewritten join carries
  * the injected day equality. Registered via
  * `spark.sql.extensions=graft.GraftExtensions` or
  * [[graft.GraftExtensions.register]] (runtime,
  * `experimental.extraOptimizations`).
  */
object RangeJoinAsEquiJoin extends Rule[LogicalPlan] with PredicateHelper {

  private def isTime(e: Expression): Boolean = e.dataType match {
    case TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** 1 = only left attrs, 2 = only right attrs, 0 = neither, 3 = both. */
  private def sideOf(e: Expression, l: LogicalPlan, r: LogicalPlan): Int = {
    val refs = e.references
    if (refs.isEmpty) 0
    else if (refs.subsetOf(l.outputSet)) 1
    else if (refs.subsetOf(r.outputSet)) 2
    else 3
  }

  /** (ts, bound, tsSide) for a conjunct of shape `ts >= lo` / `lo <= ts`,
    * with ts on one side of the join and the bound on the other.
    */
  private def asLower(c: Expression, l: LogicalPlan, r: LogicalPlan) =
    (c match {
      case GreaterThanOrEqual(a, b) => Some((a, b))
      case GreaterThan(a, b) => Some((a, b))
      case LessThanOrEqual(b, a) => Some((a, b))
      case LessThan(b, a) => Some((a, b))
      case _ => None
    }).collect {
      case (ts, lo)
        if isTime(ts) && isTime(lo) &&
          Set(1, 2).contains(sideOf(ts, l, r)) &&
          sideOf(lo, l, r) == (3 - sideOf(ts, l, r)) =>
        (ts, lo, sideOf(ts, l, r))
    }

  private def asUpper(c: Expression, l: LogicalPlan, r: LogicalPlan) =
    (c match {
      case LessThanOrEqual(a, b) => Some((a, b))
      case LessThan(a, b) => Some((a, b))
      case GreaterThanOrEqual(b, a) => Some((a, b))
      case GreaterThan(b, a) => Some((a, b))
      case _ => None
    }).collect {
      case (ts, hi)
        if isTime(ts) && isTime(hi) &&
          Set(1, 2).contains(sideOf(ts, l, r)) &&
          sideOf(hi, l, r) == (3 - sideOf(ts, l, r)) =>
        (ts, hi, sideOf(ts, l, r))
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) =>
          val (sa, sb) = (sideOf(a, left, right), sideOf(b, left, right))
          (sa == 1 && sb == 2) || (sa == 2 && sb == 1)
        case _ => false
      }
      val pair = if (hasEqui) None else (for {
        (ts, lo, side) <- conjuncts.flatMap(asLower(_, left, right))
        (ts2, hi, side2) <- conjuncts.flatMap(asUpper(_, left, right))
        if side == side2 && ts.semanticEquals(ts2)
      } yield (ts, lo, hi, side)).headOption
      pair match {
        case None => j
        case Some((ts, lo, hi, tsSide)) =>
          val tz = Some(conf.sessionLocalTimeZone)
          val probeDay = Alias(Cast(ts, DateType, tz), "graft_probe_day")()
          val dayAttr = AttributeReference("graft_build_day", DateType)()
          // inclusive day cover [date(lo), date(hi)] — over-covering the
          // exclusive upper bound is harmless, the kept filter discards it
          val days = Sequence(
            Cast(lo, DateType, tz), Cast(hi, DateType, tz), None, tz)
          def widen(side: LogicalPlan, probe: Boolean): LogicalPlan =
            if (probe) Project(side.output :+ probeDay, side)
            else Generate(Explode(days), unrequiredChildIndex = Nil,
              outer = false, qualifier = None,
              generatorOutput = Seq(dayAttr), child = side)
          val (nl, nr) =
            (widen(left, tsSide == 1), widen(right, tsSide == 2))
          val dayEq = EqualTo(probeDay.toAttribute, dayAttr)
          Project(j.output,
            Join(nl, nr, Inner, Some(And(cond, dayEq)), hint))
      }
  }
}
