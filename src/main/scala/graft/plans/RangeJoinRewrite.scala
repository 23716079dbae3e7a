package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, DoubleType, LongType, TimestampNTZType, TimestampType}

/** Optimizer rule: rewrite equi-key-less time-range joins into the
  * bucketed range join, automatically.
  *
  * A join whose only cross-side predicates are a lower and an upper
  * time bound on the same point expression —
  * `p.ts >= e.lo AND p.ts < e.hi` in any orientation/strictness —
  * has no equi key, so Spark's only native plans are broadcast
  * nested-loop (caps at the broadcast threshold) or a cartesian
  * product (O(|L|·|R|)). Databricks ships a range-join optimization
  * behind a hint for exactly this shape; open-source Spark has
  * nothing. This rule closes that gap as a `Rule[LogicalPlan]`
  * injected through [[GraftExtensions]]:
  *
  * {{{
  *   Join(P, I, Inner, pt >= lo && pt < hi && rest)
  *   ==>
  *   Project(origOutput,
  *     Join(P + bucket(pt),
  *          Generate(explode(sequence(bucket(lo), bucket(hi))), I),
  *          Inner,
  *          p_bucket = i_bucket && <original condition>))
  * }}}
  *
  * — the same shape [[graft.operators.RangeJoin.pointInInterval]]
  * builds by hand, so the argument for its correctness carries over:
  * every interval covers all buckets its window touches (floor of
  * both bounds, inclusive — correct for strict and closed bounds
  * alike), a point owns exactly one bucket, so each qualifying pair
  * meets exactly once and the original predicates, kept verbatim as
  * the residual join condition, trim the bucket-cover superset. Rows
  * with a null point or bound evaluate the original predicates to
  * null and are dropped on both the old and new plans (null bucket
  * keys never equi-match; `explode(null)` emits nothing).
  *
  * The rule fires only when no equality conjunct already spans the
  * two sides — if one exists the planner hash-joins natively and the
  * extra bucket column would only widen the shuffle. That same guard
  * is the fixed-point breaker: the rewritten join carries the bucket
  * equality, so the rule never matches its own output.
  *
  * Scale posture: the rewritten plan shuffles on the bucket id, work
  * scales with genuine temporal overlap, and hot buckets are ordinary
  * join skew (AQE skew-join splits them). Bucket width is
  * `spark.graft.rangeJoin.bucketSeconds` (default 600) — pick it near
  * the typical interval length; `spark.graft.rangeJoin.enabled=false`
  * opts out.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {
  val EnabledKey = "spark.graft.rangeJoin.enabled"
  val BucketSecondsKey = "spark.graft.rangeJoin.bucketSeconds"

  /** One reading of a comparison conjunct: `pt` is bounded by `bound`
    * from below (`isLower`) or above. `a >= b` reads two ways — a
    * lower bound on `a` and an upper bound on `b`. */
  private case class Bound(pt: Expression, bound: Expression, isLower: Boolean)

  private def readings(e: Expression): Seq[Bound] = e match {
    case GreaterThanOrEqual(a, b) => Seq(Bound(a, b, isLower = true), Bound(b, a, isLower = false))
    case GreaterThan(a, b)        => Seq(Bound(a, b, isLower = true), Bound(b, a, isLower = false))
    case LessThanOrEqual(a, b)    => Seq(Bound(a, b, isLower = false), Bound(b, a, isLower = true))
    case LessThan(a, b)           => Seq(Bound(a, b, isLower = false), Bound(b, a, isLower = true))
    case _                        => Seq.empty
  }

  // TIMESTAMP, TIMESTAMP_NTZ and DATE: bucketOf builds UnixMicros
  // (inputTypes Seq(TimestampType)), so DATE and NTZ operands are cast
  // to timestamp first inside the bucket expression (a pure date-date
  // or ntz-ntz comparison survives analysis with its own type; mixed
  // comparisons get their casts from the analyzer before this rule
  // runs). The session TZ is pinned UTC, so the NTZ cast is exact.
  // Round 7 proved why NTZ must be admitted: the testdata re-encoded
  // to NTZ and the rule silently stopped firing, leaving a 99 s
  // broadcast nested-loop where a sub-second bucketed equi-join ran
  // before.
  private def isTemporal(e: Expression): Boolean = e.dataType match {
    case TimestampType | TimestampNTZType | DateType => true
    case _                                           => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan
    val bucketMicros = conf.getConfString(BucketSecondsKey, "600").toLong * 1000000L
    require(bucketMicros > 0, s"$BucketSecondsKey must be positive")

    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val crossSideEqui = conjuncts.exists {
          case Equality(a, b) =>
            (canEvaluate(a, left) && canEvaluate(b, right)) ||
              (canEvaluate(a, right) && canEvaluate(b, left))
          case _ => false
        }
        if (crossSideEqui) j
        else {
          // candidate bounds: temporal comparisons whose point lives
          // entirely on one side and whose bound on the other
          val bounds = conjuncts.filter(_.deterministic).flatMap(readings)
            .filter(b => isTemporal(b.pt) && isTemporal(b.bound))
            .filter(b =>
              (canEvaluate(b.pt, left) && canEvaluate(b.bound, right)) ||
                (canEvaluate(b.pt, right) && canEvaluate(b.bound, left)))
          // try EVERY lower bound — an unrelated timestamp comparison
          // earlier in the conjunct list must not hide a valid band
          val matched = bounds.filter(_.isLower)
            .flatMap(lo => bounds
              .find(b => !b.isLower && b.pt.semanticEquals(lo.pt))
              .map(hi => (lo, hi)))
            .headOption
          matched match {
            case None => j
            case Some((lo, hi)) =>
              val pointLeft = canEvaluate(lo.pt, left)
              val (pointPlan, intervalPlan) = if (pointLeft) (left, right) else (right, left)

              // DATE resolution is a day — a sub-day bucket width would
              // only multiply interval replicas for no extra selectivity
              val dayMicros = 86400000000L
              val effMicros =
                if (lo.pt.dataType == DateType) math.max(bucketMicros, dayMicros)
                else bucketMicros
              def toTs(e: Expression): Expression =
                if (e.dataType == TimestampType) e
                else Cast(e, TimestampType, Some(conf.sessionLocalTimeZone))
              def bucketOf(ts: Expression): Expression =
                Floor(Divide(Cast(UnixMicros(toTs(ts)), DoubleType),
                  Literal(effMicros.toDouble)))

              val pBucket = Alias(bucketOf(lo.pt), "_rj_bucket")()
              val pointProj = Project(pointPlan.output :+ pBucket, pointPlan)

              val cover = Sequence(bucketOf(lo.bound), bucketOf(hi.bound),
                None, Some(conf.sessionLocalTimeZone))
              val iBucket = AttributeReference("_rj_ibucket", LongType,
                nullable = false)()
              val intervalGen = Generate(Explode(cover),
                unrequiredChildIndex = Nil, outer = false, qualifier = None,
                generatorOutput = Seq(iBucket), child = intervalPlan)

              val (newLeft, newRight) =
                if (pointLeft) (pointProj, intervalGen) else (intervalGen, pointProj)
              val newCond = And(EqualTo(pBucket.toAttribute, iBucket), cond)
              Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
          }
        }
    }
  }
}

/** Session extensions: registers [[RangeJoinRewrite]] into the
  * operator-optimization batch (so pushdown/pruning re-run over the
  * rewritten plan) and the full graft SQL function surface
  * ([[graft.functions.GraftFunctionRegistry]]). Installed by
  * `GraftSession.builder`; standalone users:
  * `.withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RangeJoinRewrite)
    ext.injectOptimizerRule(_ => EditDistanceJoinRewrite)
    ext.injectOptimizerRule(_ => OverlapJoinRewrite)
    graft.functions.GraftFunctionRegistry.descriptions.foreach(ext.injectFunction)
  }
}
