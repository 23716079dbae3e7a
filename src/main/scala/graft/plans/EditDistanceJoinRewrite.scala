package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}

/** Optimizer rule: rewrite `levenshtein(a, b) <= k` joins into the
  * length-band blocked join, automatically.
  *
  * A join whose only cross-side predicate is an edit-distance
  * threshold has no equi key; Spark's plans are broadcast nested-loop
  * or cartesian — O(|L|·|R|) levenshtein calls. But edit distance ≤ k
  * bounds the LENGTH delta to ≤ k, which admits a lossless blocking
  * (the same cover [[graft.dedup.Dedup.editDistancePairs]] builds by
  * hand): one side owns its length band, the other explodes to the
  * bands covering len±k, the join runs as a shuffle equi-join on the
  * band id, and the original predicate rides as the residual. Each
  * qualifying pair meets exactly once (a string owns ONE band; the
  * cover visits it once), so no dedup pass is needed.
  *
  * Fires only when no cross-side equality conjunct exists (with one,
  * the planner hash-joins natively and the band would just widen the
  * shuffle key) — which is also the fixed-point breaker, since the
  * rewritten join carries the band equality. The threshold form of
  * levenshtein (already-thresholded calls) and the plain form with a
  * literal comparison both match; `k` must be a foldable
  * non-negative integer.
  *
  * Band width: `spark.graft.editJoin.lenBand` (default 8);
  * `spark.graft.editJoin.enabled=false` opts out.
  */
object EditDistanceJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {
  val EnabledKey = "spark.graft.editJoin.enabled"
  val LenBandKey = "spark.graft.editJoin.lenBand"

  /** A matched `levenshtein(sa, sb) <= k` conjunct (normalized from
    * <=, <, >=, > in either orientation). */
  private case class EditPred(sa: Expression, sb: Expression, k: Int)

  private def asLiteralInt(e: Expression): Option[Int] = e match {
    case Literal(v: Int, IntegerType) => Some(v)
    case Literal(v: Long, LongType) if v.isValidInt => Some(v.toInt)
    case _ => None
  }

  private def asEditPred(e: Expression): Option[EditPred] = {
    def fromLev(lev: Expression, bound: Int): Option[EditPred] = lev match {
      // plain 2-arg form ONLY: the threshold form returns -1 past its
      // cutoff, and -1 <= k is TRUE — its predicate matches arbitrarily
      // distant pairs, which the length-band cover would lose
      case l: Levenshtein if l.threshold.isEmpty &&
          l.left.dataType == StringType &&
          l.right.dataType == StringType && bound >= 0 =>
        Some(EditPred(l.left, l.right, bound))
      case _ => None
    }
    e match {
      case LessThanOrEqual(lev, r) => asLiteralInt(r).flatMap(fromLev(lev, _))
      case LessThan(lev, r)        => asLiteralInt(r).flatMap(k => fromLev(lev, k - 1))
      case GreaterThanOrEqual(l, lev) => asLiteralInt(l).flatMap(fromLev(lev, _))
      case GreaterThan(l, lev)     => asLiteralInt(l).flatMap(k => fromLev(lev, k - 1))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan
    val lenBand = conf.getConfString(LenBandKey, "8").toLong
    require(lenBand > 0, s"$LenBandKey must be positive")

    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val crossSideEqui = conjuncts.exists {
          case Equality(a, b) =>
            (canEvaluate(a, left) && canEvaluate(b, right)) ||
              (canEvaluate(a, right) && canEvaluate(b, left))
          case _ => false
        }
        val pred = if (crossSideEqui) None
        else conjuncts.filter(_.deterministic).flatMap(asEditPred)
          .find(p =>
            (canEvaluate(p.sa, left) && canEvaluate(p.sb, right)) ||
              (canEvaluate(p.sa, right) && canEvaluate(p.sb, left)))
        pred match {
          case None => j
          case Some(p) =>
            // sa's side owns its band; sb's side explodes the cover —
            // whatever join side each happens to live on (when sa is
            // on the RIGHT, own must still carry sa, over right)
            val aLeft = canEvaluate(p.sa, left)
            val (ownPlan, ownStr) = if (aLeft) (left, p.sa) else (right, p.sa)
            val (coverPlan, coverStr) = if (aLeft) (right, p.sb) else (left, p.sb)

            def band(len: Expression): Expression =
              Floor(Divide(Cast(len, DoubleType), Literal(lenBand.toDouble)))

            val ownBand = Alias(band(Length(ownStr)), "_ed_band")()
            val ownProj = Project(ownPlan.output :+ ownBand, ownPlan)

            val cover = Sequence(
              band(Subtract(Length(coverStr), Literal(p.k))),
              band(Add(Length(coverStr), Literal(p.k))),
              None, Some(conf.sessionLocalTimeZone))
            val coverAttr = AttributeReference("_ed_cband", LongType,
              nullable = false)()
            val coverGen = Generate(Explode(cover),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(coverAttr), child = coverPlan)

            val (newLeft, newRight) =
              if (aLeft) (ownProj, coverGen) else (coverGen, ownProj)
            val newCond = And(EqualTo(ownBand.toAttribute, coverAttr), cond)
            Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
        }
    }
  }
}
