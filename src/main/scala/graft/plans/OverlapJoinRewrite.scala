package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** Optimizer rule: rewrite set-overlap joins —
  * `size(array_intersect(a.arr, b.arr)) >= k` or
  * `arrays_overlap(a.arr, b.arr)` — into a duplicate-free
  * inverted-index equi-join, automatically (the third member of the
  * RangeJoinRewrite / EditDistanceJoinRewrite family).
  *
  * A join whose only cross-side predicate is set overlap has no equi
  * key; Spark plans a broadcast nested-loop over the cross product —
  * O(|L|·|R|) intersections. But an overlap means the pair shares at
  * least one NON-null element (see null discussion below), which
  * admits the inverted-index blocking
  * [[graft.dedup.Dedup.ngramJaccardPairs]] builds by hand: both sides
  * explode their distinct non-null elements, the join runs as a
  * shuffle equi-join on the element, and the ORIGINAL predicate rides
  * as the residual. Each qualifying pair would meet once per shared
  * element; a FIRST-WITNESS residual — "no earlier element of this
  * row's distinct array also occurs in the other array" — keeps
  * exactly one meeting per pair, so multiplicity is preserved without
  * a dedup pass.
  *
  * Null elements: a null never equi-joins, so the blocking only finds
  * pairs sharing ≥ 1 non-null element. That is lossless for
  * `arrays_overlap` (a null-only overlap yields NULL, not TRUE — not
  * a match anyway) and for `size(array_intersect) >= k` with k ≥ 2
  * (null contributes at most 1 to the intersection, so a match needs
  * a non-null witness); for k = 1 it is lossless only when both
  * element types are containsNull=false, otherwise the rule does not
  * fire. The residual re-evaluates the original predicate on the
  * ORIGINAL arrays, so null contributions still count toward k.
  *
  * Fires only when no cross-side equality conjunct exists (the
  * rewritten join's element equality is the fixed-point breaker, as
  * in the sibling rules).
  *
  * Scale note: work is Σ over elements of df_L(e)·df_R(e) — the d02
  * inverted-index cost model. On low-cardinality element universes
  * (e.g. a 50-word vocabulary) this degenerates toward the cross
  * product; it is the right plan when elements are selective
  * (shingles, ids, tags). `spark.graft.overlapJoin.enabled=false`
  * opts out.
  */
object OverlapJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {
  val EnabledKey = "spark.graft.overlapJoin.enabled"

  private case class OverlapPred(aArr: Expression, bArr: Expression)

  private def nonNullElems(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => !containsNull
    case _ => false
  }

  private def isArray(e: Expression): Boolean =
    e.dataType.isInstanceOf[ArrayType]

  private def asKLiteral(e: Expression): Option[Int] = e match {
    case Literal(v: Int, IntegerType) => Some(v)
    case Literal(v: Long, LongType) if v.isValidInt => Some(v.toInt)
    case _ => None
  }

  private def asOverlapPred(e: Expression): Option[OverlapPred] = {
    def fromIntersect(sz: Expression, k: Int): Option[OverlapPred] = sz match {
      case Size(ArrayIntersect(a, b), _) if isArray(a) && isArray(b) &&
          (k >= 2 || (k == 1 && nonNullElems(a) && nonNullElems(b))) =>
        Some(OverlapPred(a, b))
      case _ => None
    }
    e match {
      case ArraysOverlap(a, b) if isArray(a) && isArray(b) =>
        Some(OverlapPred(a, b))
      case GreaterThanOrEqual(sz, r) => asKLiteral(r).flatMap(fromIntersect(sz, _))
      case GreaterThan(sz, r) => asKLiteral(r).flatMap(k => fromIntersect(sz, k + 1))
      case LessThanOrEqual(l, sz) => asKLiteral(l).flatMap(fromIntersect(sz, _))
      case LessThan(l, sz) => asKLiteral(l).flatMap(k => fromIntersect(sz, k + 1))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan

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
        else conjuncts.filter(_.deterministic).flatMap(asOverlapPred)
          .find(p =>
            (canEvaluate(p.aArr, left) && canEvaluate(p.bArr, right)) ||
              (canEvaluate(p.aArr, right) && canEvaluate(p.bArr, left)))
        pred match {
          case None => j
          case Some(p) =>
            // the WITNESS side posexplodes its distinct non-null
            // elements (pos drives the first-witness check); the other
            // side explodes the same form for the equi key.
            // array_except(arr, [null]) = distinct non-null elements in
            // one regular (non-RuntimeReplaceable) expression.
            val aLeft = canEvaluate(p.aArr, left)
            val (wPlan, wArr) = if (aLeft) (left, p.aArr) else (right, p.aArr)
            val (oPlan, oArr) = if (aLeft) (right, p.bArr) else (left, p.bArr)

            val elemType = p.aArr.dataType.asInstanceOf[ArrayType].elementType
            def distinctNonNull(arr: Expression): Expression =
              ArrayExcept(arr, CreateArray(Seq(Literal(null, elemType))))

            val wDistinct = distinctNonNull(wArr)
            val wPos = AttributeReference("_ov_pos", IntegerType,
              nullable = false)()
            val wElem = AttributeReference("_ov_elem", elemType,
              nullable = false)()
            val wGen = Generate(PosExplode(wDistinct),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(wPos, wElem), child = wPlan)

            val oElem = AttributeReference("_ov_oelem", elemType,
              nullable = false)()
            val oGen = Generate(Explode(distinctNonNull(oArr)),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(oElem), child = oPlan)

            // first witness: none of the non-null elements BEFORE pos
            // (0-based) in the witness array also occur in the other
            // array — each qualifying pair meets on exactly one
            // element. arrays_overlap yields NULL (not false) when the
            // other array contains nulls and no match exists; coalesce
            // keeps such legitimate first witnesses.
            val firstWitness = Not(Coalesce(Seq(
              ArraysOverlap(Slice(wDistinct, Literal(1), wPos), oArr),
              Literal(false))))

            val (newLeft, newRight) =
              if (aLeft) (wGen, oGen) else (oGen, wGen)
            val newCond = And(EqualTo(wElem, oElem),
              And(firstWitness, cond))
            Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
        }
    }
  }
}
