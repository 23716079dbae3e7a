package graft.plans

import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Count
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
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
  * explode their distinct non-null elements and the join runs as a
  * shuffle equi-join on the element.
  *
  * == Narrow-payload plan (default) ==
  *
  * Shipping whole rows (with their arrays) through the element
  * shuffle multiplies the payload by the array length — measured ~40×
  * over the aggregation form a user writes by hand with ids. The rule
  * instead synthesizes a compact row id per side and runs the element
  * join id-only:
  *
  *  1. TAG each side with `_ov_h = xxhash64(all columns)` and
  *     `_ov_r = row_number() OVER (PARTITION BY _ov_h ORDER BY all
  *     columns)`. The pair (h, r) is unique, and — the load-bearing
  *     property — deterministic AS A MULTISET across independent
  *     executions of the same subtree: rows that could swap ids under
  *     a different sort-tie order are bit-equal in every column, so
  *     any assignment yields the same output bag. (This is why the id
  *     is NOT `monotonically_increasing_id`, whose values depend on
  *     shuffle-fetch order and would diverge between the two branches
  *     below.)
  *  2. CANDIDATES: a fresh-exprId copy of each tagged side projects
  *     (h, r, has-null flag) + exploded distinct non-null elements —
  *     element-width rows — equi-joins on the element, and aggregates
  *     to one row per (idW, idO) with the count of shared distinct
  *     non-null elements. `size(array_intersect) >= k` is decided
  *     EXACTLY here: shared-distinct-count + 1 iff both arrays
  *     contain null ≥ k.
  *  3. PAYLOAD: the surviving pairs join back to the ORIGINAL tagged
  *     sides on (h, r) — full rows shuffle once per side, never per
  *     element — and the original join condition runs as the residual
  *     (other conjuncts, e.g. `a_id < b_id`, evaluate here).
  *
  * The candidate branch re-executes each side's subtree (scan +
  * tag window); both sides must therefore be fully deterministic, and
  * every column must be orderable and hashable — otherwise, or when
  * the subtree contains a node the fresh-copy step doesn't cover, the
  * rule falls back to the wide single-join form below.
  * `spark.graft.overlapJoin.narrow=false` forces the wide form.
  *
  * == Wide fallback ==
  *
  * One join: both sides explode with their full rows; each qualifying
  * pair would meet once per shared element, so a FIRST-WITNESS
  * residual — "no earlier element of this row's distinct array also
  * occurs in the other array" — keeps exactly one meeting per pair,
  * and the original predicate rides along re-evaluated on the
  * original arrays.
  *
  * Null elements: a null never equi-joins, so the blocking only finds
  * pairs sharing ≥ 1 non-null element. That is lossless for
  * `arrays_overlap` (a null-only overlap yields NULL, not TRUE — not
  * a match anyway) and for `size(array_intersect) >= k` with k ≥ 2
  * (null contributes at most 1 to the intersection, so a match needs
  * a non-null witness); for k = 1 it is lossless only when both
  * element types are containsNull=false, otherwise the rule does not
  * fire. Null contributions still count toward k: the narrow plan
  * adds the shared-null bit to the exact count, the wide plan
  * re-evaluates the original predicate on the original arrays.
  *
  * Fires only when no cross-side equality conjunct exists (the
  * rewritten join's element equality is the fixed-point breaker, as
  * in the sibling rules).
  *
  * Scale note: candidate work is Σ over elements of df_L(e)·df_R(e) —
  * the d02 inverted-index cost model. On low-cardinality element
  * universes (e.g. a 50-word vocabulary) this degenerates toward the
  * cross product; it is the right plan when elements are selective
  * (shingles, ids, tags). A corpus dominated by FULLY identical rows
  * skews the tag window (equal rows share a hash bucket); run exact
  * dedup first — as any overlap pipeline does anyway.
  * `spark.graft.overlapJoin.enabled=false` opts out entirely.
  */
object OverlapJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {
  val EnabledKey = "spark.graft.overlapJoin.enabled"
  val NarrowKey = "spark.graft.overlapJoin.narrow"

  /** minK: the intersection-size threshold (1 for arrays_overlap). */
  private case class OverlapPred(aArr: Expression, bArr: Expression, minK: Int)

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
        Some(OverlapPred(a, b, k))
      case _ => None
    }
    // strict forms add 1 to the literal: an Int.MaxValue threshold
    // would wrap, so the no-rewrite outcome is explicit, not accidental
    e match {
      case ArraysOverlap(a, b) if isArray(a) && isArray(b) =>
        Some(OverlapPred(a, b, 1))
      case GreaterThanOrEqual(sz, r) => asKLiteral(r).flatMap(fromIntersect(sz, _))
      case GreaterThan(sz, r) => asKLiteral(r).filter(_ < Int.MaxValue)
        .flatMap(k => fromIntersect(sz, k + 1))
      case LessThanOrEqual(l, sz) => asKLiteral(l).flatMap(fromIntersect(sz, _))
      case LessThan(l, sz) => asKLiteral(l).filter(_ < Int.MaxValue)
        .flatMap(k => fromIntersect(sz, k + 1))
      case _ => None
    }
  }

  private def elemTypeOf(p: OverlapPred) =
    p.aArr.dataType.asInstanceOf[ArrayType].elementType

  /** Distinct non-null elements as one regular (non-RuntimeReplaceable)
    * expression. */
  private def distinctNonNull(arr: Expression, p: OverlapPred): Expression =
    ArrayExcept(arr, CreateArray(Seq(Literal(null, elemTypeOf(p)))))

  /** Element attr nullability follows the generator's elementSchema:
    * ArrayExcept derives containsNull from its left input, so a
    * containsNull input array yields a containsNull element type even
    * though the removed-null values are genuinely absent at runtime —
    * declaring nullable=false would disagree with the schema under
    * plan-integrity validation. */
  private def elemNullable(dist: Expression): Boolean =
    dist.dataType.asInstanceOf[ArrayType].containsNull

  // ------------------------------------------------------------------
  // narrow-payload plan
  // ------------------------------------------------------------------

  /** (h, r) synthetic-id tag over a side. */
  private def tag(side: LogicalPlan): (LogicalPlan, Attribute, Attribute) = {
    val h = Alias(new XxHash64(side.output), "_ov_h")()
    val proj = Project(side.output :+ h, side)
    val order = side.output.map(SortOrder(_, Ascending))
    val frame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
    val rn = Alias(WindowExpression(RowNumber(),
      WindowSpecDefinition(Seq(h.toAttribute), order, frame)), "_ov_r")()
    (Window(Seq(rn), Seq(h.toAttribute), order, proj),
      h.toAttribute, rn.toAttribute)
  }

  /** Node types [[freshCopy]] knows how to re-id (or that mint no
    * attributes of their own). Anything else → wide fallback. */
  private def copyable(p: LogicalPlan): Boolean = p match {
    case _: MultiInstanceRelation => true
    case _: Project | _: Filter | _: Join | _: Aggregate | _: Window |
         _: Generate | _: Expand | _: Sort | _: GlobalLimit | _: LocalLimit |
         _: Union | _: SubqueryAlias | _: Repartition |
         _: RepartitionByExpression => true
    case l: LeafNode => l.output.isEmpty // no attrs, nothing to conflict
    case _ => false
  }

  /** A structurally identical copy of `plan` with every minted
    * attribute (leaf outputs, aliases, generator/expand outputs) given
    * a fresh exprId — so the copy can coexist with the original in one
    * tree without ambiguous references. Returns None when the plan
    * contains a node we can't re-id, a subquery expression, or any
    * nondeterministic expression (the copy re-executes; diverging
    * values would silently corrupt the candidate↔payload id match). */
  private def freshCopy(plan: LogicalPlan)
      : Option[(LogicalPlan, AttributeMap[Attribute])] = {
    val ok = plan.collect { case n => n }.forall { n =>
      copyable(n) && n.expressions.forall(e =>
        e.deterministic && !e.exists(_.isInstanceOf[PlanExpression[_]]))
    }
    if (!ok) return None
    def reAliased(list: Seq[NamedExpression]): Seq[NamedExpression] =
      list.map { case a: Alias => a.newInstance(); case other => other }
    def mapping(old: Seq[NamedExpression], fresh: Seq[NamedExpression]) =
      old.map(_.toAttribute).zip(fresh.map(_.toAttribute))
        .filter { case (a, b) => a.exprId != b.exprId }
    val copied = plan.transformUpWithNewOutput {
      case m: MultiInstanceRelation =>
        val lp = m.asInstanceOf[LogicalPlan]
        val inst = m.newInstance().asInstanceOf[LogicalPlan]
        inst -> lp.output.zip(inst.output)
      case p: Project =>
        val fresh = reAliased(p.projectList)
        p.copy(projectList = fresh) -> mapping(p.projectList, fresh)
      case a: Aggregate =>
        val fresh = reAliased(a.aggregateExpressions)
        a.copy(aggregateExpressions = fresh) ->
          mapping(a.aggregateExpressions, fresh)
      case w: Window =>
        val fresh = reAliased(w.windowExpressions)
        w.copy(windowExpressions = fresh) -> mapping(w.windowExpressions, fresh)
      case g: Generate =>
        val fresh = g.generatorOutput.map(_.newInstance())
        g.copy(generatorOutput = fresh) -> g.generatorOutput.zip(fresh)
      case e: Expand =>
        val fresh = e.output.map(_.newInstance())
        e.copy(output = fresh) -> e.output.zip(fresh)
    }
    Some(copied -> AttributeMap(plan.output.zip(copied.output)))
  }

  /** The (h, r, hasNull, elem) element-width branch over a side copy. */
  private def narrowSide(copy: LogicalPlan, remap: AttributeMap[Attribute],
      arr: Expression, h: Attribute, r: Attribute, p: OverlapPred,
      tagIdx: Int): (LogicalPlan, Attribute, Attribute, Attribute, Attribute) = {
    val arrC = arr.transform {
      case a: Attribute => remap.getOrElse(a, a)
    }
    val dist = distinctNonNull(arrC, p)
    val hasNull = Alias(
      GreaterThan(new Size(ArrayDistinct(arrC)), new Size(dist)),
      s"_ov_n$tagIdx")()
    val elem = AttributeReference(s"_ov_e$tagIdx", elemTypeOf(p),
      nullable = elemNullable(dist))()
    val gen = Generate(Explode(dist), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(elem),
      child = Project(copy.output :+ hasNull, copy))
    val hC = remap(h); val rC = remap(r)
    (Project(Seq(hC, rC, hasNull.toAttribute, elem), gen),
      hC, rC, hasNull.toAttribute, elem)
  }

  private def narrowRewrite(j: Join, cond: Expression,
      p: OverlapPred): Option[LogicalPlan] = {
    if (!conf.getConfString(NarrowKey, "true").toBoolean) return None
    // a user-pinned join hint has no faithful mapping onto this
    // three-join decomposition; the wide fallback carries it verbatim
    if (j.hint != JoinHint.NONE) return None
    val aLeft = canEvaluate(p.aArr, j.left)
    val (wPlan, wArr) = if (aLeft) (j.left, p.aArr) else (j.right, p.aArr)
    val (oPlan, oArr) = if (aLeft) (j.right, p.bArr) else (j.left, p.bArr)
    def taggable(pl: LogicalPlan) =
      pl.output.forall(a => RowOrdering.isOrderable(a.dataType)) &&
        new XxHash64(pl.output).checkInputDataTypes().isSuccess
    if (!taggable(wPlan) || !taggable(oPlan)) return None

    val (wTag, wH, wR) = tag(wPlan)
    val (oTag, oH, oR) = tag(oPlan)
    for {
      (wCopy, wMap) <- freshCopy(wTag)
      (oCopy, oMap) <- freshCopy(oTag)
    } yield {
      val (wNarrow, whC, wrC, wn, wElem) =
        narrowSide(wCopy, wMap, wArr, wH, wR, p, 1)
      val (oNarrow, ohC, orC, on, oElem) =
        narrowSide(oCopy, oMap, oArr, oH, oR, p, 2)
      val cand = Join(wNarrow, oNarrow, Inner,
        Some(EqualTo(wElem, oElem)), JoinHint.NONE)
      val grouping: Seq[Attribute] = Seq(whC, wrC, wn, ohC, orC, on)
      val cnt = Alias(Count(Literal(1)).toAggregateExpression(), "_ov_c")()
      val agg = Aggregate(grouping, grouping :+ cnt, cand)
      // exact: shared distinct non-null count, +1 iff both have a null
      val pairs = if (p.minK <= 1) agg else Filter(
        GreaterThanOrEqual(
          Add(cnt.toAttribute,
            If(And(wn, on), Literal(1L), Literal(0L))),
          Literal(p.minK.toLong)), agg)
      val withW = Join(pairs, wTag, Inner,
        Some(And(EqualTo(whC, wH), EqualTo(wrC, wR))), JoinHint.NONE)
      val withO = Join(withW, oTag, Inner,
        Some(And(EqualTo(ohC, oH), EqualTo(orC, oR))), JoinHint.NONE)
      // residual: the ORIGINAL condition (overlap re-check is cheap
      // once per pair; other conjuncts, e.g. a_id < b_id, live here)
      Project(j.output, Filter(cond, withO))
    }
  }

  // ------------------------------------------------------------------
  // wide fallback (single join, first-witness residual)
  // ------------------------------------------------------------------

  private def wideRewrite(j: Join, cond: Expression,
      p: OverlapPred): LogicalPlan = {
    val aLeft = canEvaluate(p.aArr, j.left)
    val (wPlan, wArr) = if (aLeft) (j.left, p.aArr) else (j.right, p.aArr)
    val (oPlan, oArr) = if (aLeft) (j.right, p.bArr) else (j.left, p.bArr)

    val wDistinct = distinctNonNull(wArr, p)
    val wPos = AttributeReference("_ov_pos", IntegerType, nullable = false)()
    val wElem = AttributeReference("_ov_elem", elemTypeOf(p),
      nullable = elemNullable(wDistinct))()
    val wGen = Generate(PosExplode(wDistinct),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(wPos, wElem), child = wPlan)

    val oDistinct = distinctNonNull(oArr, p)
    val oElem = AttributeReference("_ov_oelem", elemTypeOf(p),
      nullable = elemNullable(oDistinct))()
    val oGen = Generate(Explode(oDistinct),
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
    val newCond = And(EqualTo(wElem, oElem), And(firstWitness, cond))
    Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan

    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _) =>
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
            narrowRewrite(j, cond, p).getOrElse(wideRewrite(j, cond, p))
        }
    }
  }
}
