package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta-sketch distinct-set algebra (Apache DataSketches) — the
  * mergeable summary HLL cannot provide: HLL unions only, while theta
  * sketches support INTERSECTION and DIFFERENCE, so "distinct users who
  * did A and B" (audience overlap) or "in A but not B" (churn) computes
  * from per-shard sketch bytes instead of a re-scan of both raw sides.
  * At 100 TB the per-shard sketches are pre-aggregated next to the
  * data; set algebra then runs on kilobytes.
  *
  * Shapes follow Spark's own Datasketches HLL surface
  * (`hll_sketch_agg`/`hll_union_agg`/`hll_sketch_estimate`):
  *  - [[ThetaSketchAgg]]  value column  → compact sketch bytes
  *  - [[ThetaUnionAgg]]   sketch column → unioned sketch bytes
  *  - [[ThetaEstimate]] / [[ThetaIntersectEstimate]] /
  *    [[ThetaANotBEstimate]] — scalar estimates (rounded long, the
  *    HLL convention). Scalars run on aggregated outputs (a handful of
  *    rows), never in the scan path, so interpreted eval is the right
  *    cost point; the aggregates are ObjectHashAggregate-class, same
  *    as Spark's HllSketchAgg.
  *
  * Below ~2^lgK distinct values a theta sketch is in exact mode (it
  * retains every hash), so estimates are exact — which is what makes
  * the oracle gate in q61 integer-tight at the fixture SFs while the
  * same query degrades gracefully to ±ε at planet scale.
  */
object ThetaKernel {
  /** A union buffer accepts both raw updates and serialized sketches —
    * one buffer type serves the value-agg and the sketch-union-agg. */
  def newUnion(lgK: Int): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  def estimate(bytes: Array[Byte]): Long =
    Math.round(Sketch.wrap(Memory.wrap(bytes)).getEstimate)

  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Long = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(Sketch.wrap(Memory.wrap(a)))
    i.intersect(Sketch.wrap(Memory.wrap(b)))
    Math.round(i.getResult.getEstimate)
  }

  def aNotBEstimate(a: Array[Byte], b: Array[Byte]): Long = {
    val op = SetOperation.builder().buildANotB()
    Math.round(op.aNotB(Sketch.wrap(Memory.wrap(a)),
      Sketch.wrap(Memory.wrap(b))).getEstimate)
  }

  /** Driver-side union of two serialized sketches (the write-path
    * stats maintenance combine — one batch row into one stored
    * partition row). `lgK` should match the sketches' build parameter
    * (a smaller union would down-sample the inputs). */
  def unionBytes(a: Array[Byte], b: Array[Byte],
      lgK: Int = 14): Array[Byte] = {
    val u = newUnion(lgK)
    u.union(Memory.wrap(a))
    u.union(Memory.wrap(b))
    u.getResult.toByteArray
  }

  /** SOUND membership test for data skipping: can `key` possibly be in
    * the set the sketch summarizes? Theta sampling retains EVERY hash
    * below the sketch's θ (the sketch IS the set {h : h < θ} of input
    * hashes), so:
    *  - probe hash < θ and absent from the retained set → the key was
    *    provably never updated — `false`, the partition can be skipped;
    *  - probe hash < θ and present → possibly present (hash collision
    *    odds ~2⁻⁶⁴) — `true`;
    *  - probe hash ≥ θ → outside the sampled region, absence is
    *    unprovable — `true`.
    * Below nominal entries θ = 1.0 and this is exact membership. The
    * probe hash is produced by updating a singleton sketch, so it goes
    * through exactly the hash pipeline the aggregates used.
    *
    * TYPED: this overload probes via `update(Long)` and is therefore
    * sound ONLY against sketches built from integral updates
    * ([[ThetaSketchAgg]] over int/long columns). Probing a sketch
    * built from STRING updates with it would hash a different byte
    * stream and return false negatives — an unsound skip. Use the
    * String overload for string-keyed sketches; it reproduces
    * [[ThetaSketchAgg]]'s marker-byte encoding exactly. */
  def mayContain(bytes: Array[Byte], key: Long): Boolean =
    mayContainHash(bytes, singletonHash(_.update(key)))

  /** String-keyed membership probe: reproduces [[ThetaSketchAgg]]'s
    * StringType update encoding (UTF-8 bytes + constant 0x00 marker
    * byte — injective, and makes "" a 1-byte update) so the probe hash
    * matches what the aggregate fed the sketch. Sound only against
    * sketches built from string updates, the dual of the Long
    * overload's contract. */
  def mayContain(bytes: Array[Byte], key: String): Boolean = {
    val b = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val marked = java.util.Arrays.copyOf(b, b.length + 1)
    mayContainHash(bytes, singletonHash(_.update(marked)))
  }

  /** The probe key's retained hash, obtained by updating a singleton
    * sketch — the probe goes through exactly the hash pipeline the
    * aggregates used. None if the update was silently ignored
    * (defensive; cannot happen for the encodings above). */
  private def singletonHash(
      update: org.apache.datasketches.theta.UpdateSketch => Unit): Option[Long] = {
    val single = org.apache.datasketches.theta.UpdateSketch.builder().build()
    update(single)
    val sit = single.iterator()
    if (sit.next()) Some(sit.get()) else None
  }

  private def mayContainHash(bytes: Array[Byte], probe: Option[Long]): Boolean =
    probe match {
      case None => true // unprovable absence: keep the partition
      case Some(h) =>
        val sk = Sketch.wrap(Memory.wrap(bytes))
        if (h >= sk.getThetaLong) true
        else {
          val it = sk.iterator()
          var found = false
          while (!found && it.next()) found = it.get() == h
          found
        }
    }
}

/** Base for the two theta aggregates: buffer is a heap [[Union]];
  * partial results travel as compact ordered sketch bytes (canonical —
  * the same bytes `eval` emits). */
abstract class ThetaAggBase extends TypedImperativeAggregate[Union]
    with UnaryLike[Expression] {
  def lgK: Int
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): Union = ThetaKernel.newUnion(lgK)
  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }
  override def eval(buffer: Union): Any = buffer.getResult.toByteArray
  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaKernel.newUnion(lgK)
    u.union(Memory.wrap(bytes))
    u
  }
}

/** `graft_theta_sketch_agg(value, lgK)` — distinct-value sketch of an
  * integral or string column. */
case class ThetaSketchAgg(child: Expression, lgK: Int = 14,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends ThetaAggBase {
  override def prettyName: String = "graft_theta_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint/int/string input, got $t")
  }

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType => buffer.update(v.asInstanceOf[Long])
      case IntegerType => buffer.update(v.asInstanceOf[Int].toLong)
      case StringType =>
        // DataSketches silently IGNORES empty byte arrays, so a bare
        // getBytes would drop "" from the sketch while COUNT(DISTINCT)
        // counts it — breaking the exact-mode gates on dirty feeds. A
        // constant trailing marker byte keeps the encoding injective
        // (s₁+0x00 = s₂+0x00 ⟺ s₁ = s₂) and makes "" a 1-byte update.
        // Sketches only ever compare to OTHER graft theta sketches, so
        // parity with DataSketches' update(String) hashing is not a
        // requirement.
        val b = v.asInstanceOf[UTF8String].getBytes
        val marked = java.util.Arrays.copyOf(b, b.length + 1)
        buffer.update(marked)
      case _ => ()
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** `graft_theta_union_agg(sketch, lgK)` — union of serialized sketches
  * (the shard-rollup stage: day sketches → month/fleet sketch). */
case class ThetaUnionAgg(child: Expression, lgK: Int = 14,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends ThetaAggBase {
  override def prettyName: String = "graft_theta_union_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch column, got $t")
  }

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}

/** `graft_theta_estimate(sketch) -> bigint` */
case class ThetaEstimate(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_theta_estimate"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch column, got $t")
  }

  protected override def nullSafeEval(input: Any): Any =
    ThetaKernel.estimate(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ThetaKernel.estimate($c);")

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

abstract class ThetaBinaryEstimate extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two binary sketch columns, got ($l, $r)")
    }
}

/** `graft_theta_intersect_estimate(a, b) -> bigint` — |A ∩ B|. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
    extends ThetaBinaryEstimate {
  override def prettyName: String = "graft_theta_intersect_estimate"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    ThetaKernel.intersectEstimate(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ThetaKernel.intersectEstimate($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaIntersectEstimate =
    copy(left = l, right = r)
}

/** `graft_theta_a_not_b_estimate(a, b) -> bigint` — |A \ B|. */
case class ThetaANotBEstimate(left: Expression, right: Expression)
    extends ThetaBinaryEstimate {
  override def prettyName: String = "graft_theta_a_not_b_estimate"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    ThetaKernel.aNotBEstimate(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ThetaKernel.aNotBEstimate($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaANotBEstimate =
    copy(left = l, right = r)
}

/** Column API. */
object ThetaFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}

  def thetaSketch(c: Column, lgK: Int = 14): Column =
    toCol(ThetaSketchAgg(toExpr(c), lgK).toAggregateExpression())
  def thetaUnion(c: Column, lgK: Int = 14): Column =
    toCol(ThetaUnionAgg(toExpr(c), lgK).toAggregateExpression())
  def thetaEstimate(c: Column): Column = toCol(ThetaEstimate(toExpr(c)))
  def thetaIntersectEstimate(a: Column, b: Column): Column =
    toCol(ThetaIntersectEstimate(toExpr(a), toExpr(b)))
  def thetaANotBEstimate(a: Column, b: Column): Column =
    toCol(ThetaANotBEstimate(toExpr(a), toExpr(b)))
}
