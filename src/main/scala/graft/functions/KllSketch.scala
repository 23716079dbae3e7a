package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** KLL quantile sketches (Apache DataSketches) — MERGEABLE quantiles,
  * the piece `percentile_approx` lacks: Spark's Greenwald–Khanna
  * aggregate must see the raw values, so a fleet-wide p99 re-scans
  * every shard, while per-shard KLL sketches (a few KB each, k=200 ⇒
  * ~1.65% normalized rank error) are built once next to the data and
  * any later quantile question merges bytes. Together with HLL
  * (distinct), count-min (frequency) and theta (set algebra) this
  * completes the engine's mergeable-summary suite.
  *
  *  - [[KllSketchAgg]]  numeric column → sketch bytes
  *  - [[KllMergeAgg]]   sketch column  → merged sketch bytes
  *  - [[KllQuantile]] / [[KllRank]] — scalar queries on sketch bytes.
  *
  * KLL compaction is RANDOMIZED (the published rank-error bound is
  * probabilistic, not a worst case), so correctness gates built on it
  * must test the bound with slack, never exact values — see q62.
  */
object KllKernel {
  def newSketch(k: Int): KllDoublesSketch = KllDoublesSketch.newHeapInstance(k)

  def quantile(bytes: Array[Byte], rank: Double): java.lang.Double = {
    val sk = KllDoublesSketch.wrap(Memory.wrap(bytes))
    if (sk.isEmpty) null else Double.box(sk.getQuantile(rank))
  }

  def rank(bytes: Array[Byte], value: Double): java.lang.Double = {
    val sk = KllDoublesSketch.wrap(Memory.wrap(bytes))
    if (sk.isEmpty) null else Double.box(sk.getRank(value))
  }

  /** Driver-side merge of two serialized sketches — the metadata-sized
    * combine the write-path stats maintenance uses (merging one batch
    * row into one stored partition row; never row data). */
  def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(a))
    sk.merge(KllDoublesSketch.heapify(Memory.wrap(b)))
    sk.toByteArray
  }
}

abstract class KllAggBase extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {
  def k: Int
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): KllDoublesSketch = KllKernel.newSketch(k)
  override def merge(buffer: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }
  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray
  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** `graft_kll_sketch_agg(value, k)` — quantile sketch of a numeric
  * column (accumulated as double; integral inputs are exact in IEEE
  * double up to 2^53). */
case class KllSketchAgg(child: Expression, k: Int = 200,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends KllAggBase {
  override def prettyName: String = "graft_kll_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | LongType | IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double/float/bigint/int column, got $t")
  }

  override def update(buffer: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case DoubleType => buffer.update(v.asInstanceOf[Double])
      case FloatType => buffer.update(v.asInstanceOf[Float].toDouble)
      case LongType => buffer.update(v.asInstanceOf[Long].toDouble)
      case IntegerType => buffer.update(v.asInstanceOf[Int].toDouble)
      case _ => ()
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** `graft_kll_merge_agg(sketch, k)` — union of serialized sketches
  * (shard rollup; k caps the merged sketch's size). */
case class KllMergeAgg(child: Expression, k: Int = 200,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends KllAggBase {
  override def prettyName: String = "graft_kll_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch column, got $t")
  }

  override def update(buffer: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.merge(
      KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

abstract class KllScalarBase extends BinaryExpression
    with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  // empty-sketch queries return null even for non-null inputs
  override def nullable: Boolean = true
  // ImplicitCastInputTypes so SQL literals coerce like built-ins:
  // `graft_kll_quantile(sk, 0.5)` parses 0.5 as DECIMAL(1,1) and the
  // analyzer inserts the cast to double instead of failing analysis
  override def inputTypes = Seq(BinaryType, DoubleType)
}

/** `graft_kll_quantile(sketch, rank) -> double` — the value at a
  * normalized rank in [0, 1]; null for an empty sketch. */
case class KllQuantile(left: Expression, right: Expression)
    extends KllScalarBase {
  override def prettyName: String = "graft_kll_quantile"

  protected override def nullSafeEval(sk: Any, r: Any): Any =
    KllKernel.quantile(sk.asInstanceOf[Array[Byte]], r.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("kllQ")
    nullSafeCodeGen(ctx, ev, (sk, r) =>
      s"""java.lang.Double $tmp = graft.functions.KllKernel.quantile($sk, $r);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllQuantile =
    copy(left = l, right = r)
}

/** `graft_kll_rank(sketch, value) -> double` — the normalized rank of
  * a value; null for an empty sketch. */
case class KllRank(left: Expression, right: Expression)
    extends KllScalarBase {
  override def prettyName: String = "graft_kll_rank"

  protected override def nullSafeEval(sk: Any, v: Any): Any =
    KllKernel.rank(sk.asInstanceOf[Array[Byte]], v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("kllR")
    nullSafeCodeGen(ctx, ev, (sk, v) =>
      s"""java.lang.Double $tmp = graft.functions.KllKernel.rank($sk, $v);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllRank =
    copy(left = l, right = r)
}

/** Column API. */
object KllFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}

  def kllSketch(c: Column, k: Int = 200): Column =
    toCol(KllSketchAgg(toExpr(c), k).toAggregateExpression())
  def kllMerge(c: Column, k: Int = 200): Column =
    toCol(KllMergeAgg(toExpr(c), k).toAggregateExpression())
  def kllQuantile(sk: Column, rank: Column): Column =
    toCol(KllQuantile(toExpr(sk), toExpr(rank)))
  def kllRank(sk: Column, value: Column): Column =
    toCol(KllRank(toExpr(sk), toExpr(value)))
}
