package graft.functions

import org.apache.datasketches.frequencies.LongsSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Frequent-items sketches (Apache DataSketches LongsSketch, the
  * Misra–Gries family) — mergeable heavy hitters with DETERMINISTIC
  * error bounds: for any item, lowerBound ≤ trueCount ≤ upperBound
  * always (no probability involved), and ub − lb ≤ maxError ≤
  * streamLength·(3.5/maxMapSize). This is the fully-distributed upgrade
  * of q59's count-min path: the merge is an aggregate
  * ([[FreqMergeAgg]]), so no sketch ever visits the driver — shard
  * sketches combine shuffle-side exactly like any other partial
  * aggregate, and at 100 TB the "who are the top talkers" question
  * reads per-shard kilobytes.
  *
  *  - [[FreqSketchAgg]] integral column → sketch bytes
  *  - [[FreqMergeAgg]]  sketch column  → merged sketch bytes
  *  - [[FreqEstimate]] / [[FreqLowerBound]] / [[FreqUpperBound]] —
  *    per-item scalar queries; [[FreqMaxError]] — the sketch's global
  *    error envelope (0 while the item map never overflowed: every
  *    count exact).
  */
object FreqKernel {
  def newSketch(maxMapSize: Int): LongsSketch = new LongsSketch(maxMapSize)

  def wrap(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  def estimate(bytes: Array[Byte], item: Long): Long =
    wrap(bytes).getEstimate(item)
  def lowerBound(bytes: Array[Byte], item: Long): Long =
    wrap(bytes).getLowerBound(item)
  def upperBound(bytes: Array[Byte], item: Long): Long =
    wrap(bytes).getUpperBound(item)
  def maxError(bytes: Array[Byte]): Long = wrap(bytes).getMaximumError
}

abstract class FreqAggBase extends TypedImperativeAggregate[LongsSketch]
    with UnaryLike[Expression] {
  def maxMapSize: Int
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): LongsSketch =
    FreqKernel.newSketch(maxMapSize)
  override def merge(buffer: LongsSketch, other: LongsSketch): LongsSketch =
    buffer.merge(other)
  override def eval(buffer: LongsSketch): Any = buffer.toByteArray
  override def serialize(buffer: LongsSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    FreqKernel.wrap(bytes)
}

/** `graft_freq_sketch_agg(value, maxMapSize)` — frequency sketch of an
  * integral column. maxMapSize (a power of 2) caps memory; while the
  * map never overflows every count is EXACT (maxError 0). */
case class FreqSketchAgg(child: Expression, maxMapSize: Int = 1024,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends FreqAggBase {
  override def prettyName: String = "graft_freq_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint/int column, got $t")
  }

  override def update(buffer: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType => buffer.update(v.asInstanceOf[Long])
      case IntegerType => buffer.update(v.asInstanceOf[Int].toLong)
      case _ => ()
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
}

/** `graft_freq_merge_agg(sketch, maxMapSize)` — shard rollup union. */
case class FreqMergeAgg(child: Expression, maxMapSize: Int = 1024,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends FreqAggBase {
  override def prettyName: String = "graft_freq_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch column, got $t")
  }

  override def update(buffer: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null) buffer.merge(FreqKernel.wrap(v.asInstanceOf[Array[Byte]]))
    else buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqMergeAgg =
    copy(child = newChild)
}

abstract class FreqItemScalar extends BinaryExpression
    with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  // ImplicitCastInputTypes so SQL integer literals coerce like
  // built-ins: `graft_freq_estimate(sk, 5)` parses 5 as INT and the
  // analyzer inserts the cast to bigint instead of failing analysis
  override def inputTypes = Seq(BinaryType, LongType)
}

/** `graft_freq_estimate(sketch, item) -> bigint` */
case class FreqEstimate(left: Expression, right: Expression)
    extends FreqItemScalar {
  override def prettyName: String = "graft_freq_estimate"
  protected override def nullSafeEval(sk: Any, item: Any): Any =
    FreqKernel.estimate(sk.asInstanceOf[Array[Byte]], item.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, it) =>
      s"${ev.value} = graft.functions.FreqKernel.estimate($sk, $it);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FreqEstimate =
    copy(left = l, right = r)
}

/** `graft_freq_lower_bound(sketch, item) -> bigint` — trueCount ≥ this,
  * deterministically. */
case class FreqLowerBound(left: Expression, right: Expression)
    extends FreqItemScalar {
  override def prettyName: String = "graft_freq_lower_bound"
  protected override def nullSafeEval(sk: Any, item: Any): Any =
    FreqKernel.lowerBound(sk.asInstanceOf[Array[Byte]], item.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, it) =>
      s"${ev.value} = graft.functions.FreqKernel.lowerBound($sk, $it);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FreqLowerBound =
    copy(left = l, right = r)
}

/** `graft_freq_upper_bound(sketch, item) -> bigint` — trueCount ≤ this,
  * deterministically. */
case class FreqUpperBound(left: Expression, right: Expression)
    extends FreqItemScalar {
  override def prettyName: String = "graft_freq_upper_bound"
  protected override def nullSafeEval(sk: Any, item: Any): Any =
    FreqKernel.upperBound(sk.asInstanceOf[Array[Byte]], item.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, it) =>
      s"${ev.value} = graft.functions.FreqKernel.upperBound($sk, $it);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FreqUpperBound =
    copy(left = l, right = r)
}

/** `graft_freq_max_error(sketch) -> bigint` — the sketch's global
  * error envelope; 0 means every count in it is exact. */
case class FreqMaxError(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_freq_max_error"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch column, got $t")
  }
  protected override def nullSafeEval(input: Any): Any =
    FreqKernel.maxError(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FreqKernel.maxError($c);")
  override protected def withNewChildInternal(newChild: Expression): FreqMaxError =
    copy(child = newChild)
}

/** Column API. */
object FreqFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}

  def freqSketch(c: Column, maxMapSize: Int = 1024): Column =
    toCol(FreqSketchAgg(toExpr(c), maxMapSize).toAggregateExpression())
  def freqMerge(c: Column, maxMapSize: Int = 1024): Column =
    toCol(FreqMergeAgg(toExpr(c), maxMapSize).toAggregateExpression())
  def freqEstimate(sk: Column, item: Column): Column =
    toCol(FreqEstimate(toExpr(sk), toExpr(item)))
  def freqLowerBound(sk: Column, item: Column): Column =
    toCol(FreqLowerBound(toExpr(sk), toExpr(item)))
  def freqUpperBound(sk: Column, item: Column): Column =
    toCol(FreqUpperBound(toExpr(sk), toExpr(item)))
  def freqMaxError(sk: Column): Column = toCol(FreqMaxError(toExpr(sk)))
}
