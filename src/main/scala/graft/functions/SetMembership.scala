package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact broadcast-set membership as a MAP-SIDE codegen kernel: does
  * any element of an `array<bigint>` column belong to a fixed key set?
  *
  * The 100 TB shape this serves: a small reference set (an eval
  * benchmark's shingle hashes, a denylist, an id blocklist) probed
  * against every corpus row WITHOUT a join — the set rides the plan as
  * a reference object (the same pattern as the trained-model kernels,
  * NearestCell/PqEncode), so the scan stays in one codegen span and
  * nothing shuffles. This is [[BloomOps]]' exact sibling: Bloom's
  * fixed bits admit false positives and need an exact re-check join;
  * this kernel IS exact, at the cost of holding the full key set
  * (sorted long array, 8 bytes/key — fine up to tens of millions of
  * keys) in each executor.
  *
  * Streaming use (c25): Spark's stream-static LEFT ANTI join cannot
  * express "drop a doc if ANY of its exploded shingles matches"
  * without a stream-stream recombination; this kernel answers the
  * doc-level predicate in the row's own projection, which is the
  * form the streaming engine composes freely.
  */
object SetKernels {
  /** True iff any non-null element of `arr` is in `sorted` (ascending,
    * deduplicated). Binary search per element: O(len · log |set|). */
  def anyIn(arr: ArrayData, sorted: Array[Long]): Boolean = {
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) &&
          java.util.Arrays.binarySearch(sorted, arr.getLong(i)) >= 0)
        return true
      i += 1
    }
    false
  }
}

/** `array_any_in_long_set(array<bigint>) -> boolean` — see
  * [[SetKernels]]. Null input → null (standard unary null
  * propagation); null ELEMENTS never match (membership of an unknown
  * value is not provable, and the probe sets are built from non-null
  * hashes). */
case class ArrayAnyInLongSet(child: Expression, keys: Array[Long])
    extends UnaryExpression {

  override def prettyName: String = "array_any_in_long_set"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got $t")
  }

  @transient private lazy val sorted: Array[Long] = {
    val a = keys.clone()
    java.util.Arrays.sort(a)
    a
  }

  protected override def nullSafeEval(input: Any): Any =
    SetKernels.anyIn(input.asInstanceOf[ArrayData], sorted)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("aails", sorted, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SetKernels.anyIn($c, $setRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ArrayAnyInLongSet = copy(child = newChild)
}

object SetFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}

  def arrayAnyInLongSet(c: Column, keys: Array[Long]): Column =
    toCol(ArrayAnyInLongSet(toExpr(c), keys))
}
