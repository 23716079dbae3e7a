package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One-pass 64-bit SimHash kernel over a token-hash array.
  *
  * Value-identical to the declarative formulation (64 ±1 bit-sum
  * folds, sign per bit: [[graft.dedup.Dedup.simhash64Declarative]])
  * and to the explode → 64-conditional-sum hash aggregate the
  * signature stage previously planned. Those run either 64 array
  * folds per row or an explode to |tokens| rows through a shuffle;
  * this kernel walks the hash array once per row with a 64-int
  * counter block — map-only, no shuffle, no per-token row expansion.
  *
  * Null elements count -1 on every bit, exactly as the declarative
  * fold (its per-bit `when` evaluates null → the -1 branch); an empty
  * array yields signature 0 (all sums 0, no sign bit set).
  */
object SimHashKernel {
  def simhashData(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var j = 0
        while (j < 64) { counts(j) -= 1; j += 1 }
      } else {
        val h = arr.getLong(i)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }
}

/** `simhash64(array<long>) -> long` as a native codegen'd expression;
  * null input → null signature (standard unary null propagation —
  * deliberately NOT the declarative witness's null-array quirk, whose
  * when-fold collapses a null aggregate to signature 0, conflating a
  * missing document with a real one). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got $t")
  }

  protected override def nullSafeEval(input: Any): Any =
    SimHashKernel.simhashData(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashKernel.simhashData($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHashFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}

  def simhash64(hashes: Column): Column = toCol(SimHash64(toExpr(hashes)))

  /** SQL surface: `graft_simhash64(hashes)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64",
      es => {
        if (es.length != 1)
          throw new IllegalArgumentException(
            s"graft_simhash64 requires (array<bigint>), got ${es.length} args")
        SimHash64(es.head)
      },
      "scala_udf")
}
