package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression — the canonical
  * first step of any text dedup/fingerprint pipeline (the same
  * logical text arrives as precomposed or combining-mark sequences
  * from different crawlers; without normalization, exact dedup and
  * every hash-based sketch silently treat them as distinct
  * documents). Spark has no built-in; a UDF would pay ser/de per row.
  *
  * Kernel fast path: `Normalizer.isNormalized` scans without
  * allocating (ASCII and already-NFC text — the overwhelming
  * majority — returns the input string unchanged).
  */
object UnicodeKernels {
  import java.text.Normalizer

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(string) -> string`; null propagates. A bare NULL
  * (NullType) is accepted like the built-in string functions accept
  * it — the unary null path never reaches the kernel.
  * (ImplicitCastInputTypes would be the idiomatic spelling, but its
  * AbstractDataType is private[sql].) */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_nfc_normalize"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $t")
  }

  protected override def nullSafeEval(input: Any): Any =
    UnicodeKernels.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnicodeKernels.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object UnicodeFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}

  def nfcNormalize(text: Column): Column = toCol(NfcNormalize(toExpr(text)))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc_normalize",
      es => {
        if (es.length != 1)
          throw new IllegalArgumentException(
            s"graft_nfc_normalize requires 1 argument, got ${es.length}")
        NfcNormalize(es.head)
      },
      "scala_udf")
}
