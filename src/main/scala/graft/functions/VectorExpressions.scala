package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector similarity over
  * `array<float>` embedding columns.
  *
  * Chosen over `functions.aggregate`/`zip_with` (which build and fold
  * generic ArrayData per row) and far over a Scala UDF (ser/de per
  * row): these stay inside whole-stage codegen, extracting the
  * primitive float[] once and looping in the generated Java — the hot
  * path of brute-force ANN over N×M candidate pairs.
  */
abstract class VectorBinaryExpression extends BinaryExpression
    with Serializable {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<float>), got ($l, $r)")
    }

  /** Fully-qualified static kernel, e.g. "graft.functions.VectorKernels.cosine". */
  protected def kernel: String
  protected def kernelFn: (Array[Float], Array[Float]) => Double

  override def nullSafeEval(a: Any, b: Any): Any =
    kernelFn(a.asInstanceOf[ArrayData].toFloatArray(),
      b.asInstanceOf[ArrayData].toFloatArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $kernel($a.toFloatArray(), $b.toFloatArray());")
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "cosine_sim"
  override protected def kernel: String = "graft.functions.VectorKernels.cosine"
  override protected def kernelFn: (Array[Float], Array[Float]) => Double =
    VectorKernels.cosine
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"
  override protected def kernel: String = "graft.functions.VectorKernels.dot"
  override protected def kernelFn: (Array[Float], Array[Float]) => Double =
    VectorKernels.dot
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

case class L2Distance(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "l2_distance"
  override protected def kernel: String = "graft.functions.VectorKernels.l2"
  override protected def kernelFn: (Array[Float], Array[Float]) => Double =
    VectorKernels.l2
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Distance =
    copy(left = newLeft, right = newRight)
}

/** Column API + SQL registration for the vector expressions. */
object VectorFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}

  def cosineSim(a: Column, b: Column): Column =
    toCol(CosineSimilarity(toExpr(a), toExpr(b)))
  def dotProduct(a: Column, b: Column): Column =
    toCol(DotProduct(toExpr(a), toExpr(b)))
  def l2Distance(a: Column, b: Column): Column =
    toCol(L2Distance(toExpr(a), toExpr(b)))

  /** Make cosine_sim/dot_product/l2_distance usable from SQL text. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def binary(name: String, mk: (Expression, Expression) => Expression)
        : Seq[Expression] => Expression = es => {
      if (es.length != 2)
        throw new IllegalArgumentException(
          s"$name requires exactly 2 arguments, got ${es.length}")
      mk(es.head, es(1))
    }
    reg.createOrReplaceTempFunction("cosine_sim",
      binary("cosine_sim", CosineSimilarity.apply), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product",
      binary("dot_product", DotProduct.apply), "scala_udf")
    reg.createOrReplaceTempFunction("l2_distance",
      binary("l2_distance", L2Distance.apply), "scala_udf")
  }
}
