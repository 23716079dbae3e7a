package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass MinHash signature kernel.
  *
  * Value-identical to the declarative formulation
  * `transform(sequence(0, k-1), i => array_min(transform(shh, s =>
  * xxhash64(i, s))))`: Spark's `XxHash64` expression folds children
  * left-to-right from seed 42, so each signature slot is
  * `min over s of XXH64.hashLong(s, XXH64.hashInt(i, 42))`. The
  * declarative version walks the shingle array k times and
  * materializes k intermediate arrays per row; this kernel walks it
  * once per slot with zero allocations beyond the output — the
  * dominant cost of MinHash+LSH dedup at corpus scale.
  */
object MinHashKernel {
  /** Per-slot seeds: XXH64.hashInt(i, 42) — the prefix hash the
    * two-child xxhash64(i, s) chain produces before folding in s. */
  def seeds(k: Int): Array[Long] = {
    val out = new Array[Long](k)
    var i = 0
    while (i < k) { out(i) = XXH64.hashInt(i, 42L); i += 1 }
    out
  }

  def signature(shh: Array[Long], seeds: Array[Long]): Array[Long] = {
    val k = seeds.length
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val seed = seeds(i)
      var min = Long.MaxValue
      var j = 0
      while (j < shh.length) {
        val h = XXH64.hashLong(shh(j), seed)
        if (h < min) min = h
        j += 1
      }
      out(i) = min
      i += 1
    }
    out
  }

  /** Signature over raw ArrayData, tolerating null elements. In the
    * declarative form a null shingle reaches `xxhash64(i, s)` with a
    * null second child, which XxHash64 skips — the element's hash
    * degenerates to the slot seed — so the per-slot min ranges over
    * seeds ∪ hashes. Null-free arrays take the primitive fast path. */
  def signatureData(arr: ArrayData, seeds: Array[Long]): Array[Long] = {
    val n = arr.numElements()
    var hasNull = false
    var j = 0
    while (j < n && !hasNull) { if (arr.isNullAt(j)) hasNull = true; j += 1 }
    if (!hasNull) return signature(arr.toLongArray(), seeds)
    val k = seeds.length
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val seed = seeds(i)
      var min = Long.MaxValue
      var jj = 0
      while (jj < n) {
        val h = if (arr.isNullAt(jj)) seed else XXH64.hashLong(arr.getLong(jj), seed)
        if (h < min) min = h
        jj += 1
      }
      out(i) = min
      i += 1
    }
    out
  }
}

/** `minhash_sig(array<long>, k) -> array<long>` as a native codegen'd
  * expression. A null or empty input array yields k nulls — exactly
  * the declarative form, whose outer `transform` runs over the
  * (never-null) slot sequence and whose `array_min` gives null per
  * slot. Null ELEMENTS are also declarative-exact: `xxhash64(i, s)`
  * skips a null child, so a null shingle hashes to the slot seed
  * ([[MinHashKernel.signatureData]]). */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with Serializable {
  require(k > 0, s"minhash_sig requires k > 0, got $k")

  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got $t")
  }

  @transient private lazy val seeds = MinHashKernel.seeds(k)

  override def eval(input: InternalRow): Any = {
    val in = child.eval(input)
    val arr = if (in == null) null else in.asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() == 0)
      new GenericArrayData(new Array[Any](k))
    else new GenericArrayData(
      MinHashKernel.signatureData(arr, seeds))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val seedsRef = ctx.addReferenceObj("mhSeeds", seeds, "long[]")
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      |${childGen.code}
      |$javaType ${ev.value} = (${childGen.isNull} || ${childGen.value}.numElements() == 0)
      |  ? new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$k])
      |  : ($javaType) new org.apache.spark.sql.catalyst.util.GenericArrayData(
      |      graft.functions.MinHashKernel.signatureData(${childGen.value}, $seedsRef));
      |""".stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSignature = copy(child = newChild)
}

object MinHashFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}

  def minhashSig(shh: Column, k: Int): Column =
    toCol(MinHashSignature(toExpr(shh), k))

  /** SQL surface: `graft_minhash_sig(shh, k)` with a literal k. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash_sig",
      es => {
        if (es.length != 2)
          throw new IllegalArgumentException(
            s"graft_minhash_sig requires (array, k literal), got ${es.length} args")
        val k = es(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash_sig k must be an integer literal, got $other")
        }
        MinHashSignature(es.head, k)
      },
      "scala_udf")
}
