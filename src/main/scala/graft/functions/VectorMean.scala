package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed element-wise mean of `array<float>` vectors — the custom
  * aggregation path (Aggregator[IN, BUF, OUT]) the reference never
  * needs but IVF training does: one shuffle-on-key pass computes the
  * coarse centroids. Accumulation in double, merge-associative, so the
  * result is independent of row order up to fp-roundoff in merges
  * (exactness is spec-tested, not oracle-matched).
  */
case class VectorMeanBuf(var sums: Array[Double], var n: Long)

object VectorMean extends Aggregator[Array[Float], VectorMeanBuf, Array[Float]] {

  override def zero: VectorMeanBuf = VectorMeanBuf(Array.emptyDoubleArray, 0L)

  override def reduce(b: VectorMeanBuf, v: Array[Float]): VectorMeanBuf = {
    if (v == null) return b
    if (b.sums.length == 0) b.sums = new Array[Double](v.length)
    // ragged input is a data bug — fail loudly rather than silently
    // truncating or overrunning in merge
    require(v.length == b.sums.length,
      s"VectorMean: inconsistent vector dimension ${v.length} vs ${b.sums.length}")
    var i = 0
    while (i < v.length) { b.sums(i) += v(i); i += 1 }
    b.n += 1
    b
  }

  override def merge(a: VectorMeanBuf, b: VectorMeanBuf): VectorMeanBuf = {
    if (b.sums.length == 0) return a
    if (a.sums.length == 0) return b
    require(a.sums.length == b.sums.length,
      s"VectorMean: inconsistent vector dimension ${b.sums.length} vs ${a.sums.length}")
    var i = 0
    while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
    a.n += b.n
    a
  }

  override def finish(r: VectorMeanBuf): Array[Float] =
    if (r.n == 0) null
    else r.sums.map(s => (s / r.n).toFloat)

  override def bufferEncoder: Encoder[VectorMeanBuf] = Encoders.product
  override def outputEncoder: Encoder[Array[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()

  /** Untyped column form for DataFrame groupBy.agg. */
  def asColumn(c: Column): Column = udaf(VectorMean).apply(c)
}
