package graft.functions

/** Tight JVM kernels over primitive float arrays, shared by the
  * interpreted eval path and the generated code of the Catalyst
  * expressions in [[VectorExpressions]]. Accumulation is sequential
  * left-to-right in double precision — deterministic, and matching the
  * reference oracles' element order. Scala object static forwarders
  * make these callable from janino-generated Java.
  */
object VectorKernels {

  /** Ragged dimensions are a data bug — fail loudly (the SQL oracle's
    * list_cosine_similarity errors too) rather than silently computing
    * a prefix similarity. */
  private def checkDims(a: Array[Float], b: Array[Float]): Unit =
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"vector dimension mismatch: ${a.length} vs ${b.length}")

  def dot(a: Array[Float], b: Array[Float]): Double = {
    checkDims(a, b)
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    checkDims(a, b)
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else d / denom
  }

  def l2(a: Array[Float], b: Array[Float]): Double = {
    checkDims(a, b)
    var acc = 0.0
    var i = 0
    while (i < a.length) {
      val t = a(i).toDouble - b(i).toDouble
      acc += t * t
      i += 1
    }
    math.sqrt(acc)
  }
}
