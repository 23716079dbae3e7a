package graft.core

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class SchemaConformSpec extends SparkSpec {
  import spark.implicits._

  private val target = StructType(Seq(
    StructField("a", StringType),
    StructField("b", LongType),
    StructField("ts", TimestampType)))

  test("absent columns become typed NULLs in schema order") {
    val df = Seq(("x", 1)).toDF("a", "junk")
    val out = SchemaConform.conform(df, target)
    assert(out.columns.toSeq == Seq("a", "b", "ts"))
    assert(out.schema == target)
    val r = out.collect().head
    assert(r.getString(0) == "x" && r.isNullAt(1) && r.isNullAt(2))
  }

  test("present columns are cast (string -> long, iso string -> timestamp)") {
    val df = Seq(("x", "42", "2024-05-01T10:00:00Z")).toDF("a", "b", "ts")
    val r = SchemaConform.conform(df, target).collect().head
    assert(r.getLong(1) == 42L)
    assert(r.getTimestamp(2).toString == "2024-05-01 10:00:00.0")
  }

  test("extra source columns are pruned; conform is idempotent") {
    val df = Seq(("x", 1L, "y")).toDF("a", "b", "extra")
    val once = SchemaConform.conform(df, target)
    val twice = SchemaConform.conform(once, target)
    // names and types must match; nullability may stay tighter than target
    assert(twice.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      target.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(twice.collect().toSeq == once.collect().toSeq)
  }
}
