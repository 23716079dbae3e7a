package graft.functions

import graft.SparkSpec
import graft.core.Tables
import graft.similarity.Ann
import org.apache.spark.sql.functions._

class VectorMeanSpec extends SparkSpec {
  import spark.implicits._

  test("element-wise mean matches hand computation") {
    val df = Seq(
      ("a", Array(1.0f, 2.0f)), ("a", Array(3.0f, 6.0f)),
      ("b", Array(10.0f, 20.0f))
    ).toDF("k", "v")
    val out = df.groupBy("k").agg(VectorMean.asColumn(col("v")).as("c"))
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1).toSeq).toMap
    assert(out("a") == Seq(2.0f, 4.0f))
    assert(out("b") == Seq(10.0f, 20.0f))
  }

  test("null vectors are ignored; empty group yields null") {
    val df = Seq(("a", Array(2.0f)), ("a", null.asInstanceOf[Array[Float]]))
      .toDF("k", "v")
    val out = df.groupBy("k").agg(VectorMean.asColumn(col("v")).as("c"))
      .collect().head.getSeq[Float](1)
    assert(out == Seq(2.0f))
  }

  test("trained IVF returns k in-cell neighbors per query") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Ann.ivfTrainedTopK(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", "label", k = 3)
    val rows = out.collect()
    assert(rows.length == 15) // 5 queries × 3
    assert(rows.map(_.getLong(2)).toSet == Set(1L, 2L, 3L))
  }
}
