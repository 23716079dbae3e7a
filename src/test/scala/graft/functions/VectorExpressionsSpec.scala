package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Seq(1.0f, 0.0f, 2.0f), Seq(2.0f, 0.0f, 4.0f)),   // parallel
    (2L, Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f)),   // orthogonal
    (3L, Seq(1.0f, 2.0f, 3.0f), Seq(-1.0f, -2.0f, -3.0f)) // antiparallel
  ).toDF("id", "a", "b")

  test("cosine_sim matches hand-computed values") {
    val out = df.select($"id", VectorFunctions.cosineSim($"a", $"b").as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1L) - 1.0) < 1e-12)
    assert(math.abs(out(2L)) < 1e-12)
    assert(math.abs(out(3L) + 1.0) < 1e-12)
  }

  test("dot and l2 match hand-computed values") {
    val r = df.filter($"id" === 3L).select(
      VectorFunctions.dotProduct($"a", $"b"),
      VectorFunctions.l2Distance($"a", $"b")).collect().head
    assert(r.getDouble(0) == -14.0)
    assert(math.abs(r.getDouble(1) - 2 * math.sqrt(14.0)) < 1e-12)
  }

  test("null input propagates NULL") {
    val r = Seq((Option.empty[Seq[Float]], Seq(1.0f)))
      .toDF("a", "b")
      .select(VectorFunctions.cosineSim($"a", $"b")).collect().head
    assert(r.isNullAt(0))
  }

  test("SQL registration makes cosine_sim usable in SQL text") {
    VectorFunctions.register(spark)
    df.createOrReplaceTempView("vecs")
    val out = spark.sql(
      "SELECT cosine_sim(a, b) AS c FROM vecs WHERE id = 1").collect().head
    assert(math.abs(out.getDouble(0) - 1.0) < 1e-12)
  }

  test("expression survives codegen (wholestage plan path)") {
    // needs a real scan — a local Seq collapses to LocalTableScan
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.select(
      VectorFunctions.cosineSim(col("embedding"), col("embedding")).as("c"))
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project"))
    val c = q.agg(min("c"), max("c")).collect().head
    assert(math.abs(c.getDouble(0) - 1.0) < 1e-9 &&
      math.abs(c.getDouble(1) - 1.0) < 1e-9)
  }
}
