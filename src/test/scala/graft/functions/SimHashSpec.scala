package graft.functions

import graft.SparkSpec
import graft.core.Tables
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

class SimHashSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val hashed =
    Tables.documents(spark, sf).limit(80)
      .select($"doc_id",
        transform(TextOps.tokens($"text"), w => xxhash64(w)).as("hs"))

  test("native kernel is value-identical to the declarative 64-fold") {
    val both = hashed.select($"doc_id",
      Dedup.simhash64FromHashes($"hs").as("native"),
      Dedup.simhash64Declarative($"hs").as("decl"))
    assert(both.filter(not($"native" <=> $"decl")).count() == 0)
    assert(both.count() > 0)
  }

  test("null elements and empty arrays are declarative-exact; null array -> null") {
    val df = Seq(
        (1L, Seq[java.lang.Long](5L, null, 9L)),
        (2L, Seq[java.lang.Long](null, null)),
        (3L, Seq.empty[java.lang.Long]))
      .toDF("id", "hs")
    val both = df.select($"id",
      Dedup.simhash64FromHashes($"hs").as("native"),
      Dedup.simhash64Declarative($"hs").as("decl"))
    assert(both.filter(not($"native" <=> $"decl")).count() == 0)
    assert(both.count() == 3)
    // null INPUT: the native kernel propagates null (standard unary
    // semantics); the declarative witness's when-fold collapses a null
    // aggregate to 0 — a signature indistinguishable from a real
    // document's. The kernel's behavior is the deliberate one.
    val nulls = Seq((4L, null: Seq[java.lang.Long])).toDF("id", "hs")
      .select(Dedup.simhash64FromHashes($"hs").as("native"))
    assert(nulls.collect().head.isNullAt(0))
  }

  test("kernel runs inside whole-stage codegen") {
    val q = hashed.select(Dedup.simhash64FromHashes($"hs").as("sig"))
    assert(q.collect().length > 0)
    assert(q.queryExecution.executedPlan.toString.contains("*("))
  }

  test("SQL registration: graft_simhash64") {
    SimHashFunctions.register(spark)
    hashed.createOrReplaceTempView("sh_docs")
    val viaSql = spark.sql("SELECT doc_id, graft_simhash64(hs) AS sig FROM sh_docs")
    val viaCol = hashed.select($"doc_id", Dedup.simhash64FromHashes($"hs").as("sig"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }
}
