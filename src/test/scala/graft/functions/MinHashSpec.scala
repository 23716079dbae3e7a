package graft.functions

import graft.SparkSpec
import graft.core.Tables
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

class MinHashSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val shingled =
    Dedup.withShingles(Tables.documents(spark, sf).limit(50), "doc_id", "text")
      .filter(size($"sh") > 0)
      .withColumn("shh", transform($"sh", s => xxhash64(s)))

  test("native kernel is value-identical to the declarative formulation") {
    val both = shingled.select(
      $"doc_id",
      Dedup.minhashSignature($"shh", 64).as("native"),
      Dedup.minhashSignatureDeclarative($"shh", 64).as("decl"))
    assert(both.filter(not($"native" <=> $"decl")).count() == 0)
    assert(both.count() > 0)
  }

  test("kernel runs inside whole-stage codegen") {
    val q = shingled.select(Dedup.minhashSignature($"shh", 8).as("sig"))
    assert(q.collect().forall(_.getSeq[Long](0).length == 8))
    // "*(n)" prefixes mark WholeStageCodegen stages; materialize first
    // so AQE's plan string shows the final stages
    assert(q.queryExecution.executedPlan.toString.contains("*("))
  }

  test("empty and null arrays both yield k nulls — as the declarative form") {
    val df = Seq((1L, Some(Seq.empty[Long])), (2L, Option.empty[Seq[Long]]))
      .toDF("id", "shh")
    val out = df.select($"id",
        Dedup.minhashSignature($"shh", 4).as("native"),
        Dedup.minhashSignatureDeclarative($"shh", 4).as("decl"))
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(1L, 2L)) {
      assert(!out(id).isNullAt(1) && !out(id).isNullAt(2))
      assert(out(id).getSeq[Any](1) == Seq(null, null, null, null))
      assert(out(id).getSeq[Any](1) == out(id).getSeq[Any](2))
    }
  }

  test("null ELEMENTS hash to the slot seed — declarative-exact") {
    // containsNull=true input whose schema the type check accepts; the
    // declarative form's xxhash64(i, null) degenerates to the slot seed
    val df = Seq(
        (1L, Seq[java.lang.Long](5L, null, 9L)),
        (2L, Seq[java.lang.Long](null, null)))
      .toDF("id", "shh")
    val both = df.select($"id",
      Dedup.minhashSignature($"shh", 16).as("native"),
      Dedup.minhashSignatureDeclarative($"shh", 16).as("decl"))
    assert(both.filter(not($"native" <=> $"decl")).count() == 0)
    assert(both.count() == 2)
  }

  test("SQL registration: graft_minhash_sig with literal k") {
    MinHashFunctions.register(spark)
    shingled.createOrReplaceTempView("mh_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_minhash_sig(shh, 16) AS sig FROM mh_docs")
    val viaCol = shingled.select($"doc_id", Dedup.minhashSignature($"shh", 16).as("sig"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }
}
