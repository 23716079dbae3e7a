package graft.similarity

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("lsh top-k results are a subset of brute-force rankings' candidate space") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 5)
    val brute = Ann.bruteForceTopK(emb, q, "vec_id", "embedding", k = 50)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.lshTopK(emb, q, "vec_id", "embedding", 64, 8, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty)
    // every LSH hit is a genuine corpus pair for its query (sanity) and
    // bucketing keeps only same-signature rows, so hits are a strict
    // candidate-subset of the brute-force universe
    assert(lsh.forall { case (qid, n) => qid != n })
    val topOverlap = lsh.intersect(brute)
    assert(topOverlap.nonEmpty) // buckets retain some true near neighbors
  }

  test("ivf within-cell ranking matches brute force restricted to the cell") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 0)
    val cell = q.select("label").collect().head.getInt(0)
    val bruteInCell = Ann.bruteForceTopK(
      emb.filter(col("label") === cell), q, "vec_id", "embedding", k = 3)
      .select("neighbor_id").collect().map(_.getLong(0)).toSeq
    val ivf = Ann.ivfTopK(emb, q, "vec_id", "embedding", "label", k = 3)
      .select("neighbor_id").collect().map(_.getLong(0)).toSeq
    assert(ivf == bruteInCell)
  }

  test("brute force never cartesian-products the corpus (broadcast queries)") {
    val emb = Tables.embeddings(spark, sf)
    val plan = Ann.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", 5).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
