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

  test("kmeans recovers planted clusters; assignment plan is a shuffle-free narrow map") {
    import spark.implicits._
    // 3 well-separated centers in 4-d, 8 points each, small jitter
    val centers = Seq(
      Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f), Array(0f, 0f, 10f, 0f))
    val pts = for {
      (c, g) <- centers.zipWithIndex
      i <- 0 until 8
    } yield (g * 8L + i, g,
      c.zipWithIndex.map { case (x, j) => x + 0.01f * ((i + j) % 5) })
    val df = pts.toDF("vec_id", "true_group", "embedding")
    val assigned = Ann.kmeansAssign(df, "vec_id", "embedding",
        k = 3, iters = 5)
      .select("true_group", "cell")
      .collect().map(r => r.getInt(0) -> r.getLong(1))
    // every planted group maps to exactly one learned cell, and the
    // three groups land in three distinct cells
    val byGroup = assigned.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byGroup.values.forall(_.size == 1), s"split cluster: $byGroup")
    assert(byGroup.values.flatten.toSet.size == 3, s"merged clusters: $byGroup")
    // deterministic across re-runs (hash-drawn seeds, no rand())
    val again = Ann.kmeansAssign(df, "vec_id", "embedding", k = 3, iters = 5)
      .select("true_group", "cell").collect().map(r => r.getInt(0) -> r.getLong(1))
    assert(assigned.sortBy(_._1).sameElements(again.sortBy(_._1)))
    // the assignment stage is a pure map: no join/exchange below the scan
    val cents = Ann.kmeansCentroids(df, "vec_id", "embedding", 3, 2)
    val plan = df.withColumn("cell", Ann.nearestCell(col("embedding"), cents))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  test("kmeans degeneracy guard: k > distinct points still yields k centroids") {
    import spark.implicits._
    val df = Seq((1L, Array(1f, 1f)), (2L, Array(1f, 1f)), (3L, Array(9f, 9f)))
      .toDF("vec_id", "embedding")
    val cents = Ann.kmeansCentroids(df, "vec_id", "embedding", k = 3, iters = 4)
    assert(cents.size == 3)
    assert(cents.map(_._1).toSet == Set(0L, 1L, 2L))
    // all three points still assignable
    val n = df.withColumn("cell", Ann.nearestCell(col("embedding"), cents)).count()
    assert(n == 3)
  }
}
