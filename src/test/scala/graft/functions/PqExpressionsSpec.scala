package graft.functions

import graft.SparkSpec
import graft.core.Tables
import graft.similarity.Ann
import org.apache.spark.sql.functions._

/** The native centroid-model kernels must be value-identical to the
  * declarative literal-tree witnesses they replace. */
class PqExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, sf)

  private lazy val cb = Ann.pqTrainCodebooks(emb, "vec_id", "embedding",
    dim = 64, m = 8, k = 4, iters = 1)
  private lazy val cents = cb.head.zipWithIndex.map { case ((_, v), i) =>
    // full-dim centroids for nearestCell: tile the subspace seed
    (i.toLong, Array.fill(8)(v).flatten)
  }

  test("nearest_cell native == declarative witness (incl. tie-break)") {
    val both = emb.select($"vec_id",
      Ann.nearestCell($"embedding", cents).as("native"),
      Ann.nearestCellDeclarative($"embedding", cents).as("decl"))
    assert(both.filter(not($"native" <=> $"decl")).count() == 0)
    assert(both.count() > 0)
  }

  test("pq_encode native == declarative witness") {
    val both = emb.select($"vec_id",
      Ann.pqEncode($"embedding", 64, cb).as("native"),
      Ann.pqEncodeDeclarative($"embedding", 64, cb).as("decl"))
    assert(both.filter(not($"native" <=> $"decl")).count() == 0)
  }

  test("pq_adc native == declarative witness, bit-exact doubles") {
    val codes = emb.select($"vec_id", $"embedding",
      Ann.pqEncode($"embedding", 64, cb).as("codes"))
    val both = codes.select(
      Ann.pqAdcDistance($"embedding", $"codes", 64, cb).as("native"),
      Ann.pqAdcDistanceDeclarative($"embedding", $"codes", 64, cb).as("decl"))
    assert(both.filter(not($"native" <=> $"decl")).count() == 0)
  }

  test("kernels run inside whole-stage codegen") {
    val q = emb.select(
      Ann.nearestCell($"embedding", cents).as("cell"),
      Ann.pqEncode($"embedding", 64, cb).as("codes"))
    assert(q.collect().length > 0)
    assert(q.queryExecution.executedPlan.toString.contains("*("))
  }

  test("portable_pq_encode native == declarative witness, codes + err") {
    val both = emb.select($"vec_id",
      Ann.portablePqEncode($"embedding", dim = 64, m = 8, k = 8).as("native"),
      Ann.portablePqEncodeDeclarative($"embedding", dim = 64, m = 8, k = 8)
        .as("decl"))
    assert(both.filter(not($"native" <=> $"decl")).count() == 0)
    assert(both.count() > 0)
    // and it runs inside whole-stage codegen
    val q = emb.select(
      Ann.portablePqEncode($"embedding", dim = 64, m = 8, k = 8).as("pq"))
    assert(q.queryExecution.executedPlan.toString.contains("*("))
  }

  test("portable_pq_encode null vector propagates null") {
    val df = Seq((1L, null: Seq[Float])).toDF("id", "embedding")
      .select($"id", $"embedding".cast("array<float>").as("embedding"))
    val r = df.select(
      Ann.portablePqEncode($"embedding", dim = 64, m = 8, k = 8).as("pq"))
      .collect().head
    assert(r.isNullAt(0))
  }

  test("portable_pq_encode fails fast on a null vector COMPONENT") {
    // getFloat on a null slot would silently read 0.0f and diverge from
    // the null-propagating declarative witness — the kernel rejects it
    val df = Seq((1L, Some(1.5f) +: None +: Seq.fill(62)(Some(0.25f))))
      .toDF("id", "embedding")
    val ex = intercept[Exception] {
      df.select(Ann.portablePqEncode($"embedding", dim = 64, m = 8, k = 8))
        .collect()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).toSeq
    assert(msgs.exists(_.contains("null vector component")),
      msgs.mkString("\n"))
  }

  test("null vector propagates null") {
    val df = Seq((1L, null: Seq[Float])).toDF("id", "embedding")
      .select($"id", $"embedding".cast("array<float>").as("embedding"))
    val out = df.select(
      Ann.nearestCell($"embedding", cents).as("cell"),
      Ann.pqEncode($"embedding", 64, cb).as("codes"))
    val r = out.collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
