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

  // ---- integer-path kernels (trained-serving hot path) ----

  /** floor(x·10⁶) quantized embeddings — the `q` column every portable
    * index stores (the private quantizeVec rendering, re-derived). */
  private lazy val qemb = emb.select($"vec_id",
    transform($"embedding".cast("array<double>"),
      x => floor(x * 1000000d).cast("long")).as("q"))

  private lazy val intCents: Seq[Array[Long]] =
    qemb.orderBy($"vec_id").limit(8).collect()
      .map(_.getSeq[Long](1).toArray).toSeq

  /** A trained-shaped integer codebook derived from real residual data
    * (distinct per (j, c) but with genuine tie opportunities via the
    * mod). */
  private lazy val intCb: Seq[Seq[Seq[Long]]] =
    (0 until 8).map(j => (0 until 8).map(c =>
      (0 until 8).map(i =>
        (((j * 37L + c * 8191L + i * 127L + 11L) * 104729L) % 2000001L)
          - 1000000L)))

  test("nearest_cell_int kernel == declarative witness on real vectors") {
    val both = qemb.select($"vec_id",
      graft.functions.PqFunctions.nearestCellInt($"q",
        intCents.map(_.toSeq)).as("native"),
      Ann.portableCellOfDeclarative($"q", intCents).as("decl"))
    assert(both.filter(not($"native" <=> $"decl")).count() == 0)
    assert(both.count() > 0)
  }

  test("nearest_cell_int tie goes to the lowest cell id") {
    // duplicate centroids force an exact distance tie on every row
    val dup = Seq(intCents(3), intCents(0), intCents(0)).map(_.toSeq)
    val both = qemb.select(
      graft.functions.PqFunctions.nearestCellInt($"q", dup).as("native"),
      Ann.portableCellOfDeclarative($"q",
        dup.map(_.toArray)).as("decl"))
    assert(both.filter(not($"native" <=> $"decl")).count() == 0)
    // rows nearest the duplicated centroid must pick cell 1, never 2
    assert(both.filter($"native" === 2L).count() == 0)
  }

  test("pq_encode_int kernel == declarative witness on real residuals") {
    // residuals against the nearest integer centroid — exactly the
    // frame trainPqCodebook encodes each Lloyd's iteration
    val resid = qemb.select($"vec_id",
      zip_with($"q", element_at(typedlit(intCents.map(_.toSeq)),
        (graft.functions.PqFunctions.nearestCellInt($"q",
          intCents.map(_.toSeq)) + 1).cast("int")),
        (a, b) => a - b).as("r"))
    val both = resid.select($"vec_id",
      Ann.portablePqEncodeIntCodes($"r", 8, 8, 8, intCb).as("native"),
      Ann.portablePqEncodeIntCodesDeclarative($"r", 8, 8, 8, intCb)
        .as("decl"))
    assert(both.filter(not($"native" <=> $"decl")).count() == 0)
    assert(both.count() > 0)
  }

  test("pq_encode_int tie goes to the lowest code") {
    // duplicate code rows in one subspace force ties there
    val tied = intCb.updated(2, Seq(intCb(2)(5), intCb(2)(5), intCb(2)(5),
      intCb(2)(1), intCb(2)(1), intCb(2)(2), intCb(2)(3), intCb(2)(4)))
    val r = qemb.select($"vec_id", $"q".as("r"))
    val both = r.select(
      Ann.portablePqEncodeIntCodes($"r", 8, 8, 8, tied).as("native"),
      Ann.portablePqEncodeIntCodesDeclarative($"r", 8, 8, 8, tied)
        .as("decl"))
    assert(both.filter(not($"native" <=> $"decl")).count() == 0)
  }

  test("integer kernels run inside whole-stage codegen, null propagates") {
    val q = qemb.select(
      graft.functions.PqFunctions.nearestCellInt($"q",
        intCents.map(_.toSeq)).as("cell"),
      Ann.portablePqEncodeIntCodes($"q", 8, 8, 8, intCb).as("codes"))
    assert(q.collect().length > 0)
    assert(q.queryExecution.executedPlan.toString.contains("*("))
    val nullRow = Seq((1L, null: Seq[Long])).toDF("id", "q")
      .select($"id", $"q".cast("array<bigint>").as("q"))
    val r = nullRow.select(
      graft.functions.PqFunctions.nearestCellInt($"q",
        intCents.map(_.toSeq)).as("cell"),
      Ann.portablePqEncodeIntCodes($"q", 8, 8, 8, intCb).as("codes"))
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
