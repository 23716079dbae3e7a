package graft.functions

import graft.SparkSpec
import graft.functions.ThetaFunctions._
import org.apache.spark.sql.functions._

/** Theta distinct-set algebra: exact-mode equalities at the fixture SF
  * (below 2^lgK a theta sketch retains every hash), estimation-mode
  * error bounds past saturation, shard associativity, and the SQL
  * registry surface.
  */
class ThetaSketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def ev = graft.core.Tables.events(spark, sf)

  test("exact mode: sketch estimate equals countDistinct below 2^lgK") {
    val r = ev.agg(
      thetaEstimate(thetaSketch(col("user_id"))).as("est"),
      countDistinct(col("user_id")).as("exact")).collect().head
    assert(r.getLong(0) == r.getLong(1))
  }

  test("shard-union associativity: day sketches rolled up == one global sketch") {
    val viaShards = ev
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(thetaSketch(col("user_id")).as("sk"))
      .agg(thetaEstimate(thetaUnion(col("sk"))).as("est"))
      .collect().head.getLong(0)
    val global = ev.agg(thetaEstimate(thetaSketch(col("user_id"))))
      .collect().head.getLong(0)
    assert(viaShards == global)
  }

  test("driver-side unionBytes equals a sketch built over the union (exact mode)") {
    // the write-path stats combine: merging one batch's sketch into a
    // stored partition row must answer like sketching the union
    def bytesOf(pred: org.apache.spark.sql.Column) = ev.filter(pred)
      .agg(thetaSketch(col("user_id")).as("sk"))
      .collect().head.getAs[Array[Byte]]("sk")
    val a = bytesOf(col("event_id") % 2 === 0)
    val b = bytesOf(col("event_id") % 2 =!= 0)
    val merged = ThetaKernel.estimate(ThetaKernel.unionBytes(a, b))
    val direct = ev.agg(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(merged == direct)
  }

  test("intersection and A-not-B match exact set ops in exact mode") {
    def users(t: String) = ev.filter(col("event_type") === t).select("user_id")
    def sk(t: String) = ev.filter(col("event_type") === t)
      .agg(thetaSketch(col("user_id")).as("sk"))
    val r = sk("purchase").select(col("sk").as("a"))
      .crossJoin(sk("error").select(col("sk").as("b")))
      .select(thetaIntersectEstimate(col("a"), col("b")).as("i"),
        thetaANotBEstimate(col("a"), col("b")).as("d"))
      .collect().head
    val exactI = users("purchase").intersect(users("error")).count()
    val exactD = users("purchase").except(users("error")).count()
    assert(r.getLong(0) == exactI && r.getLong(1) == exactD)
  }

  test("estimation mode: past 2^lgK the union estimate stays within 5 RSE") {
    import spark.implicits._
    // 40k distinct longs through lgK=10 (nominal 1024): deep estimation
    // mode; RSE ≈ 1/√1024 ≈ 3.1%, so ±15.6% is a 5σ envelope
    val n = 40000L
    val est = spark.range(n).select(
        thetaEstimate(thetaSketch(col("id"), lgK = 10)).as("est"))
      .collect().head.getLong(0)
    assert(math.abs(est - n).toDouble / n < 0.156, s"est=$est for n=$n")
  }

  test("SQL surface: graft_theta_* resolve from SQL text") {
    ev.createOrReplaceTempView("theta_events")
    try {
      val r = spark.sql(
        """SELECT graft_theta_estimate(
          |  graft_theta_union_agg(sk, 14)) AS est
          |FROM (SELECT graft_theta_sketch_agg(user_id, 14) AS sk
          |      FROM theta_events GROUP BY event_type)""".stripMargin)
        .collect().head.getLong(0)
      val exact = ev.select(countDistinct(col("user_id")))
        .collect().head.getLong(0)
      assert(r == exact)
    } finally spark.catalog.dropTempView("theta_events")
  }

  test("empty strings count as a distinct value, matching countDistinct") {
    import spark.implicits._
    val df = Seq("", "a", "b", "", "a").toDF("s")
    val r = df.agg(
      thetaEstimate(thetaSketch(col("s"))).as("est"),
      countDistinct(col("s")).as("exact")).collect().head
    // DataSketches drops empty byte arrays; the marker-byte encoding
    // must keep "" countable — 3 distinct values, not 2
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
  }

  test("string inputs sketch consistently with long inputs' cardinality") {
    val asStr = ev.select(col("user_id").cast("string").as("u"))
      .agg(thetaEstimate(thetaSketch(col("u"))).as("est"))
      .collect().head.getLong(0)
    val exact = ev.select(countDistinct(col("user_id")))
      .collect().head.getLong(0)
    assert(asStr == exact)
  }

  test("q63: streaming per-day sketches match exact batch distincts") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val rows = graft.queries.CapabilityQueries
        .q63StreamSketch(spark, d).collect()
      assert(rows.nonEmpty, s"at $d")
      rows.foreach(r => assert(r.getAs[Long]("matches_exact") == 1L,
        s"day ${r.getLong(0)} estimate != exact at $d"))
    }
  }

  test("q61 gates hold at both fixture SFs") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val r = graft.queries.CapabilityQueries
        .q61ThetaAudienceOverlap(spark, d).collect().head
      assert(r.getAs[Long]("intersect_within_2pct") == 1L, s"at $d")
      assert(r.getAs[Long]("diff_within_2pct") == 1L, s"at $d")
      assert(r.getAs[Long]("exact_both") > 0, s"at $d")
    }
  }
}
