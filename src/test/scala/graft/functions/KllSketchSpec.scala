package graft.functions

import graft.SparkSpec
import graft.functions.KllFunctions._
import org.apache.spark.sql.functions._

/** KLL mergeable quantiles. KLL compaction is randomized, so every
  * assertion here tests the published probabilistic rank-error bound
  * with slack — never exact sketch values.
  */
class KllSketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def li = graft.core.Tables.lineitem(spark, sf)
    .select("l_returnflag", "l_shipdate", "l_extendedprice")

  /** Exact rank of `v` among the prices: fraction <= v. */
  private def exactRank(v: Double): Double = {
    val (le, n) = (li.filter(col("l_extendedprice") <= v).count(),
      li.count())
    le.toDouble / n
  }

  test("sketch median lands within the rank-error envelope") {
    val v = li.agg(kllQuantile(kllSketch(col("l_extendedprice")),
      lit(0.5)).as("v")).collect().head.getDouble(0)
    val r = exactRank(v)
    assert(math.abs(r - 0.5) <= 0.05, s"median rank $r")
  }

  test("shard-merge answers like a direct sketch (both within the bound)") {
    val merged = li
      .groupBy(date_trunc("month", col("l_shipdate")).as("m"))
      .agg(kllSketch(col("l_extendedprice")).as("sk"))
      .agg(kllQuantile(kllMerge(col("sk")), lit(0.9)).as("v"))
      .collect().head.getDouble(0)
    val r = exactRank(merged)
    assert(math.abs(r - 0.9) <= 0.05, s"merged p90 rank $r")
  }

  test("driver-side mergeBytes answers like a direct sketch (within the bound)") {
    // the write-path stats combine: merging a batch sketch into a
    // stored partition row must keep the rank-error guarantee
    def bytesOf(pred: org.apache.spark.sql.Column) = li.filter(pred)
      .agg(kllSketch(col("l_extendedprice")).as("sk"))
      .collect().head.getAs[Array[Byte]]("sk")
    val merged = KllKernel.mergeBytes(
      bytesOf(col("l_extendedprice") <= 30000),
      bytesOf(col("l_extendedprice") > 30000))
    val v = KllKernel.quantile(merged, 0.5).doubleValue
    val r = exactRank(v)
    assert(math.abs(r - 0.5) <= 0.05, s"merged median rank $r")
  }

  test("graft_kll_rank inverts graft_kll_quantile to within the bound") {
    val row = li.agg(kllSketch(col("l_extendedprice")).as("sk"))
      .select(kllRank(col("sk"), kllQuantile(col("sk"), lit(0.25)))
        .as("r")).collect().head
    assert(math.abs(row.getDouble(0) - 0.25) <= 0.05)
  }

  test("empty sketch queries return null, not an exception") {
    val row = li.filter(lit(false))
      .agg(kllSketch(col("l_extendedprice")).as("sk"))
      .select(kllQuantile(col("sk"), lit(0.5)).as("q"),
        kllRank(col("sk"), lit(0.0)).as("r")).collect().head
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("SQL surface: graft_kll_* resolve from SQL text") {
    li.createOrReplaceTempView("kll_lineitem")
    try {
      // bare 0.5 parses as DECIMAL(1,1): ImplicitCastInputTypes must
      // coerce it to double like a built-in, not fail analysis
      val v = spark.sql(
        """SELECT graft_kll_quantile(
          |  graft_kll_merge_agg(sk, 200), 0.5) AS v
          |FROM (SELECT graft_kll_sketch_agg(l_extendedprice, 200) AS sk
          |      FROM kll_lineitem GROUP BY l_returnflag)""".stripMargin)
        .collect().head.getDouble(0)
      assert(math.abs(exactRank(v) - 0.5) <= 0.05)
      // same for the rank direction with an integer literal value
      val r = spark.sql(
        """SELECT graft_kll_rank(graft_kll_sketch_agg(l_extendedprice, 200),
          |  0) AS r FROM kll_lineitem""".stripMargin)
        .collect().head.getDouble(0)
      assert(r == 0.0, s"rank of 0 should be 0.0, got $r")
    } finally spark.catalog.dropTempView("kll_lineitem")
  }

  test("q62 gates hold at both fixture SFs") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val rows = graft.queries.CapabilityQueries
        .q62KllQuantileMerge(spark, d).collect()
      assert(rows.nonEmpty, s"at $d")
      rows.foreach { r =>
        assert(r.getAs[Long]("within_rank_err") == 1L,
          s"rank envelope failed for ${r.getString(0)} at $d")
      }
    }
  }
}
