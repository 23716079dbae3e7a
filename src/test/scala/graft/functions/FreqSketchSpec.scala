package graft.functions

import graft.SparkSpec
import graft.functions.FreqFunctions._
import org.apache.spark.sql.functions._

/** Frequent-items sketches: the deterministic containment guarantee
  * under forced purging, exactness below map capacity, shard-merge
  * equivalence, and the SQL surface.
  */
class FreqSketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def ev = graft.core.Tables.events(spark, sf)

  test("below map capacity: maxError 0 and every count exact") {
    val sk = ev.agg(freqSketch(col("user_id"), 8192).as("sk"))
    val joined = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(sk))
      .select(col("n"), freqEstimate(col("sk"), col("user_id")).as("est"),
        freqMaxError(col("sk")).as("err"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(2) == 0L)
      assert(r.getLong(0) == r.getLong(1))
    }
  }

  test("past saturation the bounds still contain every true count") {
    // tiny map (64) over high-cardinality orderkeys forces purging
    val li = graft.core.Tables.lineitem(spark, sf).select("l_orderkey")
    val sk = li.agg(freqSketch(col("l_orderkey"), 64).as("sk"))
    val rows = li.groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(sk))
      .select(col("n"),
        freqLowerBound(col("sk"), col("l_orderkey")).as("lb"),
        freqUpperBound(col("sk"), col("l_orderkey")).as("ub"),
        freqMaxError(col("sk")).as("err"))
      .collect()
    assert(rows.head.getLong(3) > 0L, "purge expected with maxMapSize=64")
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(0) && r.getLong(0) <= r.getLong(2),
        s"bounds [${r.getLong(1)}, ${r.getLong(2)}] miss ${r.getLong(0)}")
    }
  }

  test("day-shard merge equals the global sketch when exact") {
    val shardEst = ev
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(freqSketch(col("user_id"), 8192).as("sk"))
      .agg(freqMerge(col("sk"), 8192).as("sk"))
    val byShards = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(shardEst))
      .select(col("n"), freqEstimate(col("sk"), col("user_id")).as("est"))
      .collect()
    byShards.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("SQL surface: graft_freq_* resolve from SQL text") {
    ev.createOrReplaceTempView("freq_events")
    try {
      val r = spark.sql(
        """SELECT graft_freq_max_error(
          |  graft_freq_merge_agg(sk, 8192)) AS err
          |FROM (SELECT graft_freq_sketch_agg(user_id, 8192) AS sk
          |      FROM freq_events GROUP BY event_type)""".stripMargin)
        .collect().head.getLong(0)
      assert(r == 0L)
      // bare integer literal parses as INT: ImplicitCastInputTypes must
      // coerce it to bigint like a built-in, not fail analysis
      val est = spark.sql(
        """SELECT graft_freq_estimate(
          |  graft_freq_sketch_agg(user_id, 8192), 5) AS est
          |FROM freq_events""".stripMargin).collect().head.getLong(0)
      val exact = ev.filter(col("user_id") === 5L).count()
      assert(est == exact, s"est $est != exact $exact")
    } finally spark.catalog.dropTempView("freq_events")
  }

  test("q64 gates hold at both fixture SFs") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val rows = graft.queries.CapabilityQueries
        .q64FreqTopTalkers(spark, d).collect()
      assert(rows.nonEmpty && rows.length <= 20, s"at $d")
      rows.foreach { r =>
        assert(r.getAs[Long]("bounds_contain_exact") == 1L, s"at $d")
        assert(r.getAs[Long]("estimate_exact") == 1L, s"at $d")
      }
    }
  }
}
