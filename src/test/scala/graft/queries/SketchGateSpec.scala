package graft.queries

import graft.SparkSpec

/** q57–q60: the mergeable-summary family. Each query's oracle gate is a
  * DuckDB hash-match; these specs pin the properties the gates rely on
  * at both fixture SFs, so a gate that would flake at driver time fails
  * here first.
  */
class SketchGateSpec extends SparkSpec {

  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("q57 streaming session windows equal the batch q19 result") {
    sfs.foreach { d =>
      val streamed = CapabilityQueries.q57StreamSession(spark, d)
        .collect().toSeq
      val batch = CapabilityQueries.q19SessionWindow(spark, d)
        .collect().toSeq
      assert(streamed == batch, s"at $d")
    }
  }

  test("q58 HLL shard-union estimate is within the 2% gate") {
    sfs.foreach { d =>
      val rows = CapabilityQueries.q58HllShardMerge(spark, d).collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[Long]("within_2pct") == 1L, s"at $d")
      assert(rows.head.getAs[Long]("n_days") > 0, s"at $d")
    }
  }

  test("q58 sketches are associative: day-union equals one global sketch") {
    import org.apache.spark.sql.functions._
    val d = sfs.head
    val ev = graft.core.Tables.events(spark, d)
    val viaShards = ev
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), 14).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().head.getLong(0)
    val global = ev
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 14)).as("est"))
      .collect().head.getLong(0)
    assert(viaShards == global,
      "sharded union must estimate identically to the unsharded sketch")
  }

  test("q59 count-min gates hold for every top-20 talker") {
    sfs.foreach { d =>
      val rows = CapabilityQueries.q59CountminTopTalkers(spark, d).collect()
      assert(rows.nonEmpty && rows.length <= 20, s"at $d")
      rows.foreach { r =>
        assert(r.getAs[Long]("never_underestimates") == 1L,
          s"CMS underestimated user ${r.getLong(0)} at $d")
        assert(r.getAs[Long]("within_eps_bound") == 1L,
          s"CMS overshoot beyond 4εN for user ${r.getLong(0)} at $d")
      }
      // deterministic top-k order: exact_n desc, user_id asc
      val order = rows.map(r => (-r.getAs[Long]("exact_n"), r.getLong(0)))
      assert(order.sameElements(order.sorted), s"at $d")
    }
  }

  test("q60 percentile_approx respects its rank-error guarantee per group") {
    sfs.foreach { d =>
      val rows = CapabilityQueries.q60ApproxQuantileGate(spark, d).collect()
      assert(rows.nonEmpty, s"at $d")
      rows.foreach { r =>
        assert(r.getAs[Long]("within_rank_err") == 1L,
          s"rank error exceeded N/accuracy for ${r.getString(0)} at $d")
      }
    }
  }
}
