package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("boundary semantics: start inclusive, end exclusive, bucket crossings exact") {
    val intervals = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")),
      (2L, ts("2024-01-01 10:09:00"), ts("2024-01-01 10:29:00")) // 3 buckets at 600s
    ).toDF("iv_id", "w_start", "w_end")
    val points = Seq(
      (10L, ts("2024-01-01 10:00:00")),  // == start of 1 → in
      (11L, ts("2024-01-01 10:10:00")),  // == end of 1 → out; in 2
      (12L, ts("2024-01-01 10:09:59")),  // in both
      (13L, ts("2024-01-01 10:28:59")),  // last µs-ish of 2, 3rd bucket
      (14L, ts("2024-01-01 10:29:00")),  // == end of 2 → out
      (15L, ts("2024-01-01 09:59:59"))   // before everything
    ).toDF("p_id", "p_ts")
    val got = RangeJoin.pointInInterval(points, intervals,
        "p_ts", "w_start", "w_end", bucketSeconds = 600L)
      .select("p_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 1L), (11L, 2L), (12L, 1L), (12L, 2L), (13L, 2L)))
  }

  test("matches the naive range join exactly on real events, with no duplicate pairs") {
    val ev = Tables.events(spark, sf)
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id".as("error_id"), $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 10 MINUTES")).as("w_end"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"ts".as("p_ts"))
    val bucketed = RangeJoin.pointInInterval(purchases, errors,
        "p_ts", "w_start", "w_end", bucketSeconds = 600L)
      .select("p_id", "error_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // one row per qualifying pair — the single-bucket-per-point
    // property means no dedup pass is needed
    assert(bucketed.length == bucketed.distinct.length)
    val naive = purchases.join(errors,
        $"p_ts" >= $"w_start" && $"p_ts" < $"w_end")
      .select("p_id", "error_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(bucketed.toSet == naive.toSet)
    assert(naive.nonEmpty) // the comparison exercised real overlap
  }

  test("plans as a bucket equi-join, never a nested-loop cross product") {
    val ev = Tables.events(spark, sf)
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id".as("error_id"), $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 10 MINUTES")).as("w_end"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"ts".as("p_ts"))
    val plan = RangeJoin.pointInInterval(purchases, errors,
        "p_ts", "w_start", "w_end", 600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("extraEquiKeys compose: per-user windows only match that user's points") {
    val intervals = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (2L, 8L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))
    ).toDF("iv_id", "user_id", "w_start", "w_end")
    val points = Seq(
      (10L, 7L, ts("2024-01-01 10:30:00")),
      (11L, 8L, ts("2024-01-01 10:30:00")),
      (12L, 9L, ts("2024-01-01 10:30:00"))
    ).toDF("p_id", "user_id", "p_ts")
    val got = RangeJoin.pointInInterval(points, intervals,
        "p_ts", "w_start", "w_end", 600L, extraEquiKeys = Seq("user_id"))
      .select("p_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 1L), (11L, 2L)))
  }

  test("disjoint-name guard rejects colliding schemas") {
    val a = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("id", "ts")
    val b = Seq((1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("id", "s", "e")
    assertThrows[IllegalArgumentException](
      RangeJoin.pointInInterval(a, b, "ts", "s", "e"))
  }
}
