package graft.plans

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The optimizer rule must turn a naive equi-key-less time-range join
  * into the bucketed shape — and must leave everything else alone. */
class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** The naive formulation a user would write: no manual bucketing. */
  private def naivePairs: DataFrame = {
    val ev = Tables.events(spark, sf)
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id".as("error_id"), $"ts".as("e_ts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"ts".as("p_ts"))
    purchases.join(errors,
      $"p_ts" >= $"e_ts" && $"p_ts" < $"e_ts" + expr("INTERVAL 10 MINUTES"))
      .select("error_id", "p_id")
  }

  private def planOf(df: DataFrame): String = {
    df.collect() // AQE finalizes join strategy on execution
    df.queryExecution.executedPlan.toString
  }

  private def withRuleDisabled[T](body: => T): T = {
    spark.conf.set(RangeJoinRewrite.EnabledKey, "false")
    try body finally spark.conf.set(RangeJoinRewrite.EnabledKey, "true")
  }

  test("naive range join is rewritten to a bucketed equi join") {
    val plan = planOf(naivePairs)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"rule did not fire:\n$plan")
    assert(plan.contains("Generate"), s"no bucket-cover explode:\n$plan")
  }

  test("rewrite preserves the naive join's answer exactly") {
    val rewritten = naivePairs
    val naive = withRuleDisabled {
      val df = naivePairs
      assert(planOf(df).contains("BroadcastNestedLoopJoin"),
        "control run was expected to plan the nested loop")
      df.collect().toSet
    }
    assert(rewritten.collect().toSet == naive)
    assert(naive.nonEmpty)
  }

  test("closed upper bound (BETWEEN shape) also rewrites, exactly") {
    val ev = Tables.events(spark, sf)
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id".as("error_id"), $"ts".as("e_ts"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("c_id"), $"ts".as("c_ts"))
    def q = clicks.join(errors,
      $"c_ts".between($"e_ts", $"e_ts" + expr("INTERVAL 3 MINUTES")))
      .select("error_id", "c_id")
    val plan = planOf(q)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val expected = withRuleDisabled(q.collect().toSet)
    assert(q.collect().toSet == expected && expected.nonEmpty)
  }

  test("matches the manual RangeJoin.pointInInterval answer") {
    val ev = Tables.events(spark, sf)
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id".as("error_id"), $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 10 MINUTES")).as("w_end"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"ts".as("p_ts"))
    val manual = graft.operators.RangeJoin
      .pointInInterval(purchases, errors, "p_ts", "w_start", "w_end")
      .select("error_id", "p_id").collect().toSet
    assert(naivePairs.collect().toSet == manual)
  }

  test("joins with a cross-side equi key are left untouched") {
    val ev = Tables.events(spark, sf)
    val a = ev.select($"event_id".as("a_id"), $"user_id".as("a_user"), $"ts".as("a_ts"))
    val b = ev.select($"event_id".as("b_id"), $"user_id".as("b_user"), $"ts".as("b_ts"))
    val q = a.join(b, $"a_user" === $"b_user" &&
      $"b_ts" >= $"a_ts" && $"b_ts" < $"a_ts" + expr("INTERVAL 5 MINUTES"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("_rj_bucket"),
      "equi-keyed join must not pay the bucket-cover explode")
  }

  test("an unrelated timestamp comparison does not hide the band") {
    val ev = Tables.events(spark, sf)
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id".as("error_id"), $"ts".as("e_ts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"ts".as("p_ts"))
    // first conjunct is a one-sided bound whose point has no partner;
    // the real (lower, upper) band follows — the rule must keep looking
    val q = purchases.join(errors,
      $"e_ts" <= $"p_ts" + expr("INTERVAL 90 DAYS") &&
        $"p_ts" >= $"e_ts" && $"p_ts" < $"e_ts" + expr("INTERVAL 10 MINUTES"))
      .select("error_id", "p_id")
    val plan = planOf(q)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"band hidden by decoy bound:\n$plan")
    assert(q.collect().toSet == naivePairs.collect().toSet)
  }

  test("TIMESTAMP_NTZ range joins rewrite too, exactly (round-7 regression)") {
    // the testdata's ts encoding changed to NTZ under a frozen tree in
    // round 7 and the rule silently stopped firing — a 99 s nested loop
    // where a sub-second bucketed equi-join ran before. Both encodings
    // must keep the rewrite.
    val ev = Tables.events(spark, sf).limit(200)
      .withColumn("nts", $"ts".cast("timestamp_ntz"))
    val a = ev.select($"event_id".as("a_id"), $"nts".as("a_ts"))
    val b = ev.select($"event_id".as("b_id"), $"nts".as("b_ts"))
    def q = a.join(b,
      $"b_ts" >= $"a_ts" && $"b_ts" < $"a_ts" + expr("INTERVAL 1 MINUTE"))
      .select("a_id", "b_id")
    assert(q.queryExecution.optimizedPlan.toString.contains("_rj_bucket"),
      "rule must fire on TIMESTAMP_NTZ columns")
    val plan = planOf(q)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"NTZ band did not rewrite:\n$plan")
    val expected = withRuleDisabled(q.collect().toSet)
    assert(q.collect().toSet == expected && expected.nonEmpty)
  }

  test("DATE-typed range joins rewrite with day-floor buckets, exactly") {
    val o = Tables.orders(spark, sf)
      .withColumn("od", $"o_orderdate".cast("date")).limit(300)
    val a = o.select($"o_orderkey".as("a_id"), $"od".as("a_d"))
    val b = o.select($"o_orderkey".as("b_id"), $"od".as("b_d"))
    // orders within the 7 days after another order's date
    def q = a.join(b,
      $"b_d" >= $"a_d" && $"b_d" < date_add($"a_d", 7) && $"a_id" =!= $"b_id")
      .select("a_id", "b_id")
    val plan = planOf(q)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"date band did not rewrite:\n$plan")
    val expected = withRuleDisabled(q.collect().toSet)
    assert(q.collect().toSet == expected && expected.nonEmpty)
  }

  test("non-temporal joins are left untouched") {
    val ev = Tables.events(spark, sf)
    val a = ev.select($"event_id".as("a_id"), $"value".as("a_v"))
    val b = ev.select($"event_id".as("b_id"), $"value".as("b_v"))
    // numeric range condition: out of scope, must not rewrite
    val q = a.limit(50).join(b.limit(50), $"b_v" >= $"a_v" && $"b_v" < $"a_v" + 1.0)
    assert(!q.queryExecution.optimizedPlan.toString.contains("_rj_bucket"))
  }
}
