package graft.plans

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The edit-distance join rule must turn a naive levenshtein-threshold
  * join into the length-band blocked shape — and leave everything
  * else alone. */
class EditDistanceJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def naiveFuzzy: DataFrame = {
    val p = Tables.part(spark, sf)
    val a = p.select($"p_partkey".as("a_id"), $"p_name".as("a_name"))
    val b = p.select($"p_partkey".as("b_id"), $"p_name".as("b_name"))
    a.join(b, levenshtein($"a_name", $"b_name") <= 3 && $"a_id" < $"b_id")
      .select("a_id", "b_id")
  }

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def withRuleDisabled[T](body: => T): T = {
    spark.conf.set(EditDistanceJoinRewrite.EnabledKey, "false")
    try body finally spark.conf.set(EditDistanceJoinRewrite.EnabledKey, "true")
  }

  test("naive levenshtein-threshold join is rewritten to a band equi join") {
    val plan = planOf(naiveFuzzy)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"rule did not fire:\n$plan")
    assert(plan.contains("Generate"), s"no band-cover explode:\n$plan")
  }

  test("rewrite preserves the naive join's answer exactly") {
    val rewritten = naiveFuzzy.collect().toSet
    val naive = withRuleDisabled {
      val df = naiveFuzzy
      assert(planOf(df).contains("BroadcastNestedLoopJoin"),
        "control run was expected to plan the nested loop")
      df.collect().toSet
    }
    assert(rewritten == naive && naive.nonEmpty)
  }

  test("strict-< and reversed comparison shapes also rewrite, exactly") {
    val p = Tables.part(spark, sf)
    val a = p.select($"p_partkey".as("a_id"), $"p_name".as("a_name"))
    val b = p.select($"p_partkey".as("b_id"), $"p_name".as("b_name"))
    def q = a.join(b,
      lit(4) > levenshtein($"a_name", $"b_name") && $"a_id" < $"b_id")
      .select("a_id", "b_id")
    val plan = planOf(q)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(q.collect().toSet == withRuleDisabled(q.collect().toSet))
  }

  test("matches the manual editDistancePairs answer") {
    val manual = graft.dedup.Dedup
      .editDistancePairs(Tables.part(spark, sf), "p_partkey", "p_name",
        Seq("p_brand"), maxDist = 3)
      .select("a_id", "b_id").collect().toSet
    val p = Tables.part(spark, sf)
    val a = p.select($"p_partkey".as("a_id"), $"p_name".as("a_name"),
      $"p_brand".as("a_brand"))
    val b = p.select($"p_partkey".as("b_id"), $"p_name".as("b_name"),
      $"p_brand".as("b_brand"))
    // brand equality present -> rule skips; the filter-after-join form
    // computes the same pair set the manual operator builds
    val viaJoin = a.join(b, $"a_brand" === $"b_brand" && $"a_id" < $"b_id" &&
        levenshtein($"a_name", $"b_name") <= 3)
      .select("a_id", "b_id").collect().toSet
    assert(viaJoin == manual && manual.nonEmpty)
  }

  test("reversed argument orientation (right-side string first) rewrites, exactly") {
    val p = Tables.part(spark, sf)
    val a = p.select($"p_partkey".as("a_id"), $"p_name".as("a_name"))
    val b = p.select($"p_partkey".as("b_id"), $"p_name".as("b_name"))
    // levenshtein's FIRST argument comes from the join's RIGHT side
    def q = a.join(b,
      levenshtein($"b_name", $"a_name") <= 3 && $"a_id" < $"b_id")
      .select("a_id", "b_id")
    val plan = planOf(q)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(q.collect().toSet == naiveFuzzy.collect().toSet)
  }

  test("THRESHOLD-form levenshtein joins are left untouched (-1 <= k is true)") {
    // levenshtein(a, b, t) returns -1 past t, and -1 <= k matches
    // arbitrarily distant pairs — the band cover would lose them, so
    // the rule must not fire on the 3-arg form
    val p = Tables.part(spark, sf)
    val a = p.select($"p_partkey".as("a_id"), $"p_name".as("a_name"))
    val b = p.select($"p_partkey".as("b_id"), $"p_name".as("b_name"))
    val q = a.join(b,
      levenshtein($"a_name", $"b_name", 1) <= 2 && $"a_id" < $"b_id")
      .select("a_id", "b_id")
    assert(!q.queryExecution.optimizedPlan.toString.contains("_ed_band"))
    // and the (surprising) native semantics really do include far pairs
    assert(q.count() > naiveFuzzy.count())
  }

  test("joins with a cross-side equi key are left untouched") {
    val p = Tables.part(spark, sf)
    val a = p.select($"p_partkey".as("a_id"), $"p_name".as("a_name"),
      $"p_brand".as("a_brand"))
    val b = p.select($"p_partkey".as("b_id"), $"p_name".as("b_name"),
      $"p_brand".as("b_brand"))
    val q = a.join(b, $"a_brand" === $"b_brand" &&
      levenshtein($"a_name", $"b_name") <= 2)
    assert(!q.queryExecution.optimizedPlan.toString.contains("_ed_band"),
      "equi-keyed join must not pay the band-cover explode")
  }
}
