package graft.plans

import graft.SparkSpec
import graft.core.Tables
import graft.functions.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The overlap-join rule must turn a naive set-overlap join into the
  * duplicate-free inverted-index equi-join — multiplicity preserved
  * via the first-witness residual — and leave everything else alone. */
class OverlapJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def naiveOverlap: DataFrame = {
    val d = Tables.documents(spark, sf)
      .select($"doc_id", TextOps.shingles($"text", 3).as("sh"))
    val a = d.select($"doc_id".as("a_id"), $"sh".as("a_sh"))
    val b = d.select($"doc_id".as("b_id"), $"sh".as("b_sh"))
    a.join(b, size(array_intersect($"a_sh", $"b_sh")) >= 5 && $"a_id" < $"b_id")
      .select("a_id", "b_id")
  }

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def withRuleDisabled[T](body: => T): T = {
    spark.conf.set(OverlapJoinRewrite.EnabledKey, "false")
    try body finally spark.conf.set(OverlapJoinRewrite.EnabledKey, "true")
  }

  test("naive overlap join is rewritten to an inverted-index equi join") {
    val plan = planOf(naiveOverlap)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"rule did not fire:\n$plan")
    assert(plan.contains("Generate"), s"no element explode:\n$plan")
  }

  test("rewritten result equals the naive nested-loop result, multiplicity included") {
    val rewritten = naiveOverlap.collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = withRuleDisabled {
      val df = naiveOverlap
      val plan = planOf(df)
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("CartesianProduct"), s"naive plan unexpectedly blocked:\n$plan")
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    assert(rewritten.nonEmpty)
    // exact bag equality: sorted sequences, not sets — a duplicate
    // meeting would show up here
    assert(rewritten.sorted.toSeq == naive.sorted.toSeq)
  }

  test("arrays_overlap form is rewritten and agrees with the naive answer") {
    val d = Tables.documents(spark, sf).limit(80)
      .select($"doc_id", TextOps.shingles($"text", 3).as("sh"))
    val a = d.select($"doc_id".as("a_id"), $"sh".as("a_sh"))
    val b = d.select($"doc_id".as("b_id"), $"sh".as("b_sh"))
    def q: DataFrame = a.join(b,
        arrays_overlap($"a_sh", $"b_sh") && $"a_id" < $"b_id")
      .select("a_id", "b_id")
    val plan = planOf(q)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"rule did not fire:\n$plan")
    val rewritten = q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val naive = withRuleDisabled {
      q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    assert(rewritten == naive && rewritten.nonEmpty)
  }

  test("duplicate and null elements: rewritten bag equals nested loop (k>=2 null path)") {
    // arrays with repeated elements AND null elements: array_except
    // dedup + the first-witness residual must still give exactly one
    // meeting per pair, and null contributions to the intersection
    // must still count via the residual (k=2 with one shared non-null
    // + shared null qualifies)
    val rows = Seq(
      (1L, Seq[String]("x", "x", "a", null)),
      (2L, Seq[String]("x", null, "b")),      // ∩ with 1: {x, null} → 2
      (3L, Seq[String]("a", "x", "c", "a")),  // ∩ with 1: {a, x} → 2; with 2: {x} → 1
      (4L, Seq[String](null, "d"))            // ∩ with 1: {null} → 1 < 2
    ).toDF("id", "arr")
    val a = rows.select($"id".as("a_id"), $"arr".as("a_arr"))
    val b = rows.select($"id".as("b_id"), $"arr".as("b_arr"))
    def q: DataFrame = a.join(b,
        size(array_intersect($"a_arr", $"b_arr")) >= 2 && $"a_id" < $"b_id")
      .select("a_id", "b_id")
    val plan = planOf(q)
    assert(plan.contains("Generate") && !plan.contains("BroadcastNestedLoopJoin"),
      s"rule did not fire on containsNull arrays with k=2:\n$plan")
    val rewritten = q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val naive = withRuleDisabled {
      q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    assert(rewritten == naive)
    // (1,2) via shared x + shared null (null counts through the
    // residual); (2,3) share only x → 1 < 2, correctly excluded
    assert(rewritten == Seq((1L, 2L), (1L, 3L)))
  }

  test("k=1 over containsNull arrays does NOT fire (null-only overlap would be lost)") {
    val rows = Seq(
      (1L, Seq[String]("a", null)),
      (2L, Seq[String](null, "b"))).toDF("id", "arr")
    val a = rows.select($"id".as("a_id"), $"arr".as("a_arr"))
    val b = rows.select($"id".as("b_id"), $"arr".as("b_arr"))
    val df = a.join(b,
        size(array_intersect($"a_arr", $"b_arr")) >= 1 && $"a_id" < $"b_id")
      .select("a_id", "b_id")
    val plan = planOf(df)
    assert(!plan.contains("Generate"), s"k=1 null path must not rewrite:\n$plan")
    // and the naive answer indeed contains the null-only pair the
    // blocking could never find — the reason for the guard
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L)))
  }

  private def withNarrowDisabled[T](body: => T): T = {
    spark.conf.set(OverlapJoinRewrite.NarrowKey, "false")
    try body finally spark.conf.set(OverlapJoinRewrite.NarrowKey, "true")
  }

  test("narrow path fires by default: id-tag windows in the plan, elements shuffled id-only") {
    val df = naiveOverlap
    val plan = planOf(df)
    // the synthetic-id tag plans one window per side
    assert(plan.contains("row_number") || plan.contains("RowNumber"),
      s"narrow tagging absent:\n$plan")
    // and the pair aggregate exists (wide form has no aggregate at all)
    assert(plan.contains("HashAggregate"), s"no pair aggregate:\n$plan")
  }

  test("a user-hinted overlap join keeps its hint (wide path carries it)") {
    val d = Tables.documents(spark, sf)
      .select($"doc_id", TextOps.shingles($"text", 3).as("sh"))
    val a = d.select($"doc_id".as("a_id"), $"sh".as("a_sh"))
    val b = d.select($"doc_id".as("b_id"), $"sh".as("b_sh"))
    def hinted = a.join(b.hint("shuffle_hash"),
        size(array_intersect($"a_sh", $"b_sh")) >= 5 && $"a_id" < $"b_id")
      .select("a_id", "b_id")
    val plan = planOf(hinted)
    // a pinned hint has no faithful mapping onto the three-join narrow
    // decomposition — the rewrite takes the wide path and carries it
    assert(!plan.contains("HashAggregate"),
      s"hinted join must take the wide path:\n$plan")
    assert(plan.contains("ShuffledHashJoin"), s"hint lost in rewrite:\n$plan")
    val got = hinted.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    val want = naiveOverlap.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    assert(got == want && got.nonEmpty)
  }

  test("wide fallback (narrow=false): same bag, first-witness single join") {
    val narrow = naiveOverlap.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    val wide = withNarrowDisabled {
      val df = naiveOverlap
      val plan = planOf(df)
      assert(!plan.contains("HashAggregate"),
        s"wide path must be a single residual join:\n$plan")
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    assert(narrow == wide && narrow.nonEmpty)
  }

  test("non-orderable payload (map column) falls back to the wide form, same answer") {
    val rows = Seq(
      (1L, Seq("x", "y", "z", "q", "r"), Map("k" -> 1)),
      (2L, Seq("x", "y", "z", "q", "s"), Map("k" -> 2)),
      (3L, Seq("a", "b", "c", "d", "e"), Map("k" -> 3))
    ).toDF("id", "arr", "m")
    val a = rows.select($"id".as("a_id"), $"arr".as("a_arr"), $"m".as("a_m"))
    val b = rows.select($"id".as("b_id"), $"arr".as("b_arr"))
    def q: DataFrame = a.join(b,
        size(array_intersect($"a_arr", $"b_arr")) >= 4 && $"a_id" < $"b_id")
      .select("a_id", "b_id")
    val plan = planOf(q)
    // rewrite still fires (wide), never a nested loop
    assert(plan.contains("Generate") && !plan.contains("BroadcastNestedLoopJoin"),
      s"wide fallback did not fire:\n$plan")
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L)))
  }

  test("nondeterministic side falls back to wide (copy re-execution would diverge)") {
    val d = Tables.documents(spark, sf).limit(60)
      .select($"doc_id", TextOps.shingles($"text", 3).as("sh"),
        rand(7).as("salt")) // nondeterministic column in the payload
    val a = d.select($"doc_id".as("a_id"), $"sh".as("a_sh"), $"salt".as("a_salt"))
    val b = d.select($"doc_id".as("b_id"), $"sh".as("b_sh"))
    // a_salt must survive column pruning (be in the output), or the
    // optimizer removes the nondeterminism before the rule ever sees it
    def q: DataFrame = a.join(b,
        size(array_intersect($"a_sh", $"b_sh")) >= 5 && $"a_id" < $"b_id")
      .select("a_id", "b_id", "a_salt")
    val plan = planOf(q)
    assert(!plan.contains("HashAggregate"),
      s"narrow path must not duplicate a nondeterministic subtree:\n$plan")
    assert(plan.contains("Generate") && !plan.contains("BroadcastNestedLoopJoin"),
      s"wide fallback did not fire:\n$plan")
  }

  test("fully duplicate rows keep exact multiplicity through the narrow path") {
    // two bit-identical rows on each side: ids are assigned by a sort
    // tie among equal rows — any assignment must yield the same bag
    // (4 copies of the qualifying pair, plus self-pairs filtered by id<)
    val rows = Seq(
      (1L, Seq("p", "q", "r")), (1L, Seq("p", "q", "r")),
      (2L, Seq("p", "q", "s")), (9L, Seq("z", "w", "v"))
    ).toDF("id", "arr")
    val a = rows.select($"id".as("a_id"), $"arr".as("a_arr"))
    val b = rows.select($"id".as("b_id"), $"arr".as("b_arr"))
    def q: DataFrame = a.join(b,
        size(array_intersect($"a_arr", $"b_arr")) >= 2 && $"a_id" < $"b_id")
      .select("a_id", "b_id")
    val narrow = q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val naive = withRuleDisabled {
      q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    assert(narrow == naive)
    // duplicate a-rows each pair with the b-row: multiplicity 2 each way
    assert(narrow == Seq((1L, 2L), (1L, 2L)))
  }

  test("a cross-side equality conjunct disables the rewrite (native hash join wins)") {
    val d = Tables.documents(spark, sf)
      .select($"doc_id", $"source", TextOps.shingles($"text", 3).as("sh"))
    val a = d.select($"doc_id".as("a_id"), $"source".as("a_src"), $"sh".as("a_sh"))
    val b = d.select($"doc_id".as("b_id"), $"source".as("b_src"), $"sh".as("b_sh"))
    val df = a.join(b,
        $"a_src" === $"b_src" &&
          size(array_intersect($"a_sh", $"b_sh")) >= 5 && $"a_id" < $"b_id")
      .select("a_id", "b_id")
    val plan = planOf(df)
    assert(!plan.contains("Generate"), s"rule fired despite equi key:\n$plan")
  }
}
