package graft.corpus

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  test("resample ranks target-like documents first; smoothing keeps unseen buckets finite") {
    val docs = Seq(
      (1L, "alpha beta alpha beta", "tgt"),     // pure target vocabulary
      (2L, "gamma delta gamma delta", "other"), // pure background
      (3L, "alpha beta gamma delta", "other"),  // mixed
      (4L, "", "other")                          // token-less
    ).toDF("doc_id", "text", "grp")
    val out = Importance.resample(docs, "doc_id", "text",
        col("grp") === "tgt", k = 4, buckets = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // target-vocab doc first, mixed in the middle, background low, empty = 0
    assert(out.head._1 == 1L)
    val byId = out.map(t => t._1 -> t._3).toMap
    assert(byId(1L) > byId(3L) && byId(3L) > byId(2L))
    assert(byId(4L) == 0L)
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L, 4L))
  }

  test("score math matches a hand computation (integer ratios, mean scaling)") {
    // one doc, one token; force its bucket's counts to known values
    val docs = Seq((1L, "tok")).toDF("doc_id", "text")
    val b = Importance.bucketCounts(docs, "text", 8)
    assert(b.sum == 1L && b.count(_ == 1L) == 1)  // exactly one bucket hit
    val bucket = b.indexOf(1L)
    val raw = Array.fill(8)(0L); raw(bucket) = 3L       // pretend raw count 3
    val tgt = Array.fill(8)(0L); tgt(bucket) = 1L       // target count 1
    val r = Importance.ratios(raw, tgt)
    assert(r(bucket) == (1L + 1L) * 1000000L / (3L + 1L))  // 500000
    val scored = Importance.score(docs, "doc_id", "text", r, 8).head
    // one token: mean = sum; importance = 500000 * 1000 / 1
    assert(scored.getLong(2) == 500000000L)
  }

  test("scoring pass is map-only: no exchange in the physical plan") {
    val docs = Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
    val plan = Importance.score(docs, "doc_id", "text",
        Array.fill(16)(1L), 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"scoring must not shuffle — the model is a plan literal:\n$plan")
  }
}
