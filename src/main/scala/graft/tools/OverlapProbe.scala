package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextOps
import graft.plans.OverlapJoinRewrite

/** Dev probe: the naive set-overlap self-join with OverlapJoinRewrite
  * on vs off — how much the inverted-index plan buys over the
  * broadcast nested-loop at sf0.1 (5k docs → 25M candidate pairs
  * naive). `capOff` bounds the disabled run so it finishes. */
object OverlapProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val capOff = args.lift(1).map(_.toInt).getOrElse(Int.MaxValue)

    def overlapJoin(docs: DataFrame): DataFrame = {
      val t = docs.select(col("doc_id"), TextOps.shingles(col("text"), 3).as("sh"))
      val a = t.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
      val b = t.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
      a.join(b, size(array_intersect(col("a_sh"), col("b_sh"))) >= 5 &&
        col("a_id") < col("b_id")).select("a_id", "b_id")
    }

    val docs = Tables.documents(spark, d)
    def time(tag: String, df: DataFrame): Long = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[ov] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n pairs)")
      n
    }
    // the hand-written form a user with ids writes: inverted index,
    // pair aggregate, no payload ever rides the element shuffle —
    // the floor the transparent rewrite is measured against
    def handAggregation(docs: DataFrame): DataFrame = {
      val t = docs.select(col("doc_id"), TextOps.shingles(col("text"), 3).as("sh"))
      val e = t.select(col("doc_id"), explode(col("sh")).as("s"))
      e.as("x").join(e.as("y"), col("x.s") === col("y.s") &&
          col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
        .count().filter(col("count") >= 5)
        .select("a_id", "b_id")
    }

    val nOn = time("rewritten narrow (default)", overlapJoin(docs))
    spark.conf.set(OverlapJoinRewrite.NarrowKey, "false")
    try time("rewritten wide (narrow off)", overlapJoin(docs))
    finally spark.conf.set(OverlapJoinRewrite.NarrowKey, "true")
    time("hand aggregation (ids)", handAggregation(docs))
    spark.conf.set(OverlapJoinRewrite.EnabledKey, "false")
    try {
      val capped = if (capOff == Int.MaxValue) docs else docs.limit(capOff)
      val tag = if (capOff == Int.MaxValue) "nested loop (rule off)"
        else s"nested loop (off, $capOff docs)"
      time(tag, overlapJoin(capped))
    } finally spark.conf.set(OverlapJoinRewrite.EnabledKey, "true")
    println(s"[ov] full-corpus pair count under the rewrite: $nOn")
    spark.stop()
  }
}
