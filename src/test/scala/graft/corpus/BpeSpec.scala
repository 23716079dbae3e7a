package graft.corpus

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Pins the distributed BPE trainer against an independent in-memory
  * reference implementation (classic fold-based merge, no string
  * tricks) — the same verification pattern as the k-means portable
  * twin: two dissimilar renderings must agree bit for bit. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Reference BPE: plain Scala collections, greedy left-to-right
    * fold for merge application (the textbook definition, deliberately
    * NOT the replace-on-string encoding the engine uses). */
  private def referenceTrain(words: Map[String, Long],
      nMerges: Int): Seq[BpeMerge] = {
    var segs: Map[Vector[String], Long] = words.toSeq
      .groupMapReduce(w => w._1.toCharArray.map(_.toString).toVector)(_._2)(_ + _)
    val out = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((seg, cnt) <- segs; i <- 0 until seg.length - 1)
        counts((seg(i), seg(i + 1))) = counts.getOrElse((seg(i), seg(i + 1)), 0L) + cnt
      if (counts.isEmpty) done = true
      else {
        val ((l, r), n) = counts.minBy { case ((l, r), n) => (-n, l, r) }
        out += BpeMerge(rank, l, r, n)
        def fold(seg: Vector[String]): Vector[String] =
          seg.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == l && x == r)
              acc.init :+ (l + r)
            else acc :+ x
          }
        segs = segs.toSeq.groupMapReduce(kv => fold(kv._1))(_._2)(_ + _)
        rank += 1
      }
    }
    out.toSeq
  }

  test("trainer matches the fold-based reference for 20 merges on the corpus") {
    val docs = Tables.documents(spark, sf)
    val wc = Bpe.wordCounts(docs, "text")
    val wordsLocal = wc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = referenceTrain(wordsLocal, 20)
    val got = Bpe.train(wc, 20)
    assert(got == expected) // ranks, pairs, AND counts bit-identical
  }

  test("replace-based apply equals the greedy fold on overlap-heavy words") {
    // "aaaa" under (a,a): greedy gives [aa, aa]; "aaa" gives [aa, a]
    val words = Seq("aaaa", "aaa", "ababab", "xabay").toDF("word")
    val merged = words
      .select(col("word"),
        Bpe.segmentWord(col("word"),
          Seq(BpeMerge(1, "a", "a", 0L), BpeMerge(2, "a", "b", 0L))).as("seg"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // merge 1 (a,a) first, then merge 2 (a,b) on the result
    assert(merged("aaaa") == Seq("aa", "aa"))
    assert(merged("aaa") == Seq("aa", "a"))
    assert(merged("ababab") == Seq("ab", "ab", "ab"))
    assert(merged("xabay") == Seq("x", "ab", "a", "y"))
  }

  test("segmentStats: subwords shrink monotonically as merges apply, never below tokens") {
    val docs = Tables.documents(spark, sf)
    val wc = Bpe.wordCounts(docs, "text")
    val m0 = Seq.empty[BpeMerge]
    val m5 = Bpe.train(wc, 5)
    def total(ms: Seq[BpeMerge]): Long =
      Bpe.segmentStats(docs, "doc_id", "text", ms)
        .agg(sum("n_subwords"), sum("n_tokens")).head match {
          case r => r.getLong(0)
        }
    val chars = total(m0)
    val after = total(m5)
    val tokens = Bpe.segmentStats(docs, "doc_id", "text", m0)
      .agg(sum("n_tokens")).head.getLong(0)
    assert(after < chars)     // merges actually compressed something
    assert(after >= tokens)   // can never go below one symbol per token
  }

  test("pairCounts counts every adjacent occurrence, weighted by word count") {
    val words = Seq(("aaa", 2L), ("ab", 3L)).toDF("word", "cnt")
    val spaced = words.select(Bpe.spacedChars(col("word")).as("s"), col("cnt"))
    val pc = Bpe.pairCounts(spaced, "s", "cnt")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pc(("a", "a")) == 4L) // two occurrences in "aaa", weight 2
    assert(pc(("a", "b")) == 3L)
  }
}
