package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.dedup.Dedup
import graft.similarity.Ann

/** Round-9 measurement probe: observed values behind the quantitative
  * oracle gates (q17 approx-distinct error, s05/s07 objective-descent
  * ratios, d03 LSH recall counts, d04 portable SimHash pair counts,
  * portable-LSH/IVF result sizes) at each SF, so gate thresholds are
  * pinned from data rather than guessed.
  * Usage: runMain graft.tools.GateProbe <sfDir> [sfDir...]
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { d =>
      println(s"===== $d")
      val emb = Tables.embeddings(spark, d)
      val docs = Tables.documents(spark, d)
      val queries = emb.filter(col("vec_id") < 10)

      // s05 / s07: the SAME gate bodies the shipped queries run
      // (TrainingQueries.kmeansSseAt / pqReconErrAt) — calibration
      // evidence cannot drift from the gates it calibrates
      val sse0 = graft.queries.TrainingQueries.kmeansSseAt(emb, 0)
      val sse3 = graft.queries.TrainingQueries.kmeansSseAt(emb, 3)
      println(f"s05: sse0=$sse0%.2f sse3=$sse3%.2f ratio=${sse3 / sse0}%.4f")
      val e0 = graft.queries.TrainingQueries.pqReconErrAt(emb, 0)
      val e2 = graft.queries.TrainingQueries.pqReconErrAt(emb, 2)
      println(f"s07: err0=$e0%.2f err2=$e2%.2f ratio=${e2 / e0}%.4f")

      // d03: exact pairs vs recall-hardened 32x2 LSH pairs
      val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.5).select("a_id", "b_id")
      val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3,
        k = 64, bands = 32, threshold = 0.5).select("a_id", "b_id")
      val nE = exact.count(); val nL = lsh.count()
      val nH = exact.join(lsh, Seq("a_id", "b_id")).count()
      println(s"d03: n_exact=$nE n_lsh=$nL n_hit=$nH")

      // d04: portable simhash pairs + overlap with exact jaccard pairs
      val sp = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3,
        tokenHash = Dedup.portableTokenHash)
      val nS = sp.count()
      val nSE = sp.join(exact, Seq("a_id", "b_id")).count()
      println(s"d04: n_simhash=$nS overlap_exact=$nSE")
      spark.catalog.clearCache()

      // portable LSH / IVF top-k row counts
      val pl = Ann.portableLshTopK(emb, queries, "vec_id", "embedding",
        dim = 64, nBits = 8, k = 5)
      println(s"s03p: rows=${pl.count()}")
      val pi = Ann.portableIvfExactTopK(emb, queries, "vec_id", "embedding",
        dim = 64, cells = 8, iters = 2, topK = 3)
      println(s"s04p: rows=${pi.count()}")
    }
    spark.stop()
  }
}
