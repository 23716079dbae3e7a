package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.similarity.Ann

/** Dev probe: where does s07_pq_trained spend its time — codebook
  * training (2 Lloyd's iterations), corpus encode, or the ADC ranking?
  * Distinguishes driver-side plan work (wide literal trees) from
  * execution. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    for (round <- 1 to 2) {
      val emb = Tables.embeddings(spark, d)
      var t0 = System.nanoTime()
      val cb = Ann.pqTrainCodebooks(emb, "vec_id", "embedding",
        dim = 64, m = 8, k = 16, iters = 2)
      val tTrain = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val encoded = emb.select(col("vec_id"),
        Ann.pqEncode(col("embedding"), 64, cb).as("codes"))
      val nEnc = encoded.count()
      val tEncode = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val top = Ann.pqTopK(emb, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", 64, cb, k = 5)
      val tPlan = (System.nanoTime() - t0) / 1e9
      val n = top.count()
      val tRank = (System.nanoTime() - t0) / 1e9
      println(f"[pq] round=$round train=$tTrain%.2f encode($nEnc)=$tEncode%.2f " +
        f"rankPlanBuild=$tPlan%.2f rankTotal($n)=$tRank%.2f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
