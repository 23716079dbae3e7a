package graft.tools
import org.apache.spark.sql.functions._
object DfDiag {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.documents(spark, "/tmp/graft_scale10")
    for (cap <- Seq(50, 100, 300, 1000)) {
      val n = graft.dedup.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        threshold = 0.5, maxDocFreq = Some(cap)).count()
      println(s"[dfdiag] cap=$cap pairs=$n")
      spark.catalog.clearCache()
    }
    // df distribution of shingles
    val sh = graft.dedup.Dedup.withShingles(docs, "doc_id", "text", 3)
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .groupBy("s").agg(countDistinct("doc_id").as("df"))
    sh.agg(max("df"), expr("percentile_approx(df, array(0.5, 0.9, 0.99, 0.999))")).show(false)
    spark.stop()
  }
}
