package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}
import graft.corpus.Selection
import graft.similarity.Ann

/** Ad-hoc scale probe: replicate documents/embeddings N× (ids offset
  * per copy, so duplication across copies is real) and time the
  * corpus-selection operators at 1× and N×. A linear-shape operator
  * should scale ≈ N×; anything super-linear here will not survive
  * 100 TB. Usage: `runMain graft.tools.ScaleProbe <sfDir> <factor>`.
  */
object ScaleProbe {

  private def replicate(df: DataFrame, idCol: String, n: Int): DataFrame = {
    val step = 10_000_000L
    df.withColumn("__copy", explode(sequence(lit(0), lit(n - 1))))
      .withColumn(idCol, col(idCol) + col("__copy").cast("long") * step)
      .drop("__copy")
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
  }

  private def time(name: String)(body: => Long): Unit = {
    val t0 = System.nanoTime()
    val rows = body
    println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($rows rows)")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark: SparkSession = GraftSession.local()
    val docs1 = Tables.documents(spark, sfDir)
    val emb1 = Tables.embeddings(spark, sfDir)

    for ((tag, docs, emb) <- Seq(
        ("1x", docs1, emb1),
        (s"${factor}x", replicate(docs1, "doc_id", factor).cache(),
          replicate(emb1, "vec_id", factor).cache()))) {
      docs.count(); emb.count() // materialize the cache outside timings
      time(s"$tag assignSplits") {
        Selection.assignSplits(docs, "doc_id").count()
      }
      time(s"$tag stratifiedSample") {
        Selection.stratifiedSample(docs, "doc_id", "source",
          Map("src0" -> 50), 10).count()
      }
      time(s"$tag packSequences") {
        Selection.packSequences(docs, "doc_id", "text", 128, 100L).count()
      }
      time(s"$tag mixtureResample") {
        Selection.mixtureResample(docs, "doc_id", "source",
          Map("src0" -> 2.5, "src1" -> 0.4)).count()
      }
      time(s"$tag contaminationReport") {
        Selection.contaminationReport(
          docs.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0),
          "doc_id", "text", 3).count()
      }
      time(s"$tag clusterQuotaSample") {
        Selection.clusterQuotaSample(emb, "vec_id", "label", 10).count()
      }
      time(s"$tag vocabTopK") {
        Selection.vocabTopK(docs, "text", 20).count()
      }
      time(s"$tag kmeansAssign k=8 it=3") {
        Ann.kmeansAssign(emb, "vec_id", "embedding", 8, 3).count()
      }
      docs.unpersist(); emb.unpersist()
    }
    spark.stop()
  }
}
