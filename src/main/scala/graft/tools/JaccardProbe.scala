package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.dedup.Dedup

/** Probe: plain inverted-index exact Jaccard vs prefix-filtered exact
  * Jaccard (identical answers) under duplication — the regime where
  * the plain join degrades quadratically. Usage:
  * `runMain graft.tools.JaccardProbe <sfDir> <factor>`. */
object JaccardProbe {
  private def replicate(df: DataFrame, n: Int): DataFrame = {
    val step = 10_000_000L
    df.withColumn("__copy", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("doc_id", col("doc_id") + col("__copy").cast("long") * step)
      .drop("__copy")
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val base = Tables.documents(spark, d)
    for ((tag, docs) <- Seq(("1x", base),
        (s"${factor}x", replicate(base, factor)))) {
      for ((name, fn) <- Seq[(String, DataFrame => DataFrame)](
          ("plain", Dedup.ngramJaccardPairs(_, "doc_id", "text", 3, 0.5)),
          ("prefix", Dedup.ngramJaccardPairsPrefix(_, "doc_id", "text", 3, 0.5)))) {
        // equal input warmth for every measurement: drop the previous
        // op's internal caches, then re-pin THIS op's input before the
        // timer starts (clearCache alone would leave the first op warm
        // and the second cold)
        spark.catalog.clearCache()
        docs.cache().count()
        val t0 = System.nanoTime()
        val n = fn(docs).count()
        println(f"[jp] $tag $name pairs=$n time=${(System.nanoTime() - t0) / 1e9}%.1fs")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
