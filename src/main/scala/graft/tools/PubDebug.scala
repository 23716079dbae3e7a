package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: stage-by-stage breakdown of publishIndexDelta cost at a
  * replicated scale. Not part of the committed evidence set. */
object PubDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val src = args.headOption.getOrElse("/tmp/graft_scale10")
    val pubScale = args.lift(1).map(_.toInt).getOrElse(100)
    val vecs = graft.core.Tables.embeddings(spark, src)
      .select("vec_id", "embedding")
    val base = java.nio.file.Files.createTempDirectory("pubdbg")
    val idx = base.resolve("idx").toString
    val cen = base.resolve("cen").toString
    val pub = base.resolve("pub").toString
    val bigVecs = (0 until pubScale)
      .map(c => vecs.select((col("vec_id") + lit(c * 10000000000L)).as("vec_id"),
        col("embedding")))
      .reduce(_ unionByName _)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pub] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    t("ingest batch0 (untimed rel)") {
      graft.streaming.AnnStream.processIvfBatch(bigVecs, 0L, idx, cen,
        "vec_id", "embedding", dim = 64, cells = 8, iters = 2)
    }
    spark.catalog.clearCache()
    t("publish full") {
      graft.streaming.AnnStream.publishIndex(spark, idx, pub)
    }
    val oneCell = spark.read.parquet(idx)
      .select(col("vec_id"), col("cell").cast("long").as("cell"))
      .filter(col("cell") === 0L).limit(50).select("vec_id")
    val localized = bigVecs.join(oneCell, "vec_id")
      .select((col("vec_id") + 7000000000000L).as("vec_id"), col("embedding"))
    t("ingest delta batch1") {
      graft.streaming.AnnStream.processIvfBatch(localized, 1L, idx, cen,
        "vec_id", "embedding", dim = 64, cells = 8, iters = 2)
    }
    spark.catalog.clearCache()
    // manual stage replay of publishIndexDelta
    val raw = spark.read.parquet(idx)
    val delta = t("delta read+cache+affected") {
      val d = raw.filter(col("batch_id") > 0L).drop("batch_id").cache()
      val aff = d.select(col("cell").cast("long")).distinct().collect()
      println("  affected=" + aff.mkString(","))
      d
    }
    t("maxB over raw") {
      raw.agg(max(col("batch_id")).cast("long")).collect()
    }
    val merged = t("existing read + merge plan") {
      spark.read.parquet(pub).filter(col("cell").isin(0L))
        .join(delta.select(col("vec_id")), Seq("vec_id"), "left_anti")
        .unionByName(delta)
    }
    t("merged write") {
      merged.repartition(col("cell")).write.mode("overwrite")
        .partitionBy("cell").parquet(pub + "_dbgnext")
    }
    t("delta publish (real, end-to-end)") {
      graft.streaming.AnnStream.publishIndexDelta(spark, idx, pub)
    }
    spark.stop()
    graft.core.TempDirs.deleteRecursively(base.toFile)
  }
}
