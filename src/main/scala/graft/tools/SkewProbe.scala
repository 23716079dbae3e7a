package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hot-shingle / hot-bucket skew evidence: the one input shape whose
  * candidate space grows quadratically regardless of corpus size is
  * MASS-DUPLICATED BOILERPLATE — one text repeated across thousands of
  * documents puts them all in the same shingle postings and the same
  * LSH band buckets, and the self-join pays Σ df² / Σ b² over exactly
  * those hot lists. This probe manufactures that corpus (10% of sf0.1
  * docs replaced by ONE fixed boilerplate paragraph), then times the
  * exact inverted-index path and the LSH path with their guards OFF
  * and ON (`maxDocFreq` / `maxBucketSize`), against the clean corpus
  * as the baseline.
  *
  * Expected shape (the claim the artifact pins): guards OFF, the
  * boilerplate corpus costs multiples of the clean one (the hot lists
  * dominate); guards ON, wall stays ~flat vs clean, because the
  * capped paths drop exactly the signal-free hot lists. Prints one
  * JSON line.
  * Usage: runMain graft.tools.SkewProbe [sfDir] [outDir]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    // default out dir encodes the SOURCE: a cached skew corpus built
    // from one sfDir must never be silently reused for another (the
    // Scale10Probe suffix discipline)
    val out = args.lift(1).getOrElse(
      s"/tmp/graft_skew_${new java.io.File(src).getName}")

    // 10% of documents become ONE identical boilerplate paragraph —
    // the mass-dup clique (exact dedup would remove it, but span/LSH
    // stages meet it when exact dedup is not first, and real corpora
    // interleave)
    val boiler = (1 to 60).map(i => s"boilerplate$i").mkString(" ")
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$out/documents.parquet"))) {
      graft.core.Tables.documents(spark, src)
        .withColumn("text",
          when(col("doc_id") % 10 === 0, lit(boiler)).otherwise(col("text")))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
    }

    def docs(dir: String) = graft.core.Tables.documents(spark, dir)
    def time(label: String)(f: => Long): (String, Double, Long) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[skew] $label%-34s $dt%7.2f s   ($n rows)")
      (label, dt, n)
    }

    import graft.dedup.Dedup
    def jacc(dir: String, cap: Option[Int]) =
      Dedup.ngramJaccardPairs(docs(dir), "doc_id", "text",
        threshold = 0.5, maxDocFreq = cap).count()
    def lsh(dir: String, cap: Option[Int]) =
      Dedup.minhashLshPairs(docs(dir), "doc_id", "text",
        threshold = 0.5, maxBucketSize = cap).count()
    // round 10: the containment LSH path (d15's operator) shares the
    // banding + dropHotBuckets machinery — same clique exposure, same
    // guard; these cells pin that the guard holds for it too
    def containLsh(dir: String, cap: Option[Int]) =
      Dedup.minhashContainmentPairs(docs(dir), "doc_id", "text",
        threshold = 0.8, maxBucketSize = cap).count()

    // warm-up
    try { jacc("/root/testdata/sf0.001", None); lsh("/root/testdata/sf0.001", None) }
    catch { case _: Throwable => () }

    // round-11 image cells: the mass-duplicate IMAGE clique (every
    // doc_id % 10 == 0 image replaced by ONE byte-identical image —
    // re-hosted thumbnails / default avatars). Identical signatures
    // meet in EVERY chunk bucket of the hamming join; maxBucketSize
    // drops those hot (chunk, value) buckets before the self-join.
    // The hash stage (codec -> resize -> threshold) is included in
    // every cell, as the text cells include shingling.
    import graft.multimodal.Multimodal
    def imgPairs(clique: Boolean, cap: Option[Int]): Long = {
      val media = if (clique) Multimodal.pngWithClique(spark, src)
        else Multimodal.pngFromDocuments(spark, src)
      val sigs = Multimodal.imageAHash(media)
        .select(col("media_id"),
          col("ahash_lo").bitwiseOR(shiftleft(col("ahash_hi"), 32)).as("sig"))
        .cache()
      try Dedup.hammingPairsFromSignatures(sigs, "media_id", "sig",
        maxHamming = 16, maxBucketSize = cap).count()
      finally sigs.unpersist()
    }

    // cap=500: above the background shingle df (148 at 10x — DfDiag),
    // below the planted clique's df (5000): drops ONLY the boilerplate
    val cells = Seq(
      time("jaccard_clean_uncapped")(jacc(src, None)),
      time("jaccard_skew_uncapped")(jacc(out, None)),
      time("jaccard_clean_df500")(jacc(src, Some(500))),
      time("jaccard_skew_df500")(jacc(out, Some(500))),
      time("lsh_clean_uncapped")(lsh(src, None)),
      time("lsh_skew_uncapped")(lsh(out, None)),
      time("lsh_clean_bucket32")(lsh(src, Some(32))),
      time("lsh_skew_bucket32")(lsh(out, Some(32))),
      time("contain_lsh_clean_uncapped")(containLsh(src, None)),
      time("contain_lsh_skew_uncapped")(containLsh(out, None)),
      time("contain_lsh_clean_bucket32")(containLsh(src, Some(32))),
      time("contain_lsh_skew_bucket32")(containLsh(out, Some(32))),
      time("img_clean_uncapped")(imgPairs(clique = false, None)),
      time("img_clique_uncapped")(imgPairs(clique = true, None)),
      time("img_clean_bucket256")(imgPairs(clique = false, Some(256))),
      time("img_clique_bucket256")(imgPairs(clique = true, Some(256))))

    val json = cells.map { case (l, t, n) =>
      f""""$l":{"sec":$t%.2f,"rows":$n}"""
    }.mkString("""{"metric":"skew_guards","boiler_docs_pct":10,"cells":{""",
      ",", "}}")
    println(json)
    spark.stop()
  }
}
