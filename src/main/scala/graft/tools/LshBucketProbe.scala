package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe for d03's scale posture (round-5 advice: the 7.8×
  * wall factor at 10× needed a named cause): the LSH band-bucket SIZE
  * DISTRIBUTION at 1× vs 10×, plus wall time capped vs uncapped.
  *
  * What to look for: the candidate self-join emits Σ b² pairs over
  * bucket sizes b. If the 10× corpus multiplies bucket COUNT while
  * bucket sizes stay flat, Σ b² grows ~10× — candidate generation is
  * linear in true duplicates and the wall factor is CPU, not blow-up.
  * If instead max/p99 bucket size grows with the corpus (mass
  * boilerplate), Σ b² goes quadratic — the input shape
  * `maxBucketSize` exists to bound.
  *
  * Run AFTER Scale10Probe has built /tmp/graft_scale10 (or pass both
  * dirs). Results land in one [lshprobe] JSON line per corpus.
  */
object LshBucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val x10 = args.lift(1).getOrElse("/tmp/graft_scale10")
    val bands = 16; val k = 64; val rows = k / bands

    // build the 10x documents table if absent — Scale10Probe's recipe
    // (copy-shifted ids, copy-seeded token permutation: same multiset,
    // new word order, so no cross-copy near-dup cliques)
    if (!new java.io.File(s"$x10/documents.parquet").exists()) {
      println(s"[lshprobe] building 10x documents at $x10 ...")
      val src = spark.read.parquet(s"$base/documents.parquet")
      val permuted = expr(
        """array_join(transform(array_sort(transform(split(text, ' '),
          |  (t, i) -> named_struct(
          |    'h', md5(concat(t, '#', CAST(i AS STRING), '#', CAST(_k AS STRING))),
          |    't', t))), s -> s.t), ' ')""".stripMargin)
      (0 until 10).map { ki =>
        val kc = lit(ki)
        src.withColumn("_k", kc)
          .select((col("doc_id") + kc * 100000000L).as("doc_id"),
            when(kc === 0, col("text")).otherwise(permuted).as("text"),
            col("lang"), col("source"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$x10/documents.parquet")
    }

    for ((tag, dir) <- Seq(("1x", base), ("10x", x10))) {
      if (!new java.io.File(s"$dir/documents.parquet").exists()) {
        println(s"[lshprobe] $tag: $dir missing, skipped")
      } else {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val idx = graft.dedup.Dedup.minhashIndex(docs, "doc_id", "text")
        // the production banding, not a re-derivation — measurements
        // here are of exactly the join minhashLshPairs runs
        val banded = graft.dedup.Dedup.bandedOf(idx, "doc_id", bands, rows)
        val sizes = banded.groupBy("band", "bhash")
          .agg(count(lit(1)).as("b")).select("b").cache()
        val stats = sizes.agg(
            count(lit(1)).as("n_buckets"),
            max(col("b")).as("max_b"),
            expr("percentile(b, 0.999)").as("p999_b"),
            sum(col("b") * (col("b") - 1) / 2).as("cand_pairs"))
          .collect().head
        def timeIt(f: => Long): (Long, Double) = {
          val t0 = System.nanoTime()
          val n = f
          (n, (System.nanoTime() - t0) / 1e9)
        }
        val (nUncap, tUncap) = timeIt(
          graft.dedup.Dedup.minhashLshPairs(docs, "doc_id", "text").count())
        spark.catalog.clearCache()
        val (nCap, tCap) = timeIt(
          graft.dedup.Dedup.minhashLshPairs(docs, "doc_id", "text",
            maxBucketSize = Some(1000)).count())
        spark.catalog.clearCache()
        println(s"""[lshprobe] {"corpus":"$tag","n_buckets":${stats.getLong(0)},""" +
          s""""max_bucket":${stats.getLong(1)},"p999_bucket":${stats.getDouble(2)},""" +
          s""""cand_pairs":${stats.getAs[Number](3).longValue},""" +
          s""""pairs_uncapped":$nUncap,"sec_uncapped":${f"$tUncap%.2f"},""" +
          s""""pairs_cap1000":$nCap,"sec_cap1000":${f"$tCap%.2f"}}""")
        sizes.unpersist()
      }
    }
    spark.stop()
  }
}
