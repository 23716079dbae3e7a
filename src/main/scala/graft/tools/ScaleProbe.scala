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
      time(s"$tag chunkSliding 32/24") {
        Selection.chunkSliding(docs, "doc_id", "text", 32, 24).count()
      }
      time(s"$tag semanticDedup lsh6 0.4") {
        val withB = emb.select(col("vec_id"), col("embedding"),
          Ann.portableLshBucket(col("embedding"), nBits = 6, dim = 64)
            .as("bucket"))
        graft.dedup.Dedup.semanticDedup(withB, "vec_id", "embedding",
          "bucket", 0.4).count()
      }
      // LAST in the loop: containment leaks its documented tok/pairs
      // caches, and the blanket clearCache that releases them would
      // also evict the probe's replicate frames — nothing timed may
      // follow it in this iteration (clearCache sits OUTSIDE the
      // timing so the containment number stays pure)
      time(s"$tag containment >=0.8") {
        graft.dedup.Dedup.ngramContainmentPairs(
          docs, "doc_id", "text", 3, 0.8).count()
      }
      spark.catalog.clearCache()
    }

    // AQE skew-join scenario: a fact table where ONE key owns ~90% of
    // the rows, shuffle-joined (broadcast disabled) against its dimension.
    // Plain Spark would put the hot key's whole partition on one task;
    // AQE's skew-join splits it at runtime (OptimizeSkewedJoin) — the
    // plan prints the skew marker and wall time stays near the
    // balanced join's. The salted join is the manual equivalent for
    // engines/paths where AQE can't apply.
    {
      val ev = Tables.events(spark, sfDir)
      val skewed = ev.withColumn("user_id",
          when(col("event_id") % 10 < 9, lit(7L)).otherwise(col("user_id")))
        .repartition(spark.sparkContext.defaultParallelism).cache()
      skewed.count()
      // dimension must reach the join through a PLAIN ensure-requirements
      // shuffle: a distinct()/aggregate on the join key would sit between
      // the shuffle stage and the join and OptimizeSkewedJoin's pattern
      // (Sort directly over the shuffle stage) would never match
      val dim = Tables.customer(spark, sfDir)
        .select(col("c_custkey").as("user_id"),
          (col("c_custkey") % 5).as("tier"))
      // fixture-scale knobs: the hot key is ~MBs here, not the 256 MB
      // production default — scale the skew thresholds down in the same
      // ratio so the probe exercises the REAL mechanism (at cluster
      // scale the defaults fire for genuinely large partitions)
      val tuned = Seq(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2")
      val prev = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
      tuned.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        // aggregate over props so the fact payload actually rides the
        // shuffle — with only the 8-byte key, column pruning + lz4
        // would compress the hot partition below any skew threshold
        val joined = skewed.join(dim, Seq("user_id"))
          .groupBy("tier").agg(count(lit(1)).as("n"),
            sum(length(col("props"))).as("payload"))
        // collect() (not count()) so the inspected QueryExecution is the
        // one that ran — count() wraps the frame in its own new plan
        time("skewed shuffle join (AQE)") { joined.collect().length.toLong }
        val marker = joined.queryExecution.executedPlan.toString
        println(s"[probe] AQE skew split applied: ${marker.contains("skew=true")}")
        marker.linesIterator.filter(l => l.contains("Join") || l.contains("skew"))
          .foreach(l => println(s"[probe]   ${l.trim.take(110)}"))
        time("salted join (manual)") {
          // identical aggregate to the AQE branch — without the props
          // payload the salted shuffle would carry only 8-byte keys and
          // the two timings would measure different workloads
          graft.operators.Scale.saltedJoin(skewed, dim, "user_id", 16)
            .groupBy("tier").agg(count(lit(1)).as("n"),
              sum(length(col("props"))).as("payload"))
            .count()
        }
      } finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      skewed.unpersist()
    }
    spark.stop()
  }
}
