package graft.queries

import graft.SparkSpec
import graft.SparkEntry

/** Plan hygiene audit: no query may plan a CartesianProduct, and
  * nested-loop joins are allowed only where they are the intended
  * algorithm. This is the 100 TB guard — a plan that degenerates to
  * an unkeyed pair enumeration at sf0.001 will not survive scale-up.
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Queries whose construction executes jobs or writes (audited by
    * their own specs instead of a dry plan build). */
  private val effectful = Set("p04_snapshot_overwrite", "p05_retention",
    "p09_format_roundtrip", "p10_sync_retention", "p11_zorder_roundtrip",
    "p12_bucketed_merge", "p13_stream_delta_sync", "p15_skipping_scan",
    "q20_stream_tumbling",
    "q31_stream_interval_join", "q37_stream_dedup", "q57_stream_session",
    "q59_countmin_topk", "q63_stream_sketch", "d06_dup_clusters",
    "s05_kmeans", "s07_pq_trained", "s12_ivfpq", "c10_bloom_decontaminate",
    // d17/s13 run foreachBatch ingests that write per-batch index
    // partitions (p13's physical-write discipline, DedupStream/AnnStream)
    "d17_stream_containment", "s13_stream_ivf", "s14_published_serve",
    "s15_nprobe_serve", "m13_stream_image_neardup",
    // d20/s19 drive the maintenance lifecycle (batch ingests +
    // compaction/retire/publish tree rewrites) during construction
    "d20_retire_reingest", "s19_retire_serve")

  /** Intentional nested-loop/cross plans:
    * q22 is a cross join by definition; s01 brute-force ANN scores
    * every (query, corpus) pair by design — the broadcast side is the
    * tiny query set; t10/t11 attach a ONE-ROW corpus-totals aggregate
    * via crossJoin(broadcast(...)) — a scalar join, O(1) broadcast
    * bytes regardless of corpus size (Selection.classifierWeights /
    * tfidfTopK Scaladoc); s11 composes s01's brute-force exact
    * baseline (the recall denominator is DEFINED as the exhaustive
    * scan over the broadcast query sample); c23 attaches its one-row
    * vocab-size aggregate the same way (`crossJoin(broadcast(vocab))`,
    * Selection.lmScore — a scalar join, O(1) broadcast bytes); d03's
    * recall gate composes its three ONE-ROW count aggregates the same
    * way. */
  private val nestedLoopAllowed = Set("q22_cross_join", "s01_ann_bruteforce",
    "t10_classifier", "t11_tfidf",
    "s11_ann_recall", "c23_lm_score", "d03_minhash_lsh",
    // d15 is d03's construction for the containment relation; d15b is
    // its count-form recall gate — the same three ONE-ROW count
    // aggregates via crossJoin(broadcast(...))
    "d15_containment_lsh", "d15b_containment_recall_gate",
    // q58/q61/q64/m12 attach ONE-ROW aggregates (exact counts, or the
    // one merged sketch) via crossJoin(broadcast(...)) — scalar joins,
    // O(1) broadcast bytes
    "q58_hll_shard_merge", "q61_theta_overlap", "q64_freq_topk",
    "m12_image_neardup")

  test("no query plans a CartesianProduct; nested-loop only where intended") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => effectful(name) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val cartesian = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
          !nestedLoopAllowed(name)
        if (cartesian || bnlj)
          Some(s"$name: cartesian=$cartesian nestedLoop=$bnlj")
        else None
      }
    assert(offenders.isEmpty, s"\nplan red flags:\n${offenders.mkString("\n")}")
  }

  /** Conscious unpartitioned windows — every entry must be a window
    * over AGGREGATE metadata (bounded rows), never row data:
    * c04's shard-offset prefix sum runs over per-shard token totals
    * (≤ max_id/shardSize rows — thousands at 100 TB; see
    * Selection.packSequences Scaladoc); c16's file-base prefix sum
    * runs over per-FILE row counts (#files rows — the groupBy
    * aggregate collapses row data before the window). The other
    * documented bounded site, Sinks.withSurrogateKey's OPT-IN
    * contiguous mode (Sinks.scala), is API-only — no query plans it,
    * so it needs no entry here. */
  private val globalWindowAllowed = Set("c04_pack_sequences",
    "c16_sorted_export")

  /** Queries the window audit genuinely cannot dry-plan: physical
    * writes and streaming queries (their plans are audited by their
    * own specs/probes). Batch-effectful queries whose CONSTRUCTION
    * merely runs jobs (trainers, bloom builds, gates) ARE audited —
    * their logical plans must obey the same no-global-window
    * invariant as everything else. */
  private val unplannable = Set("p04_snapshot_overwrite", "p05_retention",
    "p09_format_roundtrip", "p10_sync_retention", "p11_zorder_roundtrip",
    "p12_bucketed_merge", "p13_stream_delta_sync", "p15_skipping_scan",
    "q20_stream_tumbling",
    "q31_stream_interval_join", "q37_stream_dedup", "q57_stream_session",
    "q63_stream_sketch")

  test("no query plans a window with an empty partition spec over row data") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) =>
        unplannable(name) || globalWindowAllowed(name) }
      .flatMap { case (name, fn) =>
        val global = fn(spark, sf).queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
        }
        if (global.nonEmpty) Some(s"$name: ${global.size} global window(s)")
        else None
      }
    assert(offenders.isEmpty,
      s"\nsingle-partition window bottlenecks (fix with " +
        s"Selection.distributedNtile or a partition key):\n" +
        offenders.mkString("\n"))
  }

  /** Scan-dominated queries whose per-row work must stay inside
    * whole-stage codegen ("*(n)" stages) — a fallen-out-of-codegen
    * expression here multiplies per-row cost at 100 TB. */
  private val codegenExpected = Seq("q01_filter_project", "q13_scalar_battery",
    "q25_string_battery", "t01_lang_id", "t02_quality", "t03_fingerprint",
    "t05_clean", "t06_repetition", "t07_redact_pii", "t09_normalize")

  test("scan-heavy queries run inside whole-stage codegen") {
    val offenders = codegenExpected.filter { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect() // AQE shows final stages (incl. "*(n)") post-execution
      !df.queryExecution.executedPlan.toString.contains("*(")
    }
    assert(offenders.isEmpty, s"no WholeStageCodegen span in: $offenders")
  }

  /** Spark 4's InferWindowGroupLimit plans `row_number() <= k` filters
    * as a bounded-heap WindowGroupLimit with a PARTIAL stage before the
    * exchange — the shuffle carries at most k rows per group per map
    * task instead of whole groups. That built-in IS the 100 TB top-k
    * plan (no custom aggregate needed); this pin catches any refactor
    * that breaks the rewrite's pattern (e.g. wrapping the rank filter
    * so the rule no longer matches). */
  test("q08 window top-k keeps its map-side WindowGroupLimit(Partial)") {
    val plan = SparkEntry.queries("q08_window_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"expected partial window-group-limit before the exchange:\n$plan")
  }

  /** The round-9 portable ANN gates must keep the serving-path plan
    * shape: the corpus side never shuffles before ranking — candidates
    * come from a BROADCAST hash join on the bucket/cell key, and the
    * top-k filter plans the map-side WindowGroupLimit (so the exchange
    * carries ≤ k rows per query per map task, not whole buckets). */
  test("portable ANN gates: broadcast candidate join + map-side window group limit") {
    Seq("s03_ann_lsh", "s04_ann_ivf_trained").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$name: candidate join must broadcast the query side:\n$plan")
      assert(plan.contains("WindowGroupLimit"),
        s"$name: rank filter must plan a WindowGroupLimit:\n$plan")
    }
  }

  test("q12 set ops shares its distinct sides via ReusedExchange, not cache") {
    spark.catalog.clearCache() // drop registrations from earlier plan builds
    val df = CapabilityQueries.q12SetOps(spark, sf)
    df.collect() // AQE finalizes the plan (and reuse decisions) on execution
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedSubquery"),
      s"expected exchange reuse across set-op branches:\n$plan")
    assert(spark.sharedState.cacheManager.isEmpty,
      "q12 must not leave pinned storage behind")
  }

  /** Operators whose Scaladoc documents a deliberate caching contract
    * (Dedup pair producers and the pretraining pipeline: shingle/
    * signature/prep intermediates feed several non-identical plan
    * branches; callers clearCache between corpora). Everything else
    * must leave the cache manager empty. */
  private val documentedCaching = Set("d02_ngram_jaccard", "d03_minhash_lsh",
    "d04_simhash", "d07_lsh_vs_exact", "d09_incremental_dedup",
    "d13_containment", "d15_containment_lsh",
    // d15b embeds BOTH the exact and LSH constructions (the recall
    // gate), so it inherits both sides' documented caching
    "d15b_containment_recall_gate", "d16_incremental_containment",
    "c13_pretrain_pipeline", "c14_funnel_report",
    // c24 composes c13's cached prep/dedup frames + LSH's cached
    // signature frame (same contract, one clearCache per corpus)
    "c24_corpus_build",
    // m12 caches its aHash signature frame for the chunk self-join
    // (the simhashPairs contract applied to images)
    "m12_image_neardup",
    // distributedNtile pins its range layout (offsets must describe the
    // exact partitioning the output pass reads — Selection Scaladoc)
    "c15_curriculum", "q55_quantile_buckets")

  /** Storage-audit scope: `effectful` exempts queries from the DRY
    * plan builds above (their construction executes jobs/writes), but
    * the streamed ingests MUST pass the pinned-storage audit — a
    * per-micro-batch ingest that leaks even one cached plan per batch
    * accumulates O(batches × index) pinned storage at a real cadence.
    * Every DedupStream ingest (d17/d18/m13) and the whole AnnStream
    * lifecycle (s13–s15 here; s16–s18 were never exempt) are
    * therefore audited: their construction runs the full ingest at
    * sf0.001, then every cache the batches took must be released. */
  private val storageExempt =
    effectful -- Set("d17_stream_containment", "d18_stream_dedup",
      "m13_stream_image_neardup",
      "s13_stream_ivf", "s14_published_serve", "s15_nprobe_serve",
      // the retire/re-ingest lifecycles are held to the same rule:
      // every cache the batches, retires and publishes take must be
      // released (retireIds pins only its caller-owned id frame, and
      // releases it in a finally)
      "d20_retire_reingest", "s19_retire_serve")

  test("no library query pins storage after materialization") {
    spark.catalog.clearCache() // drop registrations from earlier plan builds
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) =>
        storageExempt(name) || documentedCaching(name) }
      .foreach { case (name, fn) =>
        fn(spark, sf).limit(1).collect()
        assert(spark.sharedState.cacheManager.isEmpty,
          s"$name left cached plans pinned")
        spark.catalog.clearCache()
      }
  }
}
