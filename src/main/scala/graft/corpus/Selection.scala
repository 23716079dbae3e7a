package graft.corpus

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.dedup.Dedup
import graft.functions.TextOps

/** Corpus-selection operators for large-scale training-data pipelines:
  * deterministic split assignment, stratified sampling, benchmark
  * decontamination, sequence packing, and domain-mixture resampling.
  *
  * These are the selection/layout stages that sit between the cleaning
  * + dedup stages ([[graft.functions.TextOps]], [[graft.dedup.Dedup]])
  * and the trainer: which documents go to which split, how domains are
  * re-weighted, and how documents are packed into fixed-token training
  * sequences.
  *
  * Determinism contract: nothing here uses `rand()` or Spark-internal
  * hashes. Sampling decisions derive from the first 8 hex chars of
  * `md5(salt:key)` — bit-identical in every engine and stable across
  * retries, so a re-run of a failed stage selects the SAME rows (a
  * nondeterministic sample would silently corrupt downstream incremental
  * state on task retry) and the DuckDB oracle can reproduce every
  * decision exactly.
  *
  * Scale posture (100 TB): every operator is a narrow map over the scan
  * or a shuffle-on-key join; the only window without a partition key
  * runs over per-shard aggregates (thousands of rows), never over row
  * data — see [[packSequences]].
  */
object Selection {

  /** Full 32-bit deterministic hash value: the first 8 hex chars of
    * md5(key) parsed as an integer. Engine-portable (md5 is
    * bit-identical everywhere), a pure Column expression — evaluates
    * inside the scan's codegen span, no shuffle, no UDF. The single
    * source of truth for every sampling decision in this module. */
  def hashValue(key: Column): Column =
    conv(substring(md5(key), 1, 8), 16, 10).cast(LongType)

  /** Uniform deterministic bucket in [0, nBuckets): [[hashValue]]
    * mod nBuckets. */
  def hashBucket(key: Column, nBuckets: Int): Column =
    hashValue(key) % nBuckets

  /** Salted hash key: `salt:id`. The salt decouples independent
    * sampling decisions on the same ids (split vs sample vs mixture
    * gates must not correlate). */
  def saltedKey(id: Column, salt: String): Column =
    concat(lit(salt), lit(":"), id.cast(StringType))

  /** Deterministic train/val/test assignment by id hash: bucket 0–99,
    * `< trainPct` → train, `< trainPct+valPct` → val, rest → test.
    * Membership is a pure function of (salt, id) — stable as the corpus
    * grows (new docs never move old docs between splits, unlike
    * `randomSplit`), reproducible on retry, joinable from any table
    * that carries the id. */
  def assignSplits(docs: DataFrame, idCol: String, trainPct: Int = 80,
      valPct: Int = 10, salt: String = "graft"): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val b = hashBucket(saltedKey(col(idCol), salt), 100)
    docs.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Stratified downsample: per-stratum keep-percentage (0–100), with
    * a default for unlisted strata. The keep decision is the same
    * salted-hash gate as [[assignSplits]], so a document kept at 50%
    * is also kept at any higher rate (nested samples — rate changes
    * only add/remove the marginal rows, they don't reshuffle the
    * sample). One scan, no shuffle. */
  def stratifiedSample(docs: DataFrame, idCol: String, stratumCol: String,
      pctByStratum: Map[String, Int], defaultPct: Int = 100,
      salt: String = "sample"): DataFrame = {
    val pct = pctByStratum.foldLeft(lit(defaultPct)) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    docs.filter(hashBucket(saltedKey(col(idCol), salt), 100) < pct)
  }

  /** Benchmark decontamination report: training documents that share at
    * least one word n-gram with the evaluation corpus, with the count
    * of distinct shared n-grams. Standard pre-training hygiene — an
    * eval document whose n-grams appear verbatim in training data
    * invalidates the benchmark.
    *
    * Shape at 100 TB: the eval corpus (benchmarks) is tiny relative to
    * training data, so its distinct-shingle set is broadcast — under
    * the same estimated-size guard as [[fuzzyContaminationReport]]
    * (one side-sized job; past `maxBroadcastBytes` the join shuffles
    * on the shingle instead) — and the train side never shuffles
    * while the broadcast is healthy. Set `broadcastEval = false` to
    * force the shuffle join; [[bloomDecontaminate]] is the third
    * posture (fixed-size filter regardless of eval volume). */
  def contaminationReport(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 3,
      broadcastEval: Boolean = true,
      maxBroadcastBytes: Long = MaxEvalBroadcastBytes,
      evalSizeBytes: Option[Long] = None): DataFrame = {
    val trainSh = Dedup.withShingles(train, idCol, textCol, n)
      .select(col(idCol), explode(col("sh")).as("s"))
    val evalSh0 = Dedup.withShingles(eval, idCol, textCol, n)
      .select(explode(col("sh")).as("s")).distinct()
    val evalSh =
      if (!broadcastEval) evalSh0
      else broadcastIfFits(evalSh0,
        evalSizeBytes.getOrElse(
          estimatedRowBytes(evalSh0, length(col("s")))), maxBroadcastBytes)
    trainSh.join(evalSh, "s")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared")) // shingles are distinct per doc
  }

  /** Drop contaminated training documents (anti-join against the
    * [[contaminationReport]] ids). */
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame =
    train.join(contaminationReport(train, eval, idCol, textCol, n)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** [[decontaminate]] for when the eval shingle set outgrows a plain
    * broadcast: a fixed-size Bloom filter of the eval shingles (built
    * distributed; the driver and every task hold only the filter bits,
    * sized by `expectedItems`/`fpp` regardless of corpus volume)
    * prefilters train shingles INSIDE the scan's codegen span, so only
    * the surviving fraction — true contaminations plus ≈`fpp` false
    * positives — reaches the exact semi-join. The shuffle is
    * O(contamination), not O(train shingles); at 100 TB that is the
    * difference between shuffling gigabytes and shuffling the corpus.
    *
    * The Bloom stage only PRUNES (no false negatives), and every
    * survivor is re-checked exactly, so the result is bit-identical to
    * [[decontaminate]]. Cost: two passes over the (smaller) eval side
    * — one to build the filter, one for the exact join. */
  def bloomDecontaminate(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 3,
      expectedItems: Long = 1L << 22, fpp: Double = 0.01): DataFrame = {
    import graft.functions.BloomOps
    val evalSh = Dedup.withShingles(eval, idCol, textCol, n)
      .select(explode(col("sh")).as("s")).distinct()
    val bloom = BloomOps.buildBloom(evalSh, col("s"), expectedItems, fpp)
    val candidates = Dedup.withShingles(train, idCol, textCol, n)
      .select(col(idCol), explode(col("sh")).as("s"))
      .filter(BloomOps.mightContain(bloom, col("s")))
    val contaminatedIds =
      candidates.join(evalSh, "s").select(col(idCol)).distinct()
    train.join(contaminatedIds, Seq(idCol), "left_anti")
  }

  /** Sequence packing, GPT-style concatenate-and-chunk: documents in
    * id order form one token stream cut into fixed-`budget` sequences;
    * each document gets its global `start_token` offset and the
    * `seq_id` of the training sequence its first token lands in.
    *
    * The global prefix sum is computed distributed, in two phases:
    * per-shard token totals (one hash agg), then shard offsets via a
    * window over the TINY per-shard aggregate (≤ ~max_id/shardSize
    * rows — thousands at 100 TB, so the unpartitioned window is safe),
    * broadcast-joined back, then a window PARTITIONED BY shard for the
    * within-shard running sum. Row data is never pulled to one
    * partition and nothing is collected to the driver. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      budget: Int, shardSize: Long = 1L << 20): DataFrame = {
    require(budget > 0 && shardSize > 0, "budget and shardSize must be positive")
    val toks = docs.select(col(idCol),
      TextOps.tokenCount(col(textCol)).as("n_tokens"),
      floor(col(idCol) / shardSize).as("shard"))
    val shardTotals = toks.groupBy("shard")
      .agg(sum("n_tokens").as("shard_tokens"))
    // thousands of rows max: the one place an unpartitioned window is fine
    val wOff = Window.orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = shardTotals
      .withColumn("offset", coalesce(sum("shard_tokens").over(wOff), lit(0L)))
      .select(col("shard"), col("offset"))
    val wIn = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    toks.join(broadcast(offsets), "shard")
      .withColumn("start_token",
        col("offset") + coalesce(sum("n_tokens").over(wIn), lit(0L)))
      .withColumn("seq_id", floor(col("start_token") / budget))
      .select(col(idCol), col("n_tokens"), col("start_token"), col("seq_id"))
  }

  /** Domain-mixture resampling: deterministic weighted up/down-sampling
    * to hit target domain ratios. Weight w per domain ⇒ each document
    * appears floor(w) times, plus once more for the hash-gated fraction
    * of documents selected with probability frac(w). So w=2.5 duplicates
    * every row twice and a deterministic half of rows a third time;
    * w=0.4 keeps a deterministic 40%. Emits (row, copy=1..reps) via
    * `explode(sequence)` — a narrow op; output size is exactly
    * Σ reps, no shuffle. */
  def mixtureResample(docs: DataFrame, idCol: String, domainCol: String,
      weightByDomain: Map[String, Double], defaultWeight: Double = 1.0,
      salt: String = "mix"): DataFrame = {
    require((weightByDomain.values ++ Seq(defaultWeight)).forall(_ >= 0),
      "mixture weights must be non-negative")
    val w = weightByDomain.foldLeft(lit(defaultWeight)) {
      case (acc, (k, v)) => when(col(domainCol) === k, lit(v)).otherwise(acc)
    }
    val base = floor(w).cast(IntegerType)
    // fractional gate in parts-per-million, not percent: a percent
    // grid silently zeroes sub-0.5% weights (w=0.004 must keep 0.4%
    // of a huge domain, not drop it). round() so 0.3e6 = 300000, not
    // 299999.99…; weights finer than 1e-6 quantize to the ppm grid.
    val fracPpm = round((w - floor(w)) * 1000000).cast(LongType)
    val reps = base +
      when(hashBucket(saltedKey(col(idCol), salt), 1000000) < fracPpm, 1)
        .otherwise(0)
    docs.withColumn("reps", reps)
      .filter(col("reps") > 0)
      .withColumn("copy", explode(sequence(lit(1), col("reps"))))
      .drop("reps")
  }

  /** Per-cluster quota sampling: keep at most `cap` rows per cluster,
    * chosen in deterministic salted-hash order (a stable pseudo-random
    * draw — retries and re-runs retain the identical subset). The
    * cluster-balancing pass of diversity-aware curation: caps
    * over-represented clusters so no single mode dominates the
    * training mix. One window over the cluster key — a single shuffle,
    * and with thousands+ of clusters no single task sees more than a
    * cluster's rows (cluster skew → pre-filter hot clusters or salt). */
  def clusterQuotaSample(df: DataFrame, idCol: String, clusterCol: String,
      cap: Int, salt: String = "quota"): DataFrame = {
    require(cap > 0, "cap must be positive")
    val w = Window.partitionBy(clusterCol)
      .orderBy(hashValue(saltedKey(col(idCol), salt)), col(idCol))
    df.withColumn("draw", row_number().over(w))
      .filter(col("draw") <= cap)
      .drop("draw")
  }

  /** Deterministic global shuffle + sharding — the "randomize order,
    * then shard" layout step before training. Every row gets:
    * `shard` = hash bucket (which output shard / file it belongs to)
    * and `pos` = its position within the shard in salted-hash order.
    * Both are pure functions of (salt, id): the shuffle is
    * reproducible across runs and engines (no rand(), no
    * partition-order dependence), shards are balanced by hash
    * uniformity, and a training job reading shard s in pos order sees
    * a stable pseudo-random document sequence. One shuffle on
    * `shard`; the per-shard window never sees more than ~1/nShards
    * of the data. */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
      salt: String = "shuffle"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val h = hashValue(saltedKey(col(idCol), salt))
    val w = Window.partitionBy(col("shard")).orderBy(h, col(idCol))
    df.withColumn("shard", hashBucket(saltedKey(col(idCol), salt), nShards))
      .withColumn("pos", row_number().over(w).cast(LongType))
  }

  /** Materialize [[shuffleShards]] as one parquet directory per shard
    * (`shard=<n>/`), rows within each shard sorted by `pos` — the
    * on-disk layout a data loader streams shard-by-shard. */
  /** Shared shard-writer plumbing: shuffleShards' window already
    * hash-partitioned by shard — no second exchange; just order within
    * tasks and write. Data loaders that stream fixed-size files get
    * them via maxRecordsPerFile; a loader reading a shard's files in
    * part-number order sees the pos order (each split file holds a
    * contiguous pos range). */
  private def shardWriter(df: DataFrame, idCol: String, nShards: Int,
      salt: String, maxRecordsPerFile: Option[Long])
      : org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] = {
    val w = shuffleShards(df, idCol, nShards, salt)
      .sortWithinPartitions("shard", "pos")
      .write.partitionBy("shard").mode("overwrite")
    maxRecordsPerFile.fold(w)(n => w.option("maxRecordsPerFile", n))
  }

  def writeShuffleShards(df: DataFrame, idCol: String, nShards: Int,
      path: String, salt: String = "shuffle",
      maxRecordsPerFile: Option[Long] = None): Unit =
    shardWriter(df, idCol, nShards, salt, maxRecordsPerFile).parquet(path)

  /** [[writeShuffleShards]] with JSON-lines output — the consumption
    * format most training loaders read directly (one JSON object per
    * line, one `shard=<n>/` directory per shard, lines in `pos` order
    * within each file). Null fields are WRITTEN (`"k":null`), not
    * dropped — loaders indexing a fixed key set per line depend on
    * schema-stable objects. Compression is the writer default (none)
    * so loaders can seek by line. */
  def writeJsonlShards(df: DataFrame, idCol: String, nShards: Int,
      path: String, salt: String = "shuffle",
      maxRecordsPerFile: Option[Long] = None): Unit =
    shardWriter(df, idCol, nShards, salt, maxRecordsPerFile)
      .option("ignoreNullFields", "false")
      .json(path)

  /** Globally ORDERED export: write `df` as `runs` sorted parquet
    * files whose lexicographic file-name order IS the total `orderBy`
    * order — the layout a curriculum-training loader streams start to
    * finish (cleanest documents first) without any consumer-side sort.
    *
    * The 100 TB-safe shape of a total sort: `repartitionByRange` on
    * the sort key (sampled range boundaries, one shuffle, every task
    * holds one contiguous key range) + within-partition sort, and
    * Spark's zero-padded `part-NNNNN` file indices follow range-
    * partition order — a global order with NO single-partition stage.
    * Range boundaries are sampled per execution, so FILE SIZES may
    * vary run to run, but with a total `orderBy` (include a unique
    * tiebreaker) the concatenated row sequence is deterministic —
    * c16's oracle pins exactly that. */
  def writeSortedRuns(df: DataFrame, orderBy: Seq[Column], path: String,
      runs: Int): Unit = {
    require(runs > 0, "runs must be positive")
    df.repartitionByRange(runs, orderBy: _*)
      .sortWithinPartitions(orderBy: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Distributed exact NTILE: bit-identical to
    * `ntile(buckets) OVER (PARTITION BY partitionBy ORDER BY orderBy)`
    * but with NO single-partition global sort — the 100 TB-safe form
    * of the one window shape Spark cannot scale (an empty or
    * low-cardinality partition spec funnels the whole corpus through
    * one task's sort).
    *
    * How: range-partition on (partitionBy ++ orderBy) so each task
    * holds a contiguous slice of every window partition's order; count
    * rows per (task, key); ship ONLY those counts to the driver (≤
    * numPartitions + distinct keys rows — keys occupy contiguous
    * partition ranges, so at most one key straddles each boundary;
    * pure metadata, never row data, same bounded-collect contract as
    * [[graft.dedup.Dedup]]'s edge list); cumulative-sum them into
    * per-(task, key) global-rank offsets; broadcast-join the offsets
    * back and add a per-task `row_number` — a window partitioned by
    * (task, key), so every sort is one slice, never the corpus. The
    * bucket for global rank r of n rows follows the SQL NTILE contract
    * in pure integer arithmetic (first n%buckets buckets take one
    * extra row), so results hash-match an oracle NTILE exactly.
    *
    * Two row-data shuffles total (range + window re-hash), plus one
    * metadata aggregation. The range layout is persisted
    * (MEMORY_AND_DISK) before the counts pass: Spark's range sampler
    * is seeded per RDD instantiation, so two independent executions
    * of the same repartitionByRange can draw DIFFERENT partition
    * boundaries — the offsets would then describe a layout the output
    * pass never sees. Pinning one materialization makes both passes
    * read identical partitions (and scans the input once, not twice);
    * recomputation of a lost cached partition replays the same
    * shuffle, so the boundaries stay fixed even under executor loss.
    * Caching contract (same as [[graft.dedup.Dedup]]'s pair
    * producers): the cache is left for reuse — callers clearCache
    * between corpora.
    *
    * `orderBy` must be a total order (add a unique tiebreaker) —
    * the same requirement deterministic NTILE has everywhere.
    */
  def distributedNtile(df: DataFrame, buckets: Int, partitionBy: Seq[String],
      orderBy: Seq[Column], outCol: String,
      numPartitions: Int = 0): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    require(!df.columns.exists(_.startsWith("_dn_")),
      "input must not use reserved _dn_* columns")
    require(!outCol.startsWith("_dn_"),
      "outCol must not use the reserved _dn_ prefix")
    val ranged = df
      .repartitionByRange(parts, partitionBy.map(col) ++ orderBy: _*)
      .withColumn("_dn_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keyArity = partitionBy.size
    val counts = ranged
      .groupBy(("_dn_pid" +: partitionBy).map(col): _*)
      .agg(count(lit(1)).as("_dn_cnt"))
      .collect() // metadata only: ≤ parts + distinct keys rows
    val offsetRows = counts
      .groupBy(r => (1 to keyArity).map(r.get(_)).toList)
      .valuesIterator.flatMap { group =>
        val inOrder = group.sortBy(_.getInt(0))
        val total = inOrder.map(_.getLong(keyArity + 1)).sum
        val base = total / buckets
        val rem = total % buckets
        val cut = rem * (base + 1) // ranks ≤ cut fall in the wide buckets
        var off = 0L
        inOrder.map { r =>
          val o = off; off += r.getLong(keyArity + 1)
          Row.fromSeq(r.toSeq ++ Seq(o, base, rem, cut))
        }
      }.toSeq
    val offSchema = StructType( // key fields from the plan, not hand-built
      ranged.select(("_dn_pid" +: partitionBy).map(col): _*).schema.fields.toSeq
        ++ Seq(
          StructField("_dn_cnt", LongType), StructField("_dn_off", LongType),
          StructField("_dn_base", LongType), StructField("_dn_rem", LongType),
          StructField("_dn_cut", LongType)))
    val offsets = spark.createDataFrame(
      new java.util.ArrayList[Row](offsetRows.asJava), offSchema)
    val joinKeys = "_dn_pid" +: partitionBy
    val w = Window.partitionBy(joinKeys.map(col): _*).orderBy(orderBy: _*)
    // null-safe join: a NULL partition key is a normal NTILE group
    // (groupBy above keeps it), so a plain equi-join would silently
    // drop those rows — <=> keeps the semantics of the window form
    val keyed = offsets.select(
      (col("_dn_pid").as("_dn_jpid") +:
        partitionBy.zipWithIndex.map { case (k, i) => col(k).as(s"_dn_jk$i") }) ++
        Seq(col("_dn_off"), col("_dn_base"), col("_dn_rem"), col("_dn_cut")): _*)
    val joinCond = (col("_dn_pid") <=> col("_dn_jpid")) +:
      partitionBy.zipWithIndex.map { case (k, i) => col(k) <=> col(s"_dn_jk$i") }
    // integer DIV keeps the bucket math exact at any corpus size
    // (double division would lose rank precision past 2^53); the
    // narrow-bucket branch is only reached when rank > cut, which
    // implies base ≥ 1 — GREATEST guards the lazily-dead branch anyway
    ranged.join(broadcast(keyed), joinCond.reduce(_ && _))
      .withColumn("_dn_rank", col("_dn_off") + row_number().over(w))
      .withColumn(outCol,
        when(col("_dn_rank") <= col("_dn_cut"),
          expr("(_dn_rank - 1) DIV (_dn_base + 1) + 1"))
        .otherwise(
          expr("_dn_rem + (_dn_rank - _dn_cut - 1) DIV GREATEST(_dn_base, 1) + 1"))
        .cast(LongType))
      // an existing outCol was replaced in place by withColumn above —
      // appending it again would duplicate the name
      .select(df.columns.map(col) ++
        (if (df.columns.contains(outCol)) Nil else Seq(col(outCol))): _*)
  }

  /** Curriculum phases: order the corpus by a difficulty proxy
    * (highest score = cleanest = phase 1) and cut it into `phases`
    * contiguous equal-depth blocks, ties broken by id. Phases are
    * assigned by [[distributedNtile]] — range-partition on the score,
    * per-slice ranks plus broadcast offsets — so no task ever sorts
    * more than its slice; bit-identical to the single-window
    * `ntile(phases) OVER (ORDER BY score DESC, id)` form. An existing
    * `phase` column is replaced (as withColumn documents); `score`
    * must not reference it. */
  def curriculumPhases(docs: DataFrame, idCol: String, score: Column,
      phases: Int): DataFrame = {
    require(phases > 0, "phases must be positive")
    distributedNtile(docs.drop("phase"), phases, Seq.empty,
      Seq(score.desc, col(idCol)), outCol = "phase")
  }

  /** Mean global token frequency per document — a cheap commonness /
    * quality proxy (rare-token-heavy documents are typically noisy
    * OCR or codes; overwhelmingly-common-token documents are
    * boilerplate). Two hash aggregates and one shuffle join on the
    * token; NO global vocabulary ranking (a corpus-wide rank would
    * single-partition the vocab through an unpartitioned window).
    * Sums are integer-exact; documents with no tokens emit no row. */
  def tokenFrequencyScore(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(TextOps.tokens(col(textCol))).as("w"))
    val vocab = tok.groupBy("w").agg(count(lit(1)).as("freq"))
    tok.join(vocab, "w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum("freq").as("sum_freq"))
      .select(col(idCol), col("n_tokens"), col("sum_freq"),
        (col("sum_freq").cast(DoubleType) / col("n_tokens").cast(DoubleType))
          .as("mean_freq"))
  }

  /** fastText-style supervised linear text classifier, TRAINED
    * in-engine: per-token weights learned from a boolean-labeled
    * corpus (the GPT-3/LLaMA quality-filter recipe — train a cheap
    * linear classifier to recognize a reference class, score
    * everything with it). Features are distinct unigram presence
    * (bag-of-words, binarized, like fastText's unigram bag).
    *
    * Two closed-form trainings share one counting pass:
    *  - `logOdds = true` (production): smoothed Naive-Bayes log-odds
    *    `ln((cp+1)/(Np+2)) − ln((cn+1)/(Nn+2))` as DOUBLE — the
    *    standard NB linear scorer.
    *  - `logOdds = false` (hash-portable twin): the integer class-
    *    frequency contrast `cp·Nn − cn·Np`, whose SIGN equals the
    *    sign of the unsmoothed log-odds (cp/Np ⋛ cn/Nn cross-
    *    multiplied) — integer-exact, so an external engine reproduces
    *    every weight bit-for-bit.
    *
    * Shape at 100 TB: one explode + one token hash agg (map-side
    * partial) for the counts; class totals are a 1-row broadcast.
    * The weight table is vocabulary-sized, never corpus-sized. */
  def classifierWeights(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, logOdds: Boolean = true): DataFrame = {
    val y = col(labelCol).cast(BooleanType)
    val tok = docs.select(y.as("y"),
      explode(array_distinct(TextOps.tokens(col(textCol)))).as("token"))
    val counts = tok.groupBy("token").agg(
      sum(when(col("y"), 1L).otherwise(0L)).as("cp"),
      sum(when(!col("y"), 1L).otherwise(0L)).as("cn"))
    val totals = docs.agg(
      sum(when(y, 1L).otherwise(0L)).as("np"),
      sum(when(!y, 1L).otherwise(0L)).as("nn"))
    val w =
      if (logOdds)
        log((col("cp") + 1).cast(DoubleType) / (col("np") + 2)) -
          log((col("cn") + 1).cast(DoubleType) / (col("nn") + 2))
      else col("cp") * col("nn") - col("cn") * col("np")
    counts.crossJoin(broadcast(totals))
      .select(col("token"), w.as("w"), col("cp"), col("cn"))
  }

  /** Apply [[classifierWeights]]: margin score = Σ w over the
    * document's DISTINCT tokens, `predicted` = (score > 0) as 0/1.
    * Documents with no in-vocabulary token score 0 (undecided →
    * negative). One explode + one shuffle equi-join on the token +
    * one doc hash agg — the weight table streams through the join,
    * the corpus never collects. Integer-exact when the weights are
    * the portable integer form. */
  def classifierScore(docs: DataFrame, weights: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(array_distinct(TextOps.tokens(col(textCol)))).as("token"))
    val sc = tok.join(weights.select(col("token"), col("w")), Seq("token"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feat"), sum("w").as("score"))
    val zero = lit(0).cast(sc.schema("score").dataType)
    docs.select(col(idCol)).join(sc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feat"), lit(0L)).as("n_feat"),
        coalesce(col("score"), zero).as("score"),
        (coalesce(col("score"), zero) > zero).cast(IntegerType)
          .as("predicted"))
  }

  /** Adjacent token pairs of a document as (w1, w2) structs, in
    * document order — the bigram occurrence stream for language-model
    * statistics. Shifted-slice construction (see
    * [[TextOps.shingles]]); fewer than 2 tokens ⇒ empty. */
  private def bigramPairs(text: Column): Column = {
    val w = TextOps.tokens(text)
    val emptyArr = array().cast(ArrayType(StringType))
    val shifted = when(size(w) > 1, slice(w, lit(2), size(w) - 1))
      .otherwise(emptyArr)
    filter(zip_with(w, shifted, (a, b) => struct(a.as("w1"), b.as("w2"))),
      p => p.getField("w2").isNotNull)
  }

  /** Bigram language-model quality scoring — the CCNet/KenLM recipe:
    * fit an n-gram LM on a trusted reference corpus, score every
    * document by how well the model predicts it, and filter/bucket on
    * the score (documents the reference LM finds surprising are noise
    * or off-domain; fluent in-domain text scores high).
    *
    * Training is two hash aggregations over the REFERENCE corpus only:
    * bigram counts c(w1,w2), history counts h(w1) = Σ_w c(w1,w)
    * (derived from the bigram table — vocabulary-bounded, no second
    * corpus pass), and the vocabulary size V (distinct unigrams) as a
    * 1-row broadcast. Add-one smoothing gives
    * P(w2|w1) = (c+1)/(h+V), defined for unseen bigrams and histories.
    *
    * Scoring is one explode over the corpus + two equi-joins against
    * the vocabulary-bounded model tables (AQE broadcasts them at
    * routine vocabulary sizes) + one per-document hash agg. Two score
    * models share the machinery:
    *  - `logProb = true` (production): per-bigram ln P summed and
    *    averaged — the standard per-token log-likelihood
    *    (perplexity = exp(−avg)). DOUBLE, so spec-pinned.
    *  - `logProb = false` (hash-portable twin): per-bigram integer
    *    ppm = ((c+1)·1e6) div (h+V), summed, with avg = sum div n —
    *    integer-exact in any engine, the oracle path.
    *
    * Output: (idCol, n_bigrams, score_sum, score_avg); documents with
    * fewer than 2 tokens score 0 over 0 bigrams. */
  def lmScore(docs: DataFrame, ref: DataFrame, idCol: String,
      textCol: String, logProb: Boolean = true): DataFrame = {
    val refGrams = ref.select(explode(bigramPairs(col(textCol))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bi = refGrams.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
    val hist = bi.groupBy("w1").agg(sum("c").as("h"))
    val vocab = ref
      .select(explode(array_distinct(TextOps.tokens(col(textCol))))
        .as("t"))
      .agg(count_distinct(col("t")).as("v"))
    val occ = docs
      .select(col(idCol), explode(bigramPairs(col(textCol))).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .join(bi, Seq("w1", "w2"), "left")
      .join(hist, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        coalesce(col("c"), lit(0L)).as("c"),
        coalesce(col("h"), lit(0L)).as("h"), col("v"))
    val perGram =
      if (logProb)
        log((col("c") + 1).cast(DoubleType) / (col("h") + col("v")))
      else expr("(c + 1) * 1000000 DIV (h + v)")
    val sc = occ.select(col(idCol), perGram.as("s"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum("s").as("score_sum"))
    val zero = lit(0).cast(sc.schema("score_sum").dataType)
    val avg =
      if (logProb) coalesce(col("score_sum"), zero) /
        greatest(col("n_bigrams"), lit(1L))
      else expr("coalesce(score_sum, 0) DIV greatest(n_bigrams, 1)")
    docs.select(col(idCol)).join(sc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("score_sum"), zero).as("score_sum"),
        avg.as("score_avg"))
  }

  /** TF-IDF keyword extraction: top-`k` tokens per document ranked by
    * term-frequency × inverse-document-frequency, ties broken by token
    * text. `logIdf = true` (classic): score = tf · ln(N/df) as DOUBLE.
    * `logIdf = false` (hash-portable): score = (tf · 1e6) div df —
    * integer floor division, exact in any engine; df-monotone like the
    * log form but rational, so no libm in the hash path.
    *
    * Shape at 100 TB: (doc, token) tf agg → token df agg (both
    * map-side partial) → one shuffle join on the token; the per-doc
    * top-k is `row_number ≤ k` over a PARTITION BY doc window, which
    * Spark 4 plans as a bounded-heap WindowGroupLimit with a partial
    * stage before the exchange — no whole-group sort, and the window
    * key is document-cardinality (never low-cardinality). */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
      k: Int, logIdf: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tf = docs.select(col(idCol),
        explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    // tf is distinct per (doc, token), so counting rows per token IS df.
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val score =
      if (logIdf)
        col("tf").cast(DoubleType) *
          log(col("n_docs").cast(DoubleType) / col("df"))
      else expr("tf * 1000000 DIV df")
    val ranked = tf.join(dfreq, "token").crossJoin(broadcast(nDocs))
      .select(col(idCol), col("token"), col("tf"), col("df"),
        score.as("score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("score").desc, col("token"))))
    ranked.filter(col("rank") <= k)
  }

  /** Ceiling for a forced eval-side broadcast, in estimated payload
    * bytes. Eval suites are tiny today, but they GROW — every new
    * benchmark adds shingles/embeddings, and the maxDist=1 pigeonhole
    * explodes ~2·len keys per eval shingle — and past some size a
    * forced broadcast stops being a win and becomes the failure mode:
    * the build no longer fits next to executor working memory and
    * degrades into rebuild/GC collapse. The contamination operators
    * therefore ESTIMATE the eval side with a side-sized job (the
    * train scan is never touched) and fall back to a shuffle join on
    * the blocking key past this bound — the same posture as
    * `broadcastEval = false`, chosen automatically. 256 MB:
    * comfortably under Spark's broadcast limits and a small fraction
    * of a healthy executor heap. */
  val MaxEvalBroadcastBytes: Long = 256L << 20

  /** Hint `side` for broadcast only when `estBytes` fits under
    * `maxBytes`; otherwise return it unhinted so the equi-join plans
    * a shuffle join on its key (or lets AQE pick). */
  private def broadcastIfFits(side: DataFrame, estBytes: Long,
      maxBytes: Long): DataFrame =
    if (estBytes <= maxBytes) broadcast(side) else side

  /** Estimated in-memory bytes of an eval-side frame: one O(side)
    * aggregation job — rows × fixed row overhead plus the variable
    * payload mass (characters / vector elements). Deliberately an
    * overestimate of the serialized form: the guard should trip
    * before the build does. Costs: this job runs at REPORT-
    * CONSTRUCTION time (building the DataFrame runs a small eval-side
    * job, like the trainer-style queries), and the eval lineage is
    * computed again when the join executes — 2 × O(eval) total, which
    * the eval-is-small-relative-to-train premise makes negligible;
    * cache-pinning the frame to save the second pass would violate
    * the corpus operators' no-pinned-storage contract. Callers in
    * tight loops (or building plans they may never execute) can skip
    * this job entirely by passing a precomputed `evalSizeBytes` to
    * the report constructors — the estimate is only a broadcast-guard
    * input, so any honest upper bound works. */
  private def estimatedRowBytes(df: DataFrame, payload: Column): Long = {
    val r = df.agg(count(lit(1)).as("n"),
      coalesce(sum(payload.cast(LongType)), lit(0L)).as("p")).head()
    r.getLong(0) * 64L + r.getLong(1)
  }

  /** Pigeonhole blocking keys for a levenshtein-≤1 equi-join
    * (PassJoin-style): an optimal single-edit alignment leaves a
    * common prefix and a common suffix with combined length ≥
    * Lmin = min(|a|,|b|), so with h = ⌈Lmin/2⌉, t = Lmin − h either
    * the length-h prefixes or the length-t suffixes (anchored at the
    * string ENDS, so indel shift cannot break them) are EQUAL. Each
    * side's Lmin is one of {len−1, len} (length delta ≤ 1), so each
    * string emits ≤ 4 (tag, assumedLmin, segment) keys and a true
    * match always shares at least one. Segments carry half the
    * string — candidates are near-matches, not length-twins. */
  private def editOneKeys(c: Column): Column = {
    val len = length(c)
    def pk(l: Column) = {
      val h = shiftright(l + 1, 1)
      struct(lit("P").as("tag"), l.as("l"), c.substr(lit(1), h).as("seg"))
    }
    def sk(l: Column) = {
      val h = shiftright(l + 1, 1)
      val t = l - h
      struct(lit("S").as("tag"), l.as("l"),
        c.substr(len - t + 1, t).as("seg"))
    }
    array_distinct(filter(
      array(pk(len - 1), sk(len - 1), pk(len), sk(len)),
      k => k("l") >= 1))
  }

  /** Fuzzy decontamination report: training documents containing a
    * word n-gram within levenshtein `maxDist` of ANY eval n-gram —
    * catches near-verbatim benchmark leakage (typos, punctuation
    * drift) that [[contaminationReport]]'s exact match misses.
    *
    * Blocking (eval side broadcast while its ESTIMATED size fits
    * `maxBroadcastBytes` — measured with a side-sized job, see
    * [[MaxEvalBroadcastBytes]] — so the train scan never shuffles;
    * past the bound the join falls back to a shuffle on the same
    * blocking key, identical answer, scale-safe plan):
    *  - `maxDist = 0`: plain equality join on the shingle.
    *  - `maxDist = 1` (the production case): [[editOneKeys]]
    *    prefix/suffix pigeonhole — candidates share half a shingle
    *    verbatim, so the levenshtein check runs on near-matches
    *    only, never on every length-compatible pair.
    *  - `maxDist ≥ 2`: ±maxDist length-band blocking (edit distance
    *    bounds the length delta) — correct but coarse; multi-segment
    *    pigeonholes need positional substring windows, which stop
    *    being an equi-join.
    * A candidate pair can meet on more than one pigeonhole key, so
    * matched pairs are dedup'd before counting (cost O(matches)). */
  def fuzzyContaminationReport(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 3,
      maxDist: Int = 1,
      maxBroadcastBytes: Long = MaxEvalBroadcastBytes,
      evalSizeBytes: Option[Long] = None): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val trainSh = Dedup.withShingles(train, idCol, textCol, n)
      .select(col(idCol), explode(col("sh")).as("s"))
    val evalSh = Dedup.withShingles(eval, idCol, textCol, n)
      .select(explode(col("sh")).as("es")).distinct()
    def estOr(f: => Long): Long = evalSizeBytes.getOrElse(f)
    val matched = maxDist match {
      case 0 =>
        val est = estOr(estimatedRowBytes(evalSh, length(col("es"))))
        trainSh.join(broadcastIfFits(evalSh, est, maxBroadcastBytes),
          col("s") === col("es"))
      case 1 =>
        val evalKeys = evalSh.withColumn("k", explode(editOneKeys(col("es"))))
        val est = estOr(estimatedRowBytes(evalKeys,
          length(col("es")) + length(col("k.seg"))))
        trainSh.withColumn("k", explode(editOneKeys(col("s"))))
          .join(broadcastIfFits(evalKeys, est, maxBroadcastBytes), "k")
          .filter(levenshtein(col("s"), col("es")) <= 1)
          .select(col(idCol), col("s"), col("es")).distinct()
      case _ =>
        val evalBands = evalSh.select(col("es"), explode(sequence(
          greatest(length(col("es")) - maxDist, lit(0)),
          length(col("es")) + maxDist)).as("band"))
        val est = estOr(estimatedRowBytes(evalBands, length(col("es"))))
        trainSh.withColumn("band", length(col("s")))
          .join(broadcastIfFits(evalBands, est, maxBroadcastBytes), "band")
          .filter(levenshtein(col("s"), col("es")) <= maxDist)
    }
    // train shingles are distinct per doc: counting matched
    // (train-shingle, eval-shingle) pairs is deterministic
    matched.groupBy(col(idCol)).agg(count(lit(1)).as("n_fuzzy"))
  }

  /** Drop fuzzily-contaminated training documents (anti-join against
    * [[fuzzyContaminationReport]] ids). */
  def fuzzyDecontaminate(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int = 3,
      maxDist: Int = 1,
      maxBroadcastBytes: Long = MaxEvalBroadcastBytes): DataFrame =
    train.join(
      fuzzyContaminationReport(train, eval, idCol, textCol, n, maxDist,
        maxBroadcastBytes)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** Semantic decontamination report: training rows whose embedding
    * sits within `threshold` cosine of an eval embedding in the SAME
    * block — the embedding-space complement of n-gram
    * decontamination (catches paraphrased benchmark leakage no
    * token-level match sees). `n_close` counts the eval neighbors
    * within the threshold.
    *
    * Like SemDeDup (d12), candidates are INTRA-BLOCK only — blocking
    * (an LSH bucket, k-means cell, or domain label) is the declared
    * approximate semantics, bounding candidates by
    * Σ|train block|·|eval block| instead of train×eval. The eval side
    * (benchmarks — tiny by nature) is broadcast while its ESTIMATED
    * size (rows × vector bytes, one side-sized job) fits
    * `maxBroadcastBytes`, so the train scan never shuffles; past the
    * bound — or with `broadcastEval = false` forcing it — the join
    * shuffles on the block key instead, identical answer. */
  def semanticContaminationReport(train: DataFrame, eval: DataFrame,
      idCol: String, vecCol: String, blockCol: String,
      threshold: Double, broadcastEval: Boolean = true,
      maxBroadcastBytes: Long = MaxEvalBroadcastBytes,
      evalSizeBytes: Option[Long] = None): DataFrame = {
    import graft.functions.VectorFunctions
    val ev = eval.select(col(blockCol).as("_eval_block"),
      col(vecCol).as("_eval_vec"))
    val evs =
      if (!broadcastEval) ev
      else broadcastIfFits(ev,
        evalSizeBytes.getOrElse(
          estimatedRowBytes(ev, size(col("_eval_vec")) * lit(8))),
        maxBroadcastBytes)
    train.join(evs, col(blockCol) === col("_eval_block"))
      .filter(VectorFunctions.cosineSim(col(vecCol), col("_eval_vec"))
        >= threshold)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_close"))
  }

  /** Drop semantically-contaminated training rows (anti-join against
    * [[semanticContaminationReport]] ids). */
  def semanticDecontaminate(train: DataFrame, eval: DataFrame,
      idCol: String, vecCol: String, blockCol: String,
      threshold: Double,
      maxBroadcastBytes: Long = MaxEvalBroadcastBytes): DataFrame =
    train.join(
      semanticContaminationReport(train, eval, idCol, vecCol, blockCol,
        threshold, maxBroadcastBytes = maxBroadcastBytes)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** Corpus-wide vocabulary: top-k whitespace tokens by frequency
    * (ties broken lexicographically). Explode → hash agg (map-side
    * partial) → global top-k via sort+limit, which Spark executes as
    * TakeOrderedAndProject — per-partition top-k then a k-row merge on
    * the driver, never a full sort of the vocabulary. */
  def vocabTopK(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)

  /** Sliding-window document chunking: fixed `chunkSize`-token windows
    * every `stride` tokens (overlap = chunkSize − stride), the standard
    * long-document split for fixed context windows. Chunk starts are
    * 1, 1+stride, 2·stride+1, … ≤ max(n − chunkSize + stride, 1): every
    * token lands in at least one chunk, the final window may be shorter
    * than `chunkSize`, and a lattice start whose window is FULLY
    * contained in the previous window is not emitted (it would
    * duplicate training text). A document with no tokens yields one
    * empty chunk at start 1 (documents are never silently lost).
    *
    * Scale: map-only over the corpus scan — sequence + explode + slice
    * are per-row; no shuffle, output size ≈ rows × ⌈tokens/stride⌉. */
  def chunkSliding(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    // stride > chunkSize would silently SKIP the tokens between windows
    // — that's sampling, not chunking, and it breaks the every-token-
    // covered contract (callers wanting subsampling: Multimodal
    // .sampleFrames is the intentional-gaps operator)
    require(stride <= chunkSize,
      s"stride=$stride must be <= chunkSize=$chunkSize for full coverage")
    docs
      .withColumn("_w", TextOps.tokens(col(textCol)))
      .select(col(idCol),
        // upper bound n − chunkSize + stride: the first lattice start
        // at or past it already covers token n, anything later is a
        // window fully inside its predecessor (pure duplication)
        explode(sequence(lit(1),
          greatest(size(col("_w")) - (chunkSize - stride), lit(1)),
          lit(stride))).as("chunk_start"),
        col("_w"))
      .select(col(idCol), col("chunk_start").cast(LongType).as("chunk_start"),
        size(slice(col("_w"), col("chunk_start"), lit(chunkSize)))
          .cast(LongType).as("n_tokens"),
        array_join(slice(col("_w"), col("chunk_start"), lit(chunkSize)), " ")
          .as("chunk_text"))
  }
}
