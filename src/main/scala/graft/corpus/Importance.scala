package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.dedup.Dedup
import graft.functions.TextOps

/** DSIR-style data selection with importance resampling (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * NeurIPS 2023): documents are scored by how much their hashed
  * token-feature distribution resembles a TARGET domain relative to
  * the RAW corpus, and the top-scoring slice is kept.
  *
  * Scale shape — the part that matters at 100 TB:
  *  - the raw and target feature distributions are two hash
  *    aggregations that each collapse the corpus to a `buckets`-row
  *    model vector (driver state is O(buckets), like the k-means
  *    centroids — a bounded model, not row data);
  *  - scoring is then MAP-ONLY: the ratio model rides the plan as an
  *    array literal indexed per token inside codegen, so the scoring
  *    pass reads the corpus once with no shuffle at all;
  *  - selection is a TakeOrdered top-k, never a global sort.
  *
  * Integer rendering: the paper's log-likelihood-ratio weights are
  * rendered as scaled INTEGER ratios (`(target+1)·10⁶ div (raw+1)`,
  * add-one smoothing) and the per-document score as the token-mean of
  * those ratios (`·1000 div n_tokens`). Monotonicity in the target
  * likelihood is preserved per bucket; everything stays in BIGINT, so
  * the driver's DuckDB oracle reproduces the ranking bit for bit
  * (double arithmetic would drift in the low mantissa bits across
  * engines). Token features use [[Dedup.portableTokenHash]] — the
  * same engine-portable polynomial fold the SimHash twin pins.
  */
object Importance {

  /** Exact integral division (SQL `div`): a double `/` would round
    * past 2^53 and break oracle equality on large sums. */
  private def idiv(a: Column, b: Column): Column = call_function("div", a, b)

  /** Feature bucket of one token: portable hash mod `buckets` (the
    * hash is non-negative, so `%` is a true bucket index). */
  def tokenBucket(tok: Column, buckets: Int): Column =
    Dedup.portableTokenHash(tok) % buckets

  /** Per-bucket token counts over a document set — ONE hash agg that
    * collapses the corpus to a length-`buckets` model vector. */
  def bucketCounts(docs: DataFrame, textCol: String,
      buckets: Int): Array[Long] = {
    require(buckets > 0, "buckets must be positive")
    val rows = docs
      .select(explode(TextOps.tokens(col(textCol))).as("_im_tok"))
      .groupBy(tokenBucket(col("_im_tok"), buckets).as("_im_b"))
      .agg(count(lit(1)).as("_im_n"))
      .collect()
    val out = Array.fill(buckets)(0L)
    rows.foreach(r => out(r.getLong(0).toInt) = r.getLong(1))
    out
  }

  /** Smoothed integer importance ratios: ((target+1)·scale) div
    * (raw+1) per bucket. */
  def ratios(raw: Array[Long], target: Array[Long],
      scale: Long = 1000000L): Array[Long] = {
    require(raw.length == target.length, "model lengths must match")
    raw.indices.map(i => (target(i) + 1L) * scale / (raw(i) + 1L)).toArray
  }

  /** Map-only scoring pass: (idCol, n_tokens, importance) where
    * importance = (Σ ratio(bucket(token)) · 1000) div n_tokens (0 for
    * token-less documents). The ratio model is an array literal in
    * the plan — no join, no shuffle. */
  def score(docs: DataFrame, idCol: String, textCol: String,
      ratioModel: Array[Long], buckets: Int): DataFrame = {
    require(ratioModel.length == buckets, "model must have one entry per bucket")
    val rl = typedLit(ratioModel.toSeq)
    docs.select(col(idCol), TextOps.tokens(col(textCol)).as("_im_toks"))
      .select(col(idCol),
        size(col("_im_toks")).cast(LongType).as("n_tokens"),
        aggregate(
          transform(col("_im_toks"),
            t => element_at(rl,
              (tokenBucket(t, buckets) + 1L).cast(IntegerType))),
          lit(0L), (acc, x) => acc + x).as("_im_sum"))
      .select(col(idCol), col("n_tokens"),
        when(col("n_tokens") > 0,
          idiv(col("_im_sum") * lit(1000L), col("n_tokens")))
          .otherwise(lit(0L)).as("importance"))
  }

  /** Raw AND target model vectors in ONE corpus pass: the target is a
    * predicate over the same rows, so its counts are a conditional
    * sum in the same hash agg — half the model-fitting scans of
    * fitting each side separately (the hash fold per token is the
    * dominant cost). */
  def bucketCountsBoth(docs: DataFrame, textCol: String,
      targetPred: Column, buckets: Int): (Array[Long], Array[Long]) = {
    require(buckets > 0, "buckets must be positive")
    val rows = docs
      .select(targetPred.as("_im_t"),
        explode(TextOps.tokens(col(textCol))).as("_im_tok"))
      .groupBy(tokenBucket(col("_im_tok"), buckets).as("_im_b"))
      .agg(count(lit(1)).as("_im_n"),
        sum(when(col("_im_t"), lit(1L)).otherwise(lit(0L))).as("_im_tn"))
      .collect()
    val raw = Array.fill(buckets)(0L)
    val tgt = Array.fill(buckets)(0L)
    rows.foreach { r =>
      raw(r.getLong(0).toInt) = r.getLong(1)
      tgt(r.getLong(0).toInt) = r.getLong(2)
    }
    (raw, tgt)
  }

  /** The composed operator: fit both models in one scan, score, keep
    * the top `k` by (importance, id) — one model agg + one map-only
    * scan + TakeOrdered. */
  def resample(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, k: Int, buckets: Int = 64): DataFrame = {
    val (raw, tgt) = bucketCountsBoth(docs, textCol, targetPred, buckets)
    score(docs, idCol, textCol, ratios(raw, tgt), buckets)
      .orderBy(desc("importance"), asc(idCol)).limit(k)
  }
}
