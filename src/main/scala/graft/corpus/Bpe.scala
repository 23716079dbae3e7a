package graft.corpus

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextOps

/** One learned merge: at `rank` (1-based), `left`+`right` was the most
  * frequent adjacent symbol pair, seen `n` times (weighted by word
  * frequency, counting every adjacent occurrence like the classic
  * algorithm).
  */
final case class BpeMerge(rank: Int, left: String, right: String, n: Long)

/** Byte-pair-encoding vocabulary training, Spark-first.
  *
  * The classic reduction makes this scale: ONE corpus-wide shuffle
  * aggregates the corpus to a (word, count) table, and every training
  * iteration thereafter runs over DISTINCT WORDS ONLY — bounded by
  * vocabulary size, not corpus size, so a 100 TB corpus trains at the
  * same per-iteration cost as a 100 GB one with the same vocabulary.
  *
  * Symbol representation: a word's current segmentation is a single
  * string — its symbols joined by DOUBLE spaces, with double-space
  * sentinels at both ends (symbols themselves come from whitespace
  * tokens, so they can never contain a space). Two properties make
  * this the right encoding:
  *  - applying merge (l, r) is ONE literal `replace` of " l  r " with
  *    " lr ": each match consumes one space from each neighboring
  *    double-space run, so adjacent occurrences still match, and a
  *    left-to-right non-overlapping scan is EXACTLY the greedy
  *    left-to-right fold BPE specifies (within one rule, a merged
  *    symbol `lr` can never re-form the pattern: that would need
  *    l = l+r or r = l+r, impossible for non-empty symbols). The
  *    whole apply step stays inside whole-stage codegen — no UDF, no
  *    array fold;
  *  - the representation is engine-portable: DuckDB's `replace` has
  *    identical semantics, which is what lets the DRIVER'S ORACLE
  *    verify the iterative trainer end to end (unrolled as CTE
  *    layers) rather than only its first iteration.
  *
  * Deviation from Sennrich et al.'s subword-NMT reference: no
  * end-of-word marker symbol (the corpus model here is whitespace
  * tokens, and parity with the SQL oracle is worth more than the
  * marker, which callers can add by suffixing words before training).
  */
object Bpe {

  /** The corpus-scale step: whitespace words with occurrence counts.
    * Partial (map-side) aggregation makes the shuffle carry one row
    * per distinct word per task, not one per token. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** "  a  b  c  " — initial per-character segmentation of a word in
    * the double-spaced encoding. */
  def spacedChars(word: Column): Column =
    concat(lit("  "),
      array_join(regexp_extract_all(word, lit("."), lit(0)), "  "),
      lit("  "))

  /** Current symbols of a double-space-encoded segmentation. */
  def symbols(spaced: Column): Column = {
    val t = trim(spaced)
    when(t === "", array().cast(ArrayType(StringType)))
      .otherwise(split(t, "  "))
  }

  /** Adjacent-pair counts over (spaced segmentation, word count) rows:
    * (l, r, n) where n sums word counts over every adjacent occurrence.
    * One explode to Σ(symbols−1) rows over the WORD table (vocabulary-
    * bounded), one hash agg. */
  def pairCounts(words: DataFrame, spacedCol: String,
      cntCol: String): DataFrame = {
    val sym = symbols(col(spacedCol))
    val emptyArr = array().cast(ArrayType(StringType))
    val shifted = when(size(sym) > 1, slice(sym, lit(2), size(sym) - 1))
      .otherwise(emptyArr)
    val pairs = zip_with(sym, shifted,
      (a, b) => struct(a.as("l"), b.as("r")))
    words.select(explode(pairs).as("p"), col(cntCol).as("_bp_cnt"))
      .filter(col("p.r").isNotNull)          // ragged zip tail
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("_bp_cnt")).as("n"))
  }

  /** Apply one merge to a double-space-encoded segmentation. */
  def applyMerge(spaced: Column, l: String, r: String): Column =
    replace(spaced, lit(s" $l  $r "), lit(s" ${l}${r} "))

  /** Train `nMerges` merges over a (word, cnt) table. Per iteration:
    * one pair-count aggregation over the vocabulary table and ONE
    * driver-collected row (the argmax pair — ties broken by (l, r)
    * ascending for determinism). Each re-segmented vocabulary is
    * `localCheckpoint`ed (eager), which both materializes it for the
    * next iteration AND CUTS LINEAGE — with plain `cache` the plan
    * nests one InMemoryRelation per iteration, and rendering such a
    * plan (Spark explains every execution for the UI listener) is
    * exponential in iteration count: a 20-merge run OOMed on the plan
    * STRING before this. Driver state is the merge list only —
    * O(nMerges). Stops early when no adjacent pair remains.
    * (On a cluster, localCheckpoint trades executor-loss tolerance
    * for speed; a lost block just means re-running the short training
    * loop, which is the right trade for a vocabulary-sized table.) */
  def train(wordCounts: DataFrame, nMerges: Int): Seq[BpeMerge] = {
    require(nMerges >= 0, "nMerges must be non-negative")
    val out = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    var cur = wordCounts
      .select(spacedChars(col("word")).as("s"), col("cnt"))
      .localCheckpoint(true)
    var done = false
    var rank = 1
    while (rank <= nMerges && !done) {
      val best = pairCounts(cur, "s", "cnt")
        .orderBy(desc("n"), asc("l"), asc("r")).limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, r, n) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        out += BpeMerge(rank, l, r, n)
        cur = cur.select(applyMerge(col("s"), l, r).as("s"), col("cnt"))
          .localCheckpoint(true)
        rank += 1
      }
    }
    out.toSeq
  }

  /** Segment a column of words with a trained merge list: the chained
    * literal replaces, still one codegen span. Returns the SYMBOL
    * ARRAY of each word. */
  def segmentWord(word: Column, merges: Seq[BpeMerge]): Column =
    symbols(merges.foldLeft(spacedChars(word)) { (s, m) =>
      applyMerge(s, m.left, m.right)
    })

  /** Per-document subword statistics under a trained merge list:
    * (idCol, n_tokens, n_subwords). Map-only over the corpus — the
    * merge list rides in the plan as literals. */
  def segmentStats(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[BpeMerge]): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    docs.select(col(idCol), toks.as("_bp_toks"))
      .select(col(idCol),
        size(col("_bp_toks")).cast(LongType).as("n_tokens"),
        coalesce(
          aggregate(
            transform(col("_bp_toks"),
              w => size(segmentWord(w, merges)).cast(LongType)),
            lit(0L), (acc, x) => acc + x),
          lit(0L)).as("n_subwords"))
  }
}
