package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis building blocks for training-data pipelines: token
  * ops, word-shingle n-grams, language-ID heuristic, quality metrics,
  * and a polynomial document fingerprint. All pure Column expressions
  * (codegen'd, no UDFs) — they run inside the parquet scan's
  * whole-stage-codegen span, so a 100 TB corpus pays one pass with no
  * extra shuffle or ser/de.
  *
  * Arithmetic is engineered to be engine-portable for the DuckDB
  * oracles: integer-only accumulation (exact), with any final ratio a
  * single int/int double division.
  */
object TextOps {

  /** English stopword profile for the language-ID heuristic. */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "in", "to", "is")

  /** Whitespace tokens with empties dropped (split keeps them). */
  def tokens(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  /** Distinct word n-gram shingles; fewer than n tokens ⇒ empty array.
    *
    * Built by zipping n shifted copies of the token array rather than
    * `element_at` inside a lambda: higher-order lambdas re-evaluate
    * captured subtrees per ELEMENT, so indexing into `tokens(text)`
    * would re-split the full text O(tokens) times per shingle —
    * quadratic string work per row (observed 5× slowdown at sf0.1).
    * With slices, the split is evaluated O(n) times per row total.
    * `concat` (unlike concat_ws) null-propagates, so the zip's ragged
    * tail self-eliminates in the final filter. */
  def shingles(text: Column, n: Int = 3): Column = {
    val w = tokens(text)
    val joined = (1 until n).foldLeft(w) { (acc, k) =>
      val shifted = when(size(w) > k, slice(w, lit(k + 1), size(w) - k))
        .otherwise(array().cast(ArrayType(StringType)))
      zip_with(acc, shifted, (a, b) => concat(a, lit(" "), b))
    }
    array_distinct(filter(joined, s => s.isNotNull))
  }

  /** Fraction of tokens that are English stopwords (0 if no tokens). */
  def stopwordRatio(text: Column): Column = {
    val w = tokens(text)
    when(size(w) > 0,
      size(filter(w, t => t.isInCollection(EnStopwords))) / size(w))
      .otherwise(lit(0.0))
  }

  /** n-gram-profile language ID, reduced to a stopword heuristic:
    * classify as "en" when ≥5% of tokens are English stopwords. */
  def langId(text: Column): Column =
    when(stopwordRatio(text) >= 0.05, "en").otherwise("und")

  /** Exact token count (whitespace tokenization). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast(LongType)

  /** BPE-ish subword count: runs of letters/digits plus individual
    * non-space symbols — roughly the unit count a byte-pair tokenizer
    * starts from. */
  def subwordCount(text: Column): Column =
    (regexp_count(text, lit("[A-Za-z0-9]+")) +
      regexp_count(text, lit("[^A-Za-z0-9\\s]"))).cast(LongType)

  /** Type-token ratio: distinct tokens / tokens (0 if empty). */
  def distinctRatio(text: Column): Column = {
    val w = tokens(text)
    when(size(w) > 0, size(array_distinct(w)) / size(w)).otherwise(lit(0.0))
  }

  /** Mean token length in chars (0 if empty): exact int sum / count. */
  def meanTokenLen(text: Column): Column = {
    val w = tokens(text)
    when(size(w) > 0,
      aggregate(transform(w, x => length(x)), lit(0), (acc, x) => acc + x) / size(w))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]-ish: favors stopword presence,
    * lexical diversity, and moderate token length. Fixed double
    * arithmetic order → bit-identical across engines. */
  def qualityScore(text: Column): Column =
    stopwordRatio(text) * 0.4 + distinctRatio(text) * 0.4 +
      when(meanTokenLen(text) >= 3.0 && meanTokenLen(text) <= 10.0, 0.2)
        .otherwise(lit(0.0))

  /** Fraction of word n-gram occurrences that repeat an earlier
    * n-gram in the same document (a Gopher-style repetitiousness
    * signal — high values flag boilerplate/spam for filtering).
    * 0 for documents with fewer than n tokens. Same int/int single
    * division both engines → bit-identical. */
  def repetitionRatio(text: Column, n: Int = 2): Column = {
    val total = size(tokens(text)) - (n - 1)
    when(total > 0,
      lit(1.0) - size(shingles(text, n)).cast(DoubleType) / total)
      .otherwise(lit(0.0))
  }

  /** Word n-gram OCCURRENCES in document order (non-distinct —
    * [[shingles]]' multiset sibling; that one deduplicates for set
    * similarity, this one keeps every occurrence for frequency
    * statistics). Fewer than n tokens ⇒ empty array. Same
    * shifted-slice construction (see [[shingles]] for why not
    * element_at). */
  def ngramOccurrences(text: Column, n: Int): Column = {
    val w = tokens(text)
    val joined = (1 until n).foldLeft(w) { (acc, k) =>
      val shifted = when(size(w) > k, slice(w, lit(k + 1), size(w) - k))
        .otherwise(array().cast(ArrayType(StringType)))
      zip_with(acc, shifted, (a, b) => concat(a, lit(" "), b))
    }
    filter(joined, s => s.isNotNull)
  }

  /** The document's most frequent word n-gram, MAP-ONLY: struct
    * (cnt: Long, gram: String). Sort the occurrence array in-row and
    * fold a run-length argmax over it — no explode, no shuffle, no
    * per-doc grouping; the whole computation stays inside the scan's
    * codegen span, which is what lets a 100 TB corpus compute its
    * Gopher repetition signals in the same single pass as the rest of
    * the quality battery. Ties break to the lexicographically
    * smallest gram (strict `>` over the ascending sort — the first
    * gram to reach the max count keeps it), so the answer is
    * deterministic and engine-portable. Empty ⇒ (0, ""). */
  def topNgram(text: Column, n: Int): Column = {
    val sorted = array_sort(ngramOccurrences(text, n))
    aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0L).as("run"),
        lit(0L).as("best_cnt"), lit("").as("best_gram")),
      (st, g) => {
        val newRun = when(g === st.getField("prev"),
          st.getField("run") + lit(1L)).otherwise(lit(1L))
        val better = newRun > st.getField("best_cnt")
        struct(g.as("prev"), newRun.as("run"),
          when(better, newRun).otherwise(st.getField("best_cnt"))
            .as("best_cnt"),
          when(better, g).otherwise(st.getField("best_gram"))
            .as("best_gram"))
      },
      st => struct(st.getField("best_cnt").as("cnt"),
        st.getField("best_gram").as("gram")))
  }

  /** Email addresses — RE2-safe (no backrefs/lookaround), so the same
    * pattern runs verbatim in Spark (Java regex) and DuckDB (RE2). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Dotted-quad IPv4 (word-bounded). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** Phone-like digit run: ≥9 chars of digits/whitespace/().-,
    * optional +. Whitespace is spelled explicitly because Java's \s
    * includes vertical tab (\x0B) and RE2's does not — the class
    * below is the intersection both engines agree on. */
  val PhoneRe = "\\+?\\d[\\d\\t\\n\\f\\r ().-]{7,}\\d"

  /** PII scrub for training text: emails, then IPv4s, then phone-like
    * digit runs, each replaced by a typed placeholder. Order matters —
    * an IPv4 is also a phone-shaped digit run, so it must be consumed
    * first. Pure regexp_replace chain: runs inside the scan's codegen
    * span, one pass over 100 TB. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<email>"),
        Ipv4Re, "<ip>"),
      PhoneRe, "<phone>")

  /** Make the text battery callable from SQL text (`spark.sql` users
    * get the same codegen'd Column compositions): each function is a
    * 1-arg wrapper that lifts the input expression to a Column,
    * applies the composition, and lowers back. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, resolvedExpression}
    val reg = spark.sessionState.functionRegistry
    def unary(name: String, f: Column => Column)
        : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
          org.apache.spark.sql.catalyst.expressions.Expression = es => {
      if (es.length != 1)
        throw new IllegalArgumentException(
          s"$name requires exactly 1 argument, got ${es.length}")
      // eager lowering: a lazy ColumnNode wrapper is Unevaluable and
      // would survive to codegen inside a registry-built tree
      resolvedExpression(spark, f(toCol(es.head)))
    }
    Seq[(String, Column => Column)](
      ("graft_lang_id", langId),
      ("graft_token_count", tokenCount),
      ("graft_subword_count", subwordCount),
      ("graft_stopword_ratio", stopwordRatio),
      ("graft_distinct_ratio", distinctRatio),
      ("graft_mean_token_len", meanTokenLen),
      ("graft_quality_score", qualityScore),
      ("graft_repetition_ratio", repetitionRatio(_)),
      ("graft_fingerprint", fingerprint),
      ("graft_redact_pii", redactPii)
    ).foreach { case (n, f) =>
      reg.createOrReplaceTempFunction(n, unary(n, f), "scala_udf")
    }
  }

  private val Mod = 1000000007L

  /** Polynomial rolling-hash fingerprint over the token stream:
    * acc = (acc*31 + tokenVal) mod 1e9+7, tokenVal = 31*len + first
    * char code. Integer-exact, order-sensitive (a true rolling hash),
    * and reproducible in any engine with a left fold. */
  def fingerprint(text: Column): Column = {
    val vals = transform(tokens(text), w =>
      (length(w) * 31 + ascii(w)).cast(LongType))
    aggregate(vals, lit(0L), (acc, x) => (acc * 31L + x) % Mod)
  }
}
