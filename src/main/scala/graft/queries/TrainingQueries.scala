package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables
import graft.corpus.{Bpe, Importance, Selection}
import graft.dedup.Dedup
import graft.functions.TextOps
import graft.similarity.Ann

/** Training-data pipeline operators as driver-checkable queries:
  * deduplication (d*), text analysis (t*), similarity search (s*),
  * corpus selection (c*: splits, sampling, decontamination, packing,
  * mixtures), multimodal (m*).
  *
  * Oracle strategy: everything built from engine-portable arithmetic
  * (integer set algebra, exact fold hashes, double division) carries
  * full DuckDB SQL. Operators whose production outputs depend on
  * Spark-internal hashes or merge-order-sensitive floats (xxhash64 in
  * MinHash/SimHash/LSH, VectorMean-trained centroids) run here as
  * QUANTITATIVE oracle gates instead: either the same machinery over
  * portable arithmetic (d04, s03, s04 — every value hash-matched), or
  * integer recall/descent bounds the oracle can assert (d03's
  * LSH-vs-exact counts, s05/s07's Lloyd's-objective descent). The
  * Spark-hash production paths stay spec-tested against their exact
  * counterparts.
  */
object TrainingQueries {

  // ------------------------------------------------------------- dedup

  /** d01: exact dedup — representative id + copy count per duplicate
    * group (grouped on the full text). */
  def d01Exact(s: SparkSession, d: String): DataFrame =
    Dedup.exact(Tables.documents(s, d), "doc_id", Seq("text"))
      .select("doc_id", "n_copies")
      .orderBy("doc_id")

  val d01Sql: String =
    """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin

  /** d10: C4-style span dedup — every 10-token window occurs once
    * corpus-wide (first (doc_id, pos) occurrence wins); documents
    * reassemble from their surviving windows. */
  def d10SpanDedup(s: SparkSession, d: String): DataFrame =
    Dedup.spanDedup(Tables.documents(s, d), "doc_id", "text", span = 10)
      .orderBy("doc_id")

  val d10Sql: String =
    """WITH w AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, s.pos AS pos, s.chunk AS chunk
      |  FROM (SELECT doc_id,
      |          unnest(list_transform(
      |            range(0, CAST(ceil(len(toks) / 10.0) AS INT)),
      |            i -> {'pos': i,
      |                  'chunk': array_to_string(toks[(i*10+1):((i+1)*10)], ' ')})) AS s
      |        FROM w)),
      |r AS (
      |  SELECT doc_id, pos, chunk,
      |         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
      |  FROM c),
      |k AS (
      |  SELECT doc_id,
      |         string_agg(chunk, ' ' ORDER BY pos) AS dedup_text,
      |         count(*) AS n_kept
      |  FROM r WHERE rn = 1 GROUP BY doc_id)
      |SELECT d.doc_id,
      |       COALESCE(k.dedup_text, '') AS dedup_text,
      |       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
      |FROM documents d LEFT JOIN k USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** d11: edit-distance fuzzy near-dup pairs over part names —
    * levenshtein ≤ 2 within (brand, size, length-band) blocks; the
    * oracle recomputes with DuckDB's levenshtein over the plain
    * (brand, size) block, so the band cover's exactness is part of
    * what the hash pins. */
  def d11EditDistance(s: SparkSession, d: String): DataFrame =
    Dedup.editDistancePairs(Tables.part(s, d), "p_partkey", "p_name",
        Seq("p_brand", "p_size"), maxDist = 2)
      .orderBy("a_id", "b_id")

  val d11Sql: String =
    """SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
      |FROM part a JOIN part b
      |  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
      | AND a.p_partkey < b.p_partkey
      |WHERE levenshtein(a.p_name, b.p_name) <= 2
      |ORDER BY a_id, b_id""".stripMargin

  /** d02: exact 3-gram Jaccard near-dup pairs (inverted-index join). */
  def d02NgramJaccard(s: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
        n = 3, threshold = 0.5)
      .orderBy("a_id", "b_id")

  val d02Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |        FROM documents)),
      |cnt AS (SELECT doc_id, len(sh) AS n FROM tok),
      |pairs AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
      |  FROM (SELECT doc_id, unnest(sh) AS s FROM tok) a
      |  JOIN (SELECT doc_id, unnest(sh) AS s FROM tok) b
      |    ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT a_id, b_id, inter/(ca.n + cb.n - inter) AS jaccard
      |FROM pairs JOIN cnt ca ON ca.doc_id = a_id JOIN cnt cb ON cb.doc_id = b_id
      |WHERE inter/(ca.n + cb.n - inter) >= 0.5
      |ORDER BY a_id, b_id""".stripMargin

  /** d03: MinHash+LSH near-dup dedup as a QUANTITATIVE recall gate —
    * the scale path's pair set counted against the exact inverted-index
    * pair set (d02) computed in the same query: one row
    * (n_exact, n_hit, n_lsh), hash-matched when LSH found exactly the
    * exact pairs (n_hit = n_lsh = n_exact; the oracle emits the exact
    * count three times). Banding here is the recall-hardened 32×2
    * configuration c24 ships (miss ≈ 1e-4 per J=0.5 pair vs ~0.2 for
    * 16×4 near the S-curve knee); d07 pins the default 16×4 banding's
    * per-pair Jaccard values bit-for-bit. Precision is structural
    * (candidates are exact-Jaccard-verified before emission), so a
    * mismatch in ANY of the three counts is a real recall/precision
    * regression, not hash noise. */
  def d03MinhashLsh(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.5).select("a_id", "b_id")
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3,
      k = 64, bands = 32, threshold = 0.5).select("a_id", "b_id")
    // three one-row aggregates; scalar broadcast joins (O(1) bytes)
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(
        exact.join(lsh, Seq("a_id", "b_id")).agg(count(lit(1)).as("n_hit"))))
      .crossJoin(broadcast(lsh.agg(count(lit(1)).as("n_lsh"))))
  }

  val d03Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |        FROM documents)),
      |cnt AS (SELECT doc_id, len(sh) AS n FROM tok),
      |pairs AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
      |  FROM (SELECT doc_id, unnest(sh) AS s FROM tok) a
      |  JOIN (SELECT doc_id, unnest(sh) AS s FROM tok) b
      |    ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |p AS (
      |  SELECT a_id, b_id
      |  FROM pairs JOIN cnt ca ON ca.doc_id = a_id JOIN cnt cb ON cb.doc_id = b_id
      |  WHERE inter/(ca.n + cb.n - inter) >= 0.5)
      |SELECT COUNT(*) AS n_exact, COUNT(*) AS n_hit, COUNT(*) AS n_lsh
      |FROM p""".stripMargin

  /** d07: oracle-checked LSH — the at-scale dedup path (d03's
    * MinHash+LSH) inner-joined against the exact inverted-index pairs
    * (d02) computed in the same query. Hash-match here proves two
    * things about the scale path: recall is 1.0 on this corpus (a
    * missed pair drops a row and fails the count), and the
    * hashed-shingle Jaccard (`jaccard_lsh`, longs through
    * array_intersect) equals the string-set Jaccard bit-for-bit
    * (a 64-bit shingle collision would perturb it). Precision is
    * structural — LSH candidates are exact-verified before emission —
    * so this gives the documented 100 TB dedup path the same
    * correctness signal as the exact path it replaces. */
  def d07LshVsExact(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3,
        k = 64, bands = 16, threshold = 0.5)
      .withColumnRenamed("jaccard", "jaccard_lsh")
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.5)
    exact.join(lsh, Seq("a_id", "b_id"))
      .select(col("a_id"), col("b_id"), col("jaccard"), col("jaccard_lsh"))
      .orderBy("a_id", "b_id")
  }

  val d07Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |        FROM documents)),
      |cnt AS (SELECT doc_id, len(sh) AS n FROM tok),
      |pairs AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
      |  FROM (SELECT doc_id, unnest(sh) AS s FROM tok) a
      |  JOIN (SELECT doc_id, unnest(sh) AS s FROM tok) b
      |    ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT a_id, b_id, inter/(ca.n + cb.n - inter) AS jaccard,
      |  inter/(ca.n + cb.n - inter) AS jaccard_lsh
      |FROM pairs JOIN cnt ca ON ca.doc_id = a_id JOIN cnt cb ON cb.doc_id = b_id
      |WHERE inter/(ca.n + cb.n - inter) >= 0.5
      |ORDER BY a_id, b_id""".stripMargin

  /** d09: INCREMENTAL dedup — the corpus (doc_id % 10 ≠ 0) is a stored
    * signature index; the "new batch" (doc_id % 10 = 0) dedups against
    * it without re-reading corpus text. The oracle computes the exact
    * bipartite-or-within-batch Jaccard pairs, so a hash match proves
    * the incremental path finds exactly the pairs a full recompute
    * would (restricted to pairs touching the batch — old-old is the
    * index's prior dedup, correctly absent). */
  def d09IncrementalDedup(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // the pair producer scans both signature frames three times (band
    // join + two verify joins) and caches nothing internally — the
    // CALLER caches (d09's documented caching contract; a streamed
    // ingest would instead unpersist per batch, DedupStream)
    val index = Dedup.minhashIndex(
      docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text", n = 3).cache()
    val newIdx = Dedup.minhashIndex(
      docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", n = 3).cache()
    Dedup.minhashLshPairsFromIndexes(index, newIdx, "doc_id",
        k = 64, bands = 16, threshold = 0.5)
      .orderBy("a_id", "b_id")
  }

  val d09Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |        FROM documents)),
      |cnt AS (SELECT doc_id, len(sh) AS n FROM tok),
      |pairs AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
      |  FROM (SELECT doc_id, unnest(sh) AS s FROM tok) a
      |  JOIN (SELECT doc_id, unnest(sh) AS s FROM tok) b
      |    ON a.s = b.s AND a.doc_id < b.doc_id
      |  WHERE a.doc_id % 10 = 0 OR b.doc_id % 10 = 0
      |  GROUP BY 1, 2)
      |SELECT a_id, b_id, inter/(ca.n + cb.n - inter) AS jaccard
      |FROM pairs JOIN cnt ca ON ca.doc_id = a_id JOIN cnt cb ON cb.doc_id = b_id
      |WHERE inter/(ca.n + cb.n - inter) >= 0.5
      |ORDER BY a_id, b_id""".stripMargin

  /** d04: SimHash near-dup candidates as a full oracle gate — the d04
    * chunk-collision pair machinery run over
    * [[Dedup.portableTokenHash]] signatures (d08's portable hash), so
    * DuckDB reproduces EVERY candidate pair and its Hamming distance
    * bit-for-bit; each pair carries an `in_exact` overlap flag against
    * the exact 3-gram Jaccard pairs (d02), so the gated output itself
    * quantifies how SimHash candidates overlap the exact near-dup
    * baseline. The xxhash64 signature path stays
    * [[Dedup.simhashPairs]]' production default (better-mixed bits;
    * spec-pinned against its declarative witness). */
  def d04Simhash(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3,
      tokenHash = Dedup.portableTokenHash)
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.5)
      .select(col("a_id"), col("b_id"), lit(1L).as("in_exact"))
    pairs.join(exact, Seq("a_id", "b_id"), "left")
      .select(col("a_id"), col("b_id"),
        col("hamming").cast(LongType).as("hamming"),
        coalesce(col("in_exact"), lit(0L)).as("in_exact"))
      .orderBy("a_id", "b_id")
  }

  /** The ONE rendering of the portable SimHash signature machinery in
    * DuckDB SQL (tokenize → portable token hash → 64 ±1 bit-sums in
    * one aggregate → sign fold), ending in `sig(doc_id, sig)` — shared
    * by d08's signature oracle and d04's pair-gate oracle (the
    * duckHash discipline: determinism-critical oracle expressions are
    * generated once). */
  private def duckSimhashSigCtes: String = {
    // the same 64 bit-sums the Spark plan builds, generated not typed
    val sums = (0 until 64).map(j =>
      s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j")
      .mkString(",\n    ")
    val bits = (0 until 64).map(j =>
      s"CASE WHEN s$j > 0 THEN (CAST(1 AS BIGINT) << $j) ELSE CAST(0 AS BIGINT) END")
      .mkString(" |\n    ")
    s"""tok AS (
       |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
       |    x -> x <> '')) AS w
       |  FROM documents),
       |th AS (
       |  SELECT doc_id,
       |    (list_reduce(list_prepend(CAST(13 AS BIGINT),
       |       list_transform(regexp_extract_all(w, '.'),
       |         c -> CAST(ascii(c) AS BIGINT))),
       |       (acc, c) -> (acc * 137 + c) % 2147483629) << 32)
       |    + list_reduce(list_prepend(CAST(7 AS BIGINT),
       |       list_transform(regexp_extract_all(w, '.'),
       |         c -> CAST(ascii(c) AS BIGINT))),
       |       (acc, c) -> (acc * 131 + c) % 2147483647) AS h
       |  FROM tok),
       |sums AS (
       |  SELECT doc_id,
       |    $sums
       |  FROM th GROUP BY doc_id),
       |sig AS (
       |  SELECT doc_id,
       |    $bits AS sig
       |  FROM sums)""".stripMargin
  }

  val d04Sql: String =
    s"""WITH $duckSimhashSigCtes,
       |sp AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |    CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
       |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.sig, b.sig)) <= 3),
       |jtok AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
       |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
       |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
       |        FROM documents)),
       |jcnt AS (SELECT doc_id, len(sh) AS n FROM jtok),
       |jpairs AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
       |  FROM (SELECT doc_id, unnest(sh) AS s FROM jtok) a
       |  JOIN (SELECT doc_id, unnest(sh) AS s FROM jtok) b
       |    ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |ep AS (
       |  SELECT a_id, b_id
       |  FROM jpairs JOIN jcnt ca ON ca.doc_id = a_id
       |              JOIN jcnt cb ON cb.doc_id = b_id
       |  WHERE inter/(ca.n + cb.n - inter) >= 0.5)
       |SELECT sp.a_id, sp.b_id, sp.hamming,
       |  CAST(CASE WHEN ep.a_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS in_exact
       |FROM sp LEFT JOIN ep ON sp.a_id = ep.a_id AND sp.b_id = ep.b_id
       |ORDER BY sp.a_id, sp.b_id""".stripMargin

  /** d08: oracle-checked SimHash — the d04 signature machinery (token
    * explode → 64 ±1 bit-sums in one hash aggregate → sign fold) run
    * over [[Dedup.portableTokenHash]] instead of xxhash64, so DuckDB
    * reproduces every signature bit-for-bit (d04 gates the PAIR set
    * built from these signatures; this pins each signature value). */
  def d08SimhashPortable(s: SparkSession, d: String): DataFrame =
    Dedup.simhashSignatures(Tables.documents(s, d), "doc_id", "text",
        Dedup.portableTokenHash)
      .orderBy("doc_id")

  val d08Sql: String =
    s"""WITH $duckSimhashSigCtes
       |SELECT doc_id, sig FROM sig ORDER BY doc_id""".stripMargin

  /** d05: embedding-cosine near-dup pairs blocked on label. */
  def d05EmbeddingNearDup(s: SparkSession, d: String): DataFrame =
    Dedup.embeddingNearDupPairs(Tables.embeddings(s, d), "vec_id",
        "embedding", "label", threshold = 0.45)
      .orderBy("a_id", "b_id")

  val d05Sql: String =
    """SELECT a.vec_id AS a_id, b.vec_id AS b_id
      |FROM embeddings a JOIN embeddings b
      |  ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |        CAST(b.embedding AS DOUBLE[])) >= 0.45
      |ORDER BY a_id, b_id""".stripMargin

  /** d12: semantic dedup (SemDeDup shape) — cluster the embedding
    * corpus, then keep the smallest-id representative of every
    * intra-cluster near-dup relation. The cluster key here is the
    * portable integer-hyperplane LSH bucket (s06's machinery, 6 bits ≈
    * 64 cells), so DuckDB reproduces the clustering bit-for-bit and
    * the cosine prune numerically ([[graft.dedup.Dedup.semanticDedup]]
    * accepts any cluster key — k-means cells in production). Pair
    * candidates are bounded by Σ|cluster|², never corpus². */
  def d12SemanticDedup(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"),
      Ann.portableLshBucket(col("embedding"), nBits = 6, dim = 64).as("bucket"))
    Dedup.semanticDedup(emb, "vec_id", "embedding", "bucket", threshold = 0.4)
      .select(col("vec_id"), col("bucket"))
      .orderBy("vec_id")
  }

  val d12Sql: String = {
    val (q, bits) = duckLshBucket(nBits = 6, dim = 64)
    s"""WITH b AS (
       |  SELECT vec_id, embedding,
       |  $bits AS bucket
       |  FROM (SELECT vec_id, embedding, $q AS q FROM embeddings)),
       |dropped AS (
       |  SELECT DISTINCT b2.vec_id
       |  FROM b b1 JOIN b b2 ON b1.bucket = b2.bucket AND b1.vec_id < b2.vec_id
       |  WHERE list_cosine_similarity(CAST(b1.embedding AS DOUBLE[]),
       |          CAST(b2.embedding AS DOUBLE[])) >= 0.4)
       |SELECT vec_id, bucket FROM b
       |WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
       |ORDER BY vec_id""".stripMargin
  }

  /** d13: directed shingle containment — the asymmetric inclusion
    * relation (short doc quoted inside a long one) at ≥ 0.8; both
    * directions of every candidate scored
    * ([[graft.dedup.Dedup.ngramContainmentPairs]]). */
  def d13Containment(s: SparkSession, d: String): DataFrame =
    Dedup.ngramContainmentPairs(Tables.documents(s, d), "doc_id", "text",
        n = 3, threshold = 0.8)
      .orderBy("src_id", "dst_id")

  val d13Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |        FROM documents)),
      |ne AS (SELECT doc_id, sh FROM tok WHERE len(sh) > 0),
      |cnt AS (SELECT doc_id, len(sh) AS n FROM ne),
      |p AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
      |  FROM (SELECT doc_id, unnest(sh) AS s FROM ne) a
      |  JOIN (SELECT doc_id, unnest(sh) AS s FROM ne) b
      |    ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |d AS (
      |  SELECT a_id AS src_id, b_id AS dst_id, inter / ca.n AS containment
      |  FROM p JOIN cnt ca ON ca.doc_id = a_id
      |  UNION ALL
      |  SELECT b_id, a_id, inter / cb.n
      |  FROM p JOIN cnt cb ON cb.doc_id = b_id)
      |SELECT src_id, dst_id, containment FROM d
      |WHERE containment >= 0.8 ORDER BY src_id, dst_id""".stripMargin

  /** d15: the SHIPPED containment path, benched and oracle-checked
    * alone (round-11 advice — the bench should price what ships):
    * [[graft.dedup.Dedup.minhashContainmentPairs]] — band-bucket LSH
    * candidates + exact directed verify, d13's linear-scale 100 TB
    * path — emitting the directed pair set directly. The oracle is
    * the EXACT inverted-index answer (d13's SQL), so a hash match
    * proves (a) recall 1.0 on this corpus — every exact pair found —
    * and (b) bit-identical containment values (the hashed-shingle
    * distinct counts equal the raw-shingle counts, d07/d16's
    * injectivity argument). The count-form recall gate survives as
    * [[d15bContainmentRecallGate]] — its cost is the gate's (it embeds
    * the Σ df² twin), this row's cost is the operator's. */
  def d15ContainmentLsh(s: SparkSession, d: String): DataFrame =
    Dedup.minhashContainmentPairs(Tables.documents(s, d), "doc_id",
        "text", n = 3, k = 64, bands = 32, threshold = 0.8)
      .orderBy("src_id", "dst_id")

  // oracle: the exact directed containment pairs (d13's construction)
  val d15Sql: String = d13Sql

  /** d15b: the QUANTITATIVE recall gate — LSH pair counts against the
    * exact inverted-index pair set computed in the same query: one row
    * (n_exact, n_hit, n_lsh), hash-matched when LSH found exactly the
    * exact pairs. Precision is structural (candidates are
    * exact-containment-verified before emission), so n_lsh > n_hit is
    * impossible and a mismatch in any count is a real recall
    * regression. Deliberately embeds the exact Σ df² twin, so its
    * bench cost is the ORACLE CONSTRUCTION's, not the shipped path's —
    * d15 is the row that prices the operator. */
  def d15bContainmentRecallGate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val exact = Dedup.ngramContainmentPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.8).select("src_id", "dst_id")
    val lsh = Dedup.minhashContainmentPairs(docs, "doc_id", "text",
      n = 3, k = 64, bands = 32, threshold = 0.8)
      .select("src_id", "dst_id")
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(exact.join(lsh, Seq("src_id", "dst_id"))
        .agg(count(lit(1)).as("n_hit"))))
      .crossJoin(broadcast(lsh.agg(count(lit(1)).as("n_lsh"))))
  }

  val d15bSql: String =
    """WITH tok AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |        FROM documents)),
      |ne AS (SELECT doc_id, sh FROM tok WHERE len(sh) > 0),
      |cnt AS (SELECT doc_id, len(sh) AS n FROM ne),
      |p AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
      |  FROM (SELECT doc_id, unnest(sh) AS s FROM ne) a
      |  JOIN (SELECT doc_id, unnest(sh) AS s FROM ne) b
      |    ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |d AS (
      |  SELECT a_id AS src_id, b_id AS dst_id, inter / ca.n AS containment
      |  FROM p JOIN cnt ca ON ca.doc_id = a_id
      |  UNION ALL
      |  SELECT b_id, a_id, inter / cb.n
      |  FROM p JOIN cnt cb ON cb.doc_id = b_id),
      |e AS (SELECT src_id, dst_id FROM d WHERE containment >= 0.8)
      |SELECT COUNT(*) AS n_exact, COUNT(*) AS n_hit, COUNT(*) AS n_lsh
      |FROM e""".stripMargin

  /** d16: INCREMENTAL containment — the ingest-time quote/inclusion
    * check: the corpus (doc_id % 10 ≠ 0) is a stored signature index,
    * the "new batch" (doc_id % 10 = 0) is scored against it without
    * re-shingling the corpus
    * ([[graft.dedup.Dedup.minhashContainmentPairsFromIndexes]]).
    * Oracle: the exact directed containment pairs TOUCHING the batch
    * (old–old correctly absent — the index's prior run owns those), so
    * a hash match proves the incremental path finds exactly the pairs
    * a full recompute would, with bit-identical containment values
    * (d07's hashed-shingle-exactness argument). */
  def d16IncrementalContainment(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // caller-owned caches (d09's rationale): the producer scans both
    // signature frames three times and caches nothing internally
    val index = Dedup.minhashIndex(
      docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text", n = 3).cache()
    val newIdx = Dedup.minhashIndex(
      docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", n = 3).cache()
    Dedup.minhashContainmentPairsFromIndexes(index, newIdx, "doc_id",
        k = 64, bands = 32, threshold = 0.8)
      .orderBy("src_id", "dst_id")
  }

  val d16Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |        FROM documents)),
      |ne AS (SELECT doc_id, sh FROM tok WHERE len(sh) > 0),
      |cnt AS (SELECT doc_id, len(sh) AS n FROM ne),
      |p AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
      |  FROM (SELECT doc_id, unnest(sh) AS s FROM ne) a
      |  JOIN (SELECT doc_id, unnest(sh) AS s FROM ne) b
      |    ON a.s = b.s AND a.doc_id < b.doc_id
      |  WHERE a.doc_id % 10 = 0 OR b.doc_id % 10 = 0
      |  GROUP BY 1, 2),
      |d AS (
      |  SELECT a_id AS src_id, b_id AS dst_id, inter / ca.n AS containment
      |  FROM p JOIN cnt ca ON ca.doc_id = a_id
      |  UNION ALL
      |  SELECT b_id, a_id, inter / cb.n
      |  FROM p JOIN cnt cb ON cb.doc_id = b_id)
      |SELECT src_id, dst_id, containment FROM d
      |WHERE containment >= 0.8 ORDER BY src_id, dst_id""".stripMargin

  /** d17: the containment report run as a STREAMING INGEST — the
    * corpus arrives as parquet files (four arrival slices, one
    * micro-batch each), and every batch is scored against the
    * signature index the prior batches committed
    * ([[graft.streaming.DedupStream.containmentIngest]]: per-batch
    * pair partitions + index growth, crash-safe overwrite
    * discipline). The accumulated pair set is BATCH-SPLIT-INVARIANT
    * (each unordered pair emits exactly once, in the batch where its
    * later member arrives — DedupStream Scaladoc), so it equals the
    * batch [[graft.dedup.Dedup.minhashContainmentPairs]] answer on
    * the whole corpus, and the oracle is d15's: the EXACT directed
    * pair set (recall 1.0 on this corpus per the d15 hash match;
    * hashed-shingle counts injective, d07/d16's argument). At 100 TB
    * this is the ingest-time quote/inclusion monitor: O(batch) work
    * per round against stored signatures, never a corpus re-shingle.
    *
    * Cost-shape note (round 16): the d18 driver fast path does NOT
    * transfer here, by measurement. Three variants of lifting the
    * per-batch report to the driver were A/B'd at sf0.1 (3 warm reps
    * each, same box/JVM layout): limit-probe + local write 7.6 s,
    * cache+count+collect + local write 6.7 s, sequential two-action
    * writes 6.7 s — all WORSE than the shipped count + concurrent
    * writes (5.9 s best rep). d18's win came from removing a
    * distributed RESOLUTION stage (windows over the pair graph);
    * a report ingest has no such stage — the candidate join itself is
    * the cost, it already executes as broadcast joins with the batch
    * side built (plan read), and the concurrent pairs/index writes
    * genuinely overlap. d17's remaining premium over d18 is its
    * declared extras: bands=32 (2× band rows) and the mid-stream
    * compaction fold the oracle deliberately exercises. */
  def d17StreamContainment(s: SparkSession, d: String): DataFrame = {
    val base = tempDirCleanedOnExit("graft_d17")
    val idx = base.resolve("index").toString
    val pairsDir = base.resolve("pairs").toString
    val ckpt = base.resolve("ckpt").toString
    val docs = Tables.documents(s, d).select("doc_id", "text")
    // four arrival slices, one file each → one micro-batch per slice
    // under maxFilesPerTrigger=1 (batch order is the source's mtime
    // order; the answer is batch-split-invariant, so it does not
    // matter). The slice files are shared scaffolding — see
    // [[sharedArrivalSlices]].
    val in = sharedArrivalSlices(s, d, "docs", docs, "doc_id", 4)
    // compactEvery=2: batch 2's trigger folds the committed batch 0-1
    // index prefix mid-stream (the N-1 bound), so the small-files
    // lifecycle runs INSIDE an oracle-gated query — the fold must not
    // change the accumulated pair set (batch 3 reads the folded dir's
    // identical row set), and the d13 oracle hash-checks exactly that.
    val q = graft.streaming.DedupStream.containmentIngest(s, in,
      docs.schema, idx, pairsDir, ckpt, "doc_id", "text",
      n = 3, k = 64, bands = 32, threshold = 0.8,
      compactEvery = Some(2))
    try q.processAllAvailable() finally q.stop()
    // explicit schema: a batch with no containment hits writes an
    // empty partition dir, and an all-empty tree must still read
    val pairSchema = StructType(Seq(
      StructField("src_id", LongType), StructField("dst_id", LongType),
      StructField("containment", DoubleType)))
    s.read.schema(pairSchema).parquet(pairsDir)
      .select("src_id", "dst_id", "containment")
      .orderBy("src_id", "dst_id")
  }

  // oracle: the exact directed containment pairs (d13's construction —
  // the same oracle as d15, by batch-split invariance)
  val d17Sql: String = d13Sql

  /** d18: the streamed SURVIVOR dedup oracle-gated end to end — the
    * corpus arrives in four micro-batches
    * ([[graft.streaming.DedupStream.dedupIngest]]) and each batch
    * resolves to survivors against the index the PRIOR batches'
    * survivors committed: a batch doc whose near-dup cluster touches
    * an indexed doc drops (the indexed representative is kept), a
    * cluster of only-new docs keeps its minimum id. Unlike d17's pair
    * report this is NOT batch-split-invariant (similarity is not
    * transitive: with A~B, B~C, A≁C arriving in three batches, B
    * drops against A and C then SURVIVES — the one-shot cluster keeps
    * A alone), so the oracle SIMULATES the sequential rule over the
    * same deterministic batch assignment (doc_id % 4, the arrival
    * slices' split): per batch, a recursive-CTE reach closure over
    * the exact-Jaccard pairs restricted to edges touching that batch
    * (new-new, or new against a prior survivor), then the identical
    * keep-indexed-representative / min-new-id rule, unrolled for the
    * four batches. Exact pairs stand in for the shipped LSH pairs by
    * d07's hash-matched recall-1.0 equivalence (16×4 banding,
    * threshold 0.5 — the same configuration this ingest runs). At
    * 100 TB this is the arrival-time form of corpus dedup: O(batch)
    * signature hashing plus one band-bucket join against stored
    * signatures per round, never a corpus re-shingle. */
  def d18StreamDedup(s: SparkSession, d: String): DataFrame = {
    val base = tempDirCleanedOnExit("graft_d18")
    val idx = base.resolve("index").toString
    val pairsDir = base.resolve("pairs").toString
    val survDir = base.resolve("survivors").toString
    val ckpt = base.resolve("ckpt").toString
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val in = sharedArrivalSlices(s, d, "docs", docs, "doc_id", 4)
    val q = graft.streaming.DedupStream.dedupIngest(s, in, docs.schema,
      idx, pairsDir, survDir, ckpt, "doc_id", "text",
      n = 3, k = 64, bands = 16, threshold = 0.5, maxFilesPerTrigger = 1)
    try q.processAllAvailable() finally q.stop()
    // explicit schema: a batch where every doc dropped writes an empty
    // partition dir, and the tree must still read (d17's discipline)
    val survSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    s.read.schema(survSchema).parquet(survDir)
      .select("doc_id", "text")
      .orderBy("doc_id")
  }

  /** The d18 oracle: sequential survivor simulation, one CTE block per
    * batch (edges touching the batch → reach closure → has-old +
    * min-new-id rule), chained through the accumulated survivor set.
    * Every non-recursive CTE is MATERIALIZED: s3 references s2 four
    * times, s2 references s1 four times, … — inlined, the Σdf²
    * shingle-pair join re-evaluates O(4⁴) times and the sf0.1 oracle
    * runs for >9 min; materialized it runs once per CTE (2.5 s). */
  val d18Sql: String = {
    def batchCtes(k: Int): String = {
      val prev = if (k == 0) "s_init" else s"s${k - 1}"
      s"""e$k AS MATERIALIZED (
         |  SELECT a, bb FROM (
         |    SELECT a_id AS a, b_id AS bb FROM pe
         |    UNION ALL SELECT b_id, a_id FROM pe) u
         |  WHERE (u.a % 4 = $k AND u.bb % 4 = $k)
         |     OR (u.a % 4 = $k AND u.bb IN (SELECT doc_id FROM $prev))
         |     OR (u.bb % 4 = $k AND u.a IN (SELECT doc_id FROM $prev))),
         |r$k AS (
         |  SELECT a, bb FROM e$k
         |  UNION
         |  SELECT r.a, e.bb FROM r$k r JOIN e$k e ON r.bb = e.a
         |  WHERE e.bb <> r.a),
         |m$k AS MATERIALIZED (
         |  SELECT d.doc_id AS id,
         |    least(d.doc_id, coalesce(min(CASE WHEN r.bb % 4 = $k
         |      THEN r.bb END), d.doc_id)) AS minnew,
         |    max(CASE WHEN r.bb IN (SELECT doc_id FROM $prev)
         |      THEN 1 ELSE 0 END) AS hasold
         |  FROM (SELECT doc_id FROM documents WHERE doc_id % 4 = $k) d
         |  LEFT JOIN r$k r ON r.a = d.doc_id
         |  GROUP BY d.doc_id),
         |s$k AS MATERIALIZED (
         |  SELECT doc_id FROM $prev
         |  UNION ALL
         |  SELECT id AS doc_id FROM m$k
         |  WHERE id = minnew AND coalesce(hasold, 0) = 0)""".stripMargin
    }
    s"""WITH RECURSIVE tok AS MATERIALIZED (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
       |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
       |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
       |        FROM documents)),
       |cnt AS MATERIALIZED (SELECT doc_id, len(sh) AS n FROM tok),
       |pairs AS MATERIALIZED (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
       |  FROM (SELECT doc_id, unnest(sh) AS s FROM tok) a
       |  JOIN (SELECT doc_id, unnest(sh) AS s FROM tok) b
       |    ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pe AS MATERIALIZED (
       |  SELECT a_id, b_id
       |  FROM pairs JOIN cnt ca ON ca.doc_id = a_id JOIN cnt cb ON cb.doc_id = b_id
       |  WHERE inter/(ca.n + cb.n - inter) >= 0.5),
       |s_init AS MATERIALIZED (SELECT doc_id FROM documents WHERE 1=0),
       |${batchCtes(0)},
       |${batchCtes(1)},
       |${batchCtes(2)},
       |${batchCtes(3)}
       |SELECT d.doc_id, d.text FROM documents d JOIN s3 ON d.doc_id = s3.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** d19: the EMBEDDING near-dup relation run as a STREAMING INGEST —
    * the fourth and last dedup family's ingest-time path (minhash →
    * d18, containment → d17, image/64-bit signatures → m13; this is
    * d05/d12's cosine relation): embedding files arrive in four
    * slices, each batch's vectors get their portable-LSH block key
    * (d12's bucket — a pure per-row function of the vector, so the
    * accumulated pair set is BATCH-SPLIT-INVARIANT: one block per
    * row, each pair emitted exactly once, where its later member
    * arrives), and near-dup pairs touching the batch come from one
    * block join whose right side is the batch
    * ([[graft.streaming.DedupStream.processEmbeddingBatch]]). At
    * 100 TB this is the ingest-time semantic near-dup monitor:
    * O(batch) hashing plus one block join against stored vectors per
    * round. Oracle: the one-shot intra-bucket cosine self-join (d12's
    * candidate construction emitting pairs — DuckDB reproduces every
    * bucket bit-for-bit and the cosine prune numerically). */
  def d19StreamEmbeddingNeardup(s: SparkSession, d: String): DataFrame = {
    val base = tempDirCleanedOnExit("graft_d19")
    val idx = base.resolve("index").toString
    val pairsDir = base.resolve("pairs").toString
    val ckpt = base.resolve("ckpt").toString
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val in = sharedArrivalSlices(s, d, "emb", emb, "vec_id", 4)
    val q = graft.streaming.DedupStream.embeddingIngest(s, in, emb.schema,
      idx, pairsDir, ckpt, "vec_id", "embedding",
      v => Ann.portableLshBucket(v, nBits = 6, dim = 64), threshold = 0.4)
    try q.processAllAvailable() finally q.stop()
    val pairSchema = StructType(Seq(
      StructField("a_id", LongType), StructField("b_id", LongType)))
    s.read.schema(pairSchema).parquet(pairsDir)
      .select("a_id", "b_id")
      .orderBy("a_id", "b_id")
  }

  val d19Sql: String = {
    val (q, bits) = duckLshBucket(nBits = 6, dim = 64)
    s"""WITH b AS (
       |  SELECT vec_id, embedding,
       |  $bits AS bucket
       |  FROM (SELECT vec_id, embedding, $q AS q FROM embeddings))
       |SELECT a.vec_id AS a_id, b2.vec_id AS b_id
       |FROM b a JOIN b b2
       |  ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
       |        CAST(b2.embedding AS DOUBLE[])) >= 0.4
       |ORDER BY a_id, b_id""".stripMargin
  }

  /** d20: the RETIRE-AND-RE-INGEST lifecycle oracle-gated end to end —
    * the operation the `…FromIndexes` re-ingest contract requires
    * ("retire the old index row first") and the right-to-erasure /
    * re-crawl path a 100 TB ingest needs. On a half-corpus
    * (doc_id % 2 = 0), two survivor-dedup micro-batches commit
    * ([[graft.streaming.DedupStream.processBatch]], the d18 rule),
    * the committed index prefix is COMPACTED
    * ([[graft.streaming.DedupStream.compactIndex]] — retire must work
    * on a folded tree), every doc with doc_id % 10 = 0 is RETIRED
    * from the index AND survivor trees
    * ([[graft.streaming.DedupStream.retireIds]]), and batch 2
    * re-sends exactly those docs: ids % 20 = 0 arrive MODIFIED (text
    * replaced by a per-id unique token string — no shingle shared
    * with anything, so they re-enter pair-free and survive), ids
    * % 20 = 10 arrive with their ORIGINAL text (identical signatures,
    * so the d18 exact-Jaccard ≡ LSH equivalence carries verbatim) and
    * re-score against the post-retire survivor index. The oracle
    * extends d18's sequential-survivor CTE: two batch blocks, the
    * retire filter, then a third block whose edges are restricted to
    * original-text re-sent docs and post-retire survivors (modified
    * docs provably contribute no edges — their trigrams embed the
    * doc_id), and whose kept set re-enters with the batch-2 text.
    * PAIRS ARE HISTORY under retire (the d20 semantics pinned by
    * spec); the survivor STATE recomputes forward, which is what this
    * query hash-checks. */
  def d20RetireReingest(s: SparkSession, d: String): DataFrame = {
    val base = tempDirCleanedOnExit("graft_d20")
    val idx = base.resolve("index").toString
    val pairsDir = base.resolve("pairs").toString
    val survDir = base.resolve("survivors").toString
    val docs = Tables.documents(s, d).select("doc_id", "text")
      .filter(col("doc_id") % 2 === 0)
    def send(batch: DataFrame, id: Long): Unit =
      graft.streaming.DedupStream.processBatch(batch, id, idx, pairsDir,
        survDir, "doc_id", "text", n = 3, k = 64, bands = 16,
        threshold = 0.5)
    // two arrival batches (the batch-mode entry point — d18 covers the
    // streamed wrapper; d20's new surface is the maintenance lifecycle)
    send(docs.filter(col("doc_id") % 4 === 0), 0L)
    send(docs.filter(col("doc_id") % 4 === 2), 1L)
    // fold the committed prefix, then retire on the FOLDED tree
    graft.streaming.DedupStream.compactIndex(s, idx, upToBatch = 1L)
    val retire = docs.filter(col("doc_id") % 10 === 0).select("doc_id")
    graft.streaming.DedupStream.retireIds(s, idx, retire, "doc_id")
    graft.streaming.DedupStream.retireIds(s, survDir, retire, "doc_id")
    // re-send the retired ids: % 20 = 0 modified, % 20 = 10 original
    send(docs.filter(col("doc_id") % 10 === 0)
      .withColumn("text", when(col("doc_id") % 20 === 0,
        concat_ws(" ", lit("zzrev0"), lit("zzrev1"),
          col("doc_id").cast(StringType), lit("zzrev2"), lit("zzrev3")))
        .otherwise(col("text"))), 2L)
    val survSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    s.read.schema(survSchema).parquet(survDir)
      .select("doc_id", "text")
      .orderBy("doc_id")
  }

  /** The d20 oracle: d18's sequential-survivor simulation restricted
    * to the half-corpus, two batch blocks (% 4 = 0, % 4 = 2), the
    * retire filter (% 10 = 0 removed from the accumulated survivor
    * set — compaction is a pure relayout and needs no oracle-side
    * counterpart), then the re-ingest block: edges touch only
    * original-text re-sent docs (% 20 = 10) and post-retire survivors
    * — modified docs (% 20 = 0) share no trigram with anything (every
    * replacement trigram embeds the doc_id), so they are pair-free by
    * construction and always re-survive with the replacement text. */
  val d20Sql: String = {
    // one sequential batch block (d18's construction, parametrized by
    // the is-new predicate): edges touching the batch → reach closure
    // → has-old + min-new-id rule → accumulated survivor set
    def block(k: Int, isNew: String => String, prev: String): String =
      s"""e$k AS MATERIALIZED (
         |  SELECT a, bb FROM (
         |    SELECT a_id AS a, b_id AS bb FROM pe
         |    UNION ALL SELECT b_id, a_id FROM pe) u
         |  WHERE (${isNew("u.a")} AND ${isNew("u.bb")})
         |     OR (${isNew("u.a")} AND u.bb IN (SELECT doc_id FROM $prev))
         |     OR (${isNew("u.bb")} AND u.a IN (SELECT doc_id FROM $prev))),
         |r$k AS (
         |  SELECT a, bb FROM e$k
         |  UNION
         |  SELECT r.a, e.bb FROM r$k r JOIN e$k e ON r.bb = e.a
         |  WHERE e.bb <> r.a),
         |m$k AS MATERIALIZED (
         |  SELECT d.doc_id AS id,
         |    least(d.doc_id, coalesce(min(CASE WHEN ${isNew("r.bb")}
         |      THEN r.bb END), d.doc_id)) AS minnew,
         |    max(CASE WHEN r.bb IN (SELECT doc_id FROM $prev)
         |      THEN 1 ELSE 0 END) AS hasold
         |  FROM (SELECT doc_id FROM documents
         |        WHERE doc_id % 2 = 0 AND ${isNew("doc_id")}) d
         |  LEFT JOIN r$k r ON r.a = d.doc_id
         |  GROUP BY d.doc_id),
         |s$k AS MATERIALIZED (
         |  SELECT doc_id FROM $prev
         |  UNION ALL
         |  SELECT id AS doc_id FROM m$k
         |  WHERE id = minnew AND coalesce(hasold, 0) = 0)""".stripMargin
    s"""WITH RECURSIVE tok AS MATERIALIZED (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
       |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
       |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
       |        FROM documents WHERE doc_id % 2 = 0)),
       |cnt AS MATERIALIZED (SELECT doc_id, len(sh) AS n FROM tok),
       |pairs AS MATERIALIZED (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
       |  FROM (SELECT doc_id, unnest(sh) AS s FROM tok) a
       |  JOIN (SELECT doc_id, unnest(sh) AS s FROM tok) b
       |    ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pe AS MATERIALIZED (
       |  SELECT a_id, b_id
       |  FROM pairs JOIN cnt ca ON ca.doc_id = a_id JOIN cnt cb ON cb.doc_id = b_id
       |  WHERE inter/(ca.n + cb.n - inter) >= 0.5),
       |s_init AS MATERIALIZED (SELECT doc_id FROM documents WHERE 1=0),
       |${block(0, c => s"$c % 4 = 0", "s_init")},
       |${block(1, c => s"$c % 4 = 2", "s0")},
       |s1r AS MATERIALIZED (SELECT doc_id FROM s1 WHERE doc_id % 10 <> 0),
       |${block(2, c => s"$c % 20 = 10", "s1r")},
       |mod2 AS MATERIALIZED (
       |  SELECT doc_id FROM documents WHERE doc_id % 20 = 0)
       |SELECT s.doc_id, d.text
       |FROM s1r s JOIN documents d ON d.doc_id = s.doc_id
       |UNION ALL
       |SELECT k.doc_id, d.text
       |FROM (SELECT doc_id FROM s2 EXCEPT SELECT doc_id FROM s1r) k
       |JOIN documents d ON d.doc_id = k.doc_id
       |UNION ALL
       |SELECT doc_id,
       |  'zzrev0 zzrev1 ' || CAST(doc_id AS VARCHAR) || ' zzrev2 zzrev3'
       |  AS text
       |FROM mod2
       |ORDER BY doc_id""".stripMargin
  }

  /** Arrival-slice scaffolding shared per fixture: the parquet files
    * that SIMULATE corpus arrival for the streaming-ingest queries
    * (d17, s13). Writing them is corpus ARRIVAL, not operator work
    * (the m10 rationale in Bench.scala — the bench prices the ingest,
    * not the simulation of the outside world delivering files), so
    * they are built once per fixture and reused. Each file's mtime is
    * forced to a distinct increasing second: the file source triggers
    * oldest-first, so batch i = slice i deterministically on every
    * reuse (s13's quantizer trains on batch 0; d17 is split-invariant
    * and does not care). */
  private val arrivalShared =
    new java.util.concurrent.ConcurrentHashMap[String, String]
  private def sharedArrivalSlices(s: SparkSession, d: String, key: String,
      df: => DataFrame, idCol: String, slices: Int): String =
    arrivalShared.computeIfAbsent(s"$d#$key", _ => {
      val dir = tempDirCleanedOnExit(s"graft_arrival_$key")
      val in = dir.resolve("in")
      java.nio.file.Files.createDirectories(in)
      (0 until slices).foreach { i =>
        val stage = dir.resolve(s"stage$i").toString
        df.filter(pmod(col(idCol), lit(slices)) === i)
          .coalesce(1).write.parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dest = in.resolve(f"round_$i%03d.parquet")
        java.nio.file.Files.move(part.toPath, dest)
        java.nio.file.Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime
            .fromMillis(1700000000000L + i * 1000L))
      }
      in.toString
    })

  /** Temp trees built by streaming-ingest queries must outlive the
    * call (the returned DataFrame reads them lazily), so cleanup is a
    * JVM shutdown hook — the ParityQueries p11/p15 pattern. */
  private def tempDirCleanedOnExit(prefix: String): java.nio.file.Path =
    graft.core.TempDirs.cleanedOnExit(prefix)

  /** d14: overlapping duplicated-n-gram span removal — every 5-token
    * window shared by ≥ 2 distinct documents is scrubbed from all of
    * them ([[graft.dedup.Dedup.substringDedup]]); the cleaned text is
    * rebuilt end to end, so the oracle pins window extraction,
    * distinct-doc detection, coverage union, AND reconstruction. */
  def d14SubstringDedup(s: SparkSession, d: String): DataFrame =
    Dedup.substringDedup(Tables.documents(s, d), "doc_id", "text",
        width = 5)
      .orderBy("doc_id")

  val d14Sql: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents),
      |g0 AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 4)) AS i FROM t),
      |g AS (SELECT doc_id, i, array_to_string(w[i : i + 4], ' ') AS gram FROM g0),
      |dup AS (SELECT gram FROM g GROUP BY gram HAVING min(doc_id) <> max(doc_id)),
      |hits AS (SELECT g.doc_id, g.i FROM g JOIN dup USING (gram)),
      |cov AS (SELECT DISTINCT doc_id, p FROM (
      |  SELECT doc_id, unnest(generate_series(i, i + 4)) AS p FROM hits)),
      |tokp AS (SELECT doc_id, unnest(w) AS tok,
      |         unnest(generate_series(1, len(w))) AS p FROM t),
      |surv AS (SELECT tokp.doc_id, tokp.p, tokp.tok
      |  FROM tokp LEFT JOIN cov ON tokp.doc_id = cov.doc_id AND tokp.p = cov.p
      |  WHERE cov.p IS NULL),
      |reb AS (SELECT doc_id, array_to_string(list(tok ORDER BY p), ' ') AS clean_text
      |  FROM surv GROUP BY doc_id),
      |nr AS (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id)
      |SELECT t.doc_id, coalesce(reb.clean_text, '') AS clean_text,
      |  CAST(coalesce(nr.n_removed, 0) AS BIGINT) AS n_removed
      |FROM t LEFT JOIN reb ON t.doc_id = reb.doc_id
      |       LEFT JOIN nr ON t.doc_id = nr.doc_id
      |ORDER BY t.doc_id""".stripMargin

  /** d06: duplicate clusters — connected components over the exact
    * near-dup pair graph; every doc labeled with its cluster root.
    * Oracle: recursive-CTE transitive closure over the same pairs. */
  def d06DupClusters(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
    Dedup.duplicateClusters(docs, "doc_id", pairs)
      .orderBy("id")
  }

  val d06Sql: String =
    """WITH RECURSIVE tok AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |        FROM documents)),
      |cnt AS (SELECT doc_id, len(sh) AS n FROM tok),
      |p AS (
      |  SELECT a_id, b_id FROM (
      |    SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
      |    FROM (SELECT doc_id, unnest(sh) AS s FROM tok) a
      |    JOIN (SELECT doc_id, unnest(sh) AS s FROM tok) b
      |      ON a.s = b.s AND a.doc_id < b.doc_id
      |    GROUP BY 1, 2) j
      |  JOIN cnt ca ON ca.doc_id = a_id JOIN cnt cb ON cb.doc_id = b_id
      |  WHERE inter/(ca.n + cb.n - inter) >= 0.5),
      |edges AS (SELECT a_id AS a, b_id AS b FROM p
      |          UNION SELECT b_id, a_id FROM p),
      |reach AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
      |  WHERE e.b <> r.a)
      |SELECT d.doc_id AS id,
      |  least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS root
      |FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
      |GROUP BY d.doc_id ORDER BY id""".stripMargin

  // ------------------------------------------------------------- text

  /** t05: cleaning/normalization — whitespace collapse, digit
    * redaction, lowercasing: the standard pre-tokenization scrub. */
  def t05Clean(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        lower(regexp_replace(
          regexp_replace(trim(col("text")), "[0-9]+", "<num>"),
          "\\s+", " ")).as("clean_text"))
      .orderBy("doc_id")

  val t05Sql: String =
    """SELECT doc_id,
      |  lower(regexp_replace(regexp_replace(trim(text), '[0-9]+', '<num>', 'g'),
      |        '\s+', ' ', 'g')) AS clean_text
      |FROM documents ORDER BY doc_id""".stripMargin

  /** t01: language ID (stopword-profile heuristic) + distribution. */
  def t01LangId(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), TextOps.langId(col("text")).as("pred_lang"))
      .orderBy("doc_id")

  val t01Sql: String =
    """SELECT doc_id,
      |  CASE WHEN len(list_filter(list_filter(string_split(text,' '), x -> x <> ''),
      |              t -> t IN ('the','a','of','and','in','to','is')))
      |       / len(list_filter(string_split(text,' '), x -> x <> '')) >= 0.05
      |       THEN 'en' ELSE 'und' END AS pred_lang
      |FROM documents ORDER BY doc_id""".stripMargin

  /** t02: quality metrics battery per document. */
  def t02Quality(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
        col("doc_id"),
        length(col("text")).cast(LongType).as("n_chars"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.subwordCount(col("text")).as("n_subwords"),
        TextOps.stopwordRatio(col("text")).as("stopword_ratio"),
        TextOps.distinctRatio(col("text")).as("distinct_ratio"),
        TextOps.meanTokenLen(col("text")).as("mean_token_len"),
        TextOps.qualityScore(col("text")).as("quality_score"))
      .orderBy("doc_id")

  /** The ONE rendering of the quality-metric CTEs (`t`, `m`) — shared
    * by the t02 battery and the c15 curriculum oracle (duckHash
    * discipline for the determinism-critical ratio expressions). */
  private val duckQualityCtes: String =
    """WITH t AS (
      |  SELECT doc_id, length(text) AS n_chars, text,
      |         list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents),
      |m AS (
      |  SELECT doc_id, n_chars, text, len(w) AS n_tokens,
      |    CASE WHEN len(w) > 0 THEN
      |      len(list_filter(w, x -> x IN ('the','a','of','and','in','to','is'))) / len(w)
      |      ELSE 0.0 END AS stopword_ratio,
      |    CASE WHEN len(w) > 0 THEN len(list_distinct(w)) / len(w)
      |      ELSE 0.0 END AS distinct_ratio,
      |    CASE WHEN len(w) > 0 THEN
      |      list_sum(list_transform(w, x -> length(x))) / len(w)
      |      ELSE 0.0 END AS mean_token_len
      |  FROM t)""".stripMargin

  /** The quality-score formula over `m`'s columns — rendered once. */
  private val duckQualityScore: String =
    """stopword_ratio * 0.4 + distinct_ratio * 0.4 +
      |    (CASE WHEN mean_token_len >= 3.0 AND mean_token_len <= 10.0
      |          THEN 0.2 ELSE 0.0 END)""".stripMargin

  val t02Sql: String =
    s"""$duckQualityCtes
      |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
      |  CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+'))
      |     + len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT)
      |    AS n_subwords,
      |  stopword_ratio, distinct_ratio,
      |  CAST(mean_token_len AS DOUBLE) AS mean_token_len,
      |  $duckQualityScore AS quality_score
      |FROM m ORDER BY doc_id""".stripMargin

  /** t03: document fingerprint (polynomial rolling hash, exact). */
  def t03Fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  val t03Sql: String =
    """SELECT doc_id,
      |  CAST(list_reduce(
      |    list_prepend(0, list_transform(
      |      list_filter(string_split(text, ' '), x -> x <> ''),
      |      x -> length(x)*31 + ascii(x))),
      |    (acc, x) -> (acc*31 + x) % 1000000007) AS BIGINT) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** t04: corpus roll-up by language — token totals and mean quality. */
  def t04CorpusStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), TextOps.tokenCount(col("text")).as("n_tokens"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"))
      .orderBy("lang")

  val t04Sql: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(len(list_filter(string_split(text,' '), x -> x <> ''))) AS BIGINT)
      |    AS total_tokens
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // -------------------------------------------------------- similarity

  /** s01: exact brute-force cosine top-5 for query vectors vec_id<10.
    * Output is rank-only (no float column) — rankings agree across
    * engines because score gaps (~1e-3) dwarf fp noise (~1e-15). */
  def s01AnnBruteForce(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Ann.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", k = 5)
      .orderBy("query_id", "rank")
  }

  val s01Sql: String =
    """SELECT query_id, neighbor_id, rank FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |               CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS BIGINT) AS rank
      |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      |  WHERE q.vec_id < 10)
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** s02: IVF-style top-3 within the query's coarse cell (label). */
  def s02AnnIvf(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Ann.ivfTopK(emb, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", "label", k = 3)
      .orderBy("query_id", "rank")
  }

  val s02Sql: String =
    """SELECT query_id, neighbor_id, rank FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |               CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS BIGINT) AS rank
      |  FROM embeddings q JOIN embeddings c
      |    ON q.label = c.label AND q.vec_id <> c.vec_id
      |  WHERE q.vec_id < 10)
      |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** s11: recall@k evaluation — the IVF index (s02's cell-restricted
    * search, k=5) measured against the exact answer (s01's brute
    * force, k=5) per query: the standard ANN quality gate, computed
    * in-engine. Integer-exact ppm recall; the oracle recomputes both
    * result sets and the overlap. */
  def s11AnnRecall(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val queries = emb.filter(col("vec_id") < 10)
    Ann.recallAtK(
        Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5),
        Ann.ivfTopK(emb, queries, "vec_id", "embedding", "label", k = 5))
      .orderBy("query_id")
  }

  val s11Sql: String =
    """WITH exact AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                 CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
      |    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      |    WHERE q.vec_id < 10)
      |  WHERE rank <= 5),
      |approx AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                 CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
      |    FROM embeddings q JOIN embeddings c
      |      ON q.label = c.label AND q.vec_id <> c.vec_id
      |    WHERE q.vec_id < 10)
      |  WHERE rank <= 5),
      |hit AS (SELECT e.query_id, COUNT(*) AS n_hit
      |  FROM exact e JOIN approx a
      |    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
      |  GROUP BY e.query_id),
      |ne AS (SELECT query_id, COUNT(*) AS n_exact FROM exact
      |  GROUP BY query_id)
      |SELECT ne.query_id, ne.n_exact,
      |  CAST(coalesce(hit.n_hit, 0) AS BIGINT) AS n_hit,
      |  (coalesce(hit.n_hit, 0) * 1000000) // ne.n_exact AS recall_ppm
      |FROM ne LEFT JOIN hit USING (query_id)
      |ORDER BY query_id""".stripMargin

  /** s03: LSH-bucketed ANN as a FULL oracle twin of the
    * bucket → bucket-join → rank pipeline ([[Ann.portableLshTopK]]):
    * integer-hyperplane buckets (s06's coefficients) and exact integer
    * squared-L2 ranking over the quantized vectors, so DuckDB
    * reproduces every neighbor, rank and distance bit-for-bit. The
    * xxhash64-hyperplane production signature stays
    * [[Ann.lshSignature]] (spec-pinned); s06 pins the bucket values,
    * this pins the whole search. */
  def s03AnnLsh(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Ann.portableLshTopK(emb, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", dim = 64, nBits = 8, k = 5)
      .orderBy("query_id", "rank")
  }

  val s03Sql: String = {
    val (q, bits) = duckLshBucket(nBits = 8, dim = 64)
    s"""WITH b AS (
       |  SELECT vec_id, q,
       |  $bits AS bucket
       |  FROM (SELECT vec_id, $q AS q FROM embeddings)),
       |j AS (
       |  SELECT qq.vec_id AS query_id, cc.vec_id AS neighbor_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, 65),
       |        i -> (qq.q[i] - cc.q[i]) * (qq.q[i] - cc.q[i]))),
       |      (acc, x) -> acc + x) AS d2
       |  FROM b qq JOIN b cc
       |    ON qq.bucket = cc.bucket AND qq.vec_id <> cc.vec_id
       |  WHERE qq.vec_id < 10),
       |r AS (
       |  SELECT query_id, neighbor_id, d2,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY d2, neighbor_id) AS rank
       |  FROM j)
       |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, d2
       |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** s04: trained IVF as a FULL oracle twin of the
    * train → assign → cell-restricted-rank pipeline
    * ([[Ann.portableIvfExactTopK]]): coarse cells from the portable
    * integer k-means trainer (s09's machinery, same salt/params so the
    * oracle shares its CTEs), exact integer argmin assignment for
    * corpus and queries, exact integer squared-L2 ranking within the
    * query's cell. The float VectorMean-trained path stays
    * [[Ann.ivfTrainedTopK]] (merge-order-sensitive floats; spec-tested
    * nprobe/recall properties in AnnSpec). */
  def s04AnnIvfTrained(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Ann.portableIvfExactTopK(emb, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", dim = 64, cells = 8, iters = 2, topK = 3)
      .orderBy("query_id", "rank")
  }

  /** t06: repetitiousness — fraction of word 2-gram occurrences that
    * repeat an earlier 2-gram (Gopher-style boilerplate/spam signal). */
  def t06Repetition(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        TextOps.repetitionRatio(col("text")).as("rep_ratio"))
      .orderBy("doc_id")

  val t06Sql: String =
    """SELECT doc_id,
      |  CASE WHEN len(w) - 1 > 0 THEN
      |    1.0 - len(list_distinct(list_transform(range(1, len(w)),
      |            i -> w[i] || ' ' || w[i+1]))) / (len(w) - 1)
      |  ELSE 0.0 END AS rep_ratio
      |FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** t07: PII redaction — emails, IPv4s, phone-like digit runs →
    * typed placeholders. The oracle runs the identical RE2-safe
    * patterns through DuckDB, pinning cross-dialect regex behavior on
    * the full corpus. */
  def t07RedactPii(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), TextOps.redactPii(col("text")).as("redacted"))
      .orderBy("doc_id")

  val t07Sql: String =
    s"""SELECT doc_id,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '${TextOps.EmailRe}', '<email>', 'g'),
       |    '${TextOps.Ipv4Re}', '<ip>', 'g'),
       |    '${TextOps.PhoneRe}', '<phone>', 'g') AS redacted
       |FROM documents ORDER BY doc_id""".stripMargin

  /** t08: mean global token frequency per document — the cheap
    * commonness/quality proxy (rare-token-heavy = noisy, ubiquitous-
    * token-heavy = boilerplate); two hash aggs + one token join, no
    * vocabulary-wide sort. */
  def t08TokenFreq(s: SparkSession, d: String): DataFrame =
    graft.corpus.Selection
      .tokenFrequencyScore(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id")

  val t08Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
      |    x -> x <> '')) AS w
      |  FROM documents),
      |v AS (SELECT w, COUNT(*) AS freq FROM tok GROUP BY w)
      |SELECT t.doc_id, COUNT(*) AS n_tokens,
      |  CAST(SUM(v.freq) AS BIGINT) AS sum_freq,
      |  CAST(CAST(SUM(v.freq) AS BIGINT) AS DOUBLE) /
      |    CAST(COUNT(*) AS DOUBLE) AS mean_freq
      |FROM tok t JOIN v USING (w)
      |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin

  /** t09: NFC normalization through the native kernel, DuckDB's
    * nfc_normalize as the oracle. The synthetic corpus is ASCII (NFC
    * is the identity there — the hash pins the plumbing and the
    * non-mangling); the combining-sequence semantics are pinned by
    * UnicodeNormalizeSpec's planted unicode. */
  def t09Normalize(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        graft.functions.UnicodeFunctions.nfcNormalize(col("text")).as("norm"),
        length(graft.functions.UnicodeFunctions.nfcNormalize(col("text")))
          .cast(LongType).as("n_chars"))
      .orderBy("doc_id")

  val t09Sql: String =
    """SELECT doc_id, nfc_normalize(text) AS norm,
      |  CAST(len(nfc_normalize(text)) AS BIGINT) AS n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** t10: supervised linear quality/class classifier, trained AND
    * applied in-engine (the GPT-3/CCNet recipe: learn a cheap linear
    * model that recognizes a reference class, score the whole corpus
    * with it). Supervision here is the `lang = 'en'` label; features
    * are distinct unigrams; weights are the integer class-frequency
    * contrast `cp·Nn − cn·Np` (sign-equal to the NB log-odds, exact in
    * any engine — the production log-odds path is spec-pinned in
    * SelectionSpec). Every weight, margin, and prediction is
    * hash-matched by DuckDB. */
  def t10Classifier(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val weights = Selection.classifierWeights(
      docs.withColumn("is_en", col("lang") === "en"),
      "doc_id", "text", "is_en", logOdds = false)
    Selection.classifierScore(docs, weights, "doc_id", "text")
      .orderBy("doc_id")
  }

  val t10Sql: String =
    """WITH lab AS (
      |  SELECT doc_id, (lang = 'en') AS y,
      |    list_distinct(list_filter(string_split(text, ' '),
      |      x -> x <> '')) AS toks
      |  FROM documents),
      |tok AS (SELECT doc_id, y, unnest(toks) AS token FROM lab),
      |tot AS (SELECT SUM(CASE WHEN y THEN 1 ELSE 0 END) AS np,
      |               SUM(CASE WHEN NOT y THEN 1 ELSE 0 END) AS nn
      |        FROM lab),
      |cnt AS (SELECT token,
      |    SUM(CASE WHEN y THEN 1 ELSE 0 END) AS cp,
      |    SUM(CASE WHEN NOT y THEN 1 ELSE 0 END) AS cn
      |  FROM tok GROUP BY token),
      |w AS (SELECT token, cp * nn - cn * np AS w FROM cnt, tot),
      |sc AS (SELECT t.doc_id, COUNT(*) AS n_feat, SUM(w.w) AS score
      |  FROM tok t JOIN w USING (token) GROUP BY t.doc_id)
      |SELECT d.doc_id,
      |  CAST(coalesce(sc.n_feat, 0) AS BIGINT) AS n_feat,
      |  CAST(coalesce(sc.score, 0) AS BIGINT) AS score,
      |  CAST(CASE WHEN coalesce(sc.score, 0) > 0 THEN 1 ELSE 0 END
      |    AS INT) AS predicted
      |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** t11: TF-IDF keyword extraction — top-3 tokens per document by
    * the hash-portable rational score (tf·1e6 div df; the classic
    * tf·ln(N/df) path is spec-pinned), ties by token. The per-doc
    * top-k plans as a bounded-heap WindowGroupLimit (doc-cardinality
    * partition key), never a whole-group sort. */
  def t11Tfidf(s: SparkSession, d: String): DataFrame =
    Selection.tfidfTopK(Tables.documents(s, d), "doc_id", "text",
        k = 3, logIdf = false)
      .withColumn("rank", col("rank").cast(LongType))
      .orderBy("doc_id", "rank")

  val t11Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
      |    x -> x <> '')) AS token
      |  FROM documents),
      |tfq AS (SELECT doc_id, token, COUNT(*) AS tf
      |  FROM tok GROUP BY doc_id, token),
      |dfq AS (SELECT token, COUNT(*) AS df FROM tfq GROUP BY token),
      |ranked AS (SELECT tfq.doc_id, tfq.token, tfq.tf, dfq.df,
      |    (tfq.tf * 1000000) // dfq.df AS score,
      |    row_number() OVER (PARTITION BY tfq.doc_id
      |      ORDER BY (tfq.tf * 1000000) // dfq.df DESC, tfq.token)
      |      AS rank
      |  FROM tfq JOIN dfq USING (token))
      |SELECT doc_id, token, tf, df, score, CAST(rank AS BIGINT) AS rank
      |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  /** t12: the Gopher repetition battery t06 doesn't cover — the
    * most frequent 2-gram (count + the fraction of document
    * characters its occurrences cover, capped at 1) and the
    * duplicated-3-gram occurrence fraction. All MAP-ONLY: the argmax
    * is an in-row sort + run-length fold ([[TextOps.topNgram]]), so
    * the whole battery runs inside the scan's codegen span — no
    * explode, no per-doc shuffle at any corpus size. Integer ppm
    * arithmetic both engines; gram ties break lexicographically. */
  def t12TopNgram(s: SparkSession, d: String): DataFrame = {
    val top2 = TextOps.topNgram(col("text"), 2)
    val total2 = greatest(
      size(TextOps.tokens(col("text"))) - 1, lit(0)).cast(LongType)
    val total3 = greatest(
      size(TextOps.tokens(col("text"))) - 2, lit(0)).cast(LongType)
    val distinct3 = size(TextOps.shingles(col("text"), 3)).cast(LongType)
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        top2.getField("cnt").as("top2_cnt"),
        top2.getField("gram").as("top2_gram"),
        total2.as("total2"), total3.as("total3"), distinct3.as("distinct3"))
      .select(col("doc_id"), col("top2_cnt"), col("top2_gram"),
        col("total2"),
        when(col("total2") > 0,
          expr("top2_cnt * 1000000 DIV total2")).otherwise(lit(0L))
          .as("top2_ppm"),
        when(length(col("text")) > 0,
          least(lit(1000000L),
            expr("top2_cnt * length(top2_gram) * 1000000 DIV length(text)")))
          .otherwise(lit(0L)).as("top2_char_ppm"),
        when(col("total3") > 0,
          expr("(total3 - distinct3) * 1000000 DIV total3"))
          .otherwise(lit(0L)).as("dup3_ppm"))
      .orderBy("doc_id")
  }

  val t12Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, text,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents),
      |g2 AS (SELECT doc_id,
      |    unnest(list_transform(range(1, len(w)),
      |      i -> w[i] || ' ' || w[i+1])) AS gram
      |  FROM tok),
      |c2 AS (SELECT doc_id, gram, COUNT(*) AS cnt
      |  FROM g2 GROUP BY doc_id, gram),
      |top AS (SELECT doc_id, gram, cnt,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY cnt DESC, gram) AS rn
      |  FROM c2),
      |base AS (SELECT doc_id, text,
      |    greatest(len(w) - 1, 0) AS total2,
      |    greatest(len(w) - 2, 0) AS total3,
      |    len(list_distinct(list_transform(range(1, len(w) - 1),
      |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS distinct3
      |  FROM tok)
      |SELECT b.doc_id,
      |  CAST(coalesce(t.cnt, 0) AS BIGINT) AS top2_cnt,
      |  coalesce(t.gram, '') AS top2_gram,
      |  CAST(b.total2 AS BIGINT) AS total2,
      |  CAST(CASE WHEN b.total2 > 0
      |    THEN (coalesce(t.cnt, 0) * 1000000) // b.total2
      |    ELSE 0 END AS BIGINT) AS top2_ppm,
      |  CAST(CASE WHEN len(b.text) > 0
      |    THEN least(1000000, (coalesce(t.cnt, 0) *
      |      len(coalesce(t.gram, '')) * 1000000) // len(b.text))
      |    ELSE 0 END AS BIGINT) AS top2_char_ppm,
      |  CAST(CASE WHEN b.total3 > 0
      |    THEN ((b.total3 - b.distinct3) * 1000000) // b.total3
      |    ELSE 0 END AS BIGINT) AS dup3_ppm
      |FROM base b LEFT JOIN top t ON b.doc_id = t.doc_id AND t.rn = 1
      |ORDER BY b.doc_id""".stripMargin

  /** s06: oracle-checked LSH buckets — s03's signature machinery
    * (quantize → hyperplane dot → sign → bit-pack) run over
    * [[Ann.portableLshCoefs]] integer hyperplanes instead of xxhash64
    * ones, so DuckDB reproduces every bucket bit-for-bit. s03 stays
    * the production path; this pins the machinery (like d08 pins
    * SimHash's). */
  def s06LshPortable(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        Ann.portableLshBucket(col("embedding"), nBits = 8, dim = 64)
          .as("bucket"))
      .orderBy("vec_id")

  /** The ONE rendering of [[Ann.portableLshBucket]]'s quantize → dot →
    * sign → bit-pack machinery in DuckDB SQL (the duckHash discipline:
    * determinism-critical oracle expressions are generated once).
    * Returns (quantize expr over `embedding`, bit-pack expr over its
    * alias `q`). */
  private def duckLshBucket(nBits: Int, dim: Int): (String, String) = {
    val coefs = Ann.portableLshCoefs(nBits, dim)
    val q = "list_transform(CAST(embedding AS DOUBLE[]), " +
      "x -> CAST(floor(x * 1000000) AS BIGINT))"
    val bits = coefs.zipWithIndex.map { case (cs, j) =>
      val arr = cs.mkString("[", ",", "]")
      s"""CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(range(1, ${dim + 1}), i -> q[i] * ($arr)[i])),
         |    (acc, x) -> acc + x) >= 0
         |  THEN (CAST(1 AS BIGINT) << $j) ELSE CAST(0 AS BIGINT) END"""
        .stripMargin
    }.mkString(" |\n  ")
    (q, bits)
  }

  val s06Sql: String = {
    val (q, bits) = duckLshBucket(nBits = 8, dim = 64)
    s"""SELECT vec_id,
       |  $bits AS bucket
       |FROM (SELECT vec_id, $q AS q FROM embeddings)
       |ORDER BY vec_id""".stripMargin
  }

  /** s09: portable integer k-means — s05's trainer machinery
    * (seed → assign → update → assign, Lloyd's) run in exact integer
    * arithmetic ([[Ann.portableKmeansAssign]]), so DuckDB reproduces
    * every centroid component and every assignment bit-for-bit across
    * two full iterations (the trainer analog of s06/s08's
    * quantize-and-pin pattern; s05 stays the float production path). */
  def s09KmeansPortable(s: SparkSession, d: String): DataFrame =
    Ann.portableKmeansAssign(Tables.embeddings(s, d), "vec_id", "embedding",
        dim = 64, k = 8, iters = 2)
      .orderBy("vec_id")

  /** Exact integer squared-L2 between two BIGINT[64] refs in DuckDB —
    * shared by the portable-k-means CTEs and s04's within-cell rank. */
  private def duckIntL2(qRef: String, cRef: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |            list_transform(range(1, 65),
       |              i -> ($qRef[i] - $cRef[i]) * ($qRef[i] - $cRef[i]))),
       |            (acc, x) -> acc + x)""".stripMargin

  /** The ONE rendering of [[Ann.portableKmeansCentroids]]'
    * seed → assign → update → assign machinery in DuckDB SQL (k=8,
    * dim=64, 2 exact-integer Lloyd's iterations, salt 'pkmeans'),
    * ending in `a3(vec_id, q, cell)` — the final assignment WITH the
    * quantized vectors. Shared by s09's assignment oracle and s04's
    * trained-IVF search oracle. */
  private def duckPkmeansCtes: String = duckPkmeansCtesTrained("")

  /** [[duckPkmeansCtes]] generalized to a TRAINING SUBSET: seeds and
    * Lloyd's updates run over `t0 = q0 WHERE trainWhere` (empty = the
    * whole corpus, reproducing [[duckPkmeansCtes]] exactly), while the
    * final assignment `a3` covers all of `q0` under the subset-trained
    * centroids — the oracle shape for a quantizer trained on a sample
    * and FROZEN (s13's streamed index, [[Ann.portableKmeansCentroids]]
    * on the first arrival slice). `cellsExpr` is the seed count as a
    * SQL expression — a literal for the fixed-capacity queries, a
    * scalar subquery over the `cap` CTE ([[duckCapacityCte]]) for
    * s21's corpus-scaled capacity. */
  private def duckPkmeansCtesTrained(trainWhere: String,
      cellsExpr: String = "8"): String = {
    val h = duckHash("'pkmeans:' || CAST(vec_id AS VARCHAR)")
    def assignCte(name: String, src: String, cents: String): String =
      s"""$name AS (
         |  SELECT vec_id, q, cell FROM (
         |    SELECT $src.vec_id, $src.q, $cents.cell,
         |      row_number() OVER (PARTITION BY $src.vec_id
         |        ORDER BY ${duckIntL2(s"$src.q", s"$cents.c")}, $cents.cell) AS rn
         |    FROM $src CROSS JOIN $cents)
         |  WHERE rn = 1)""".stripMargin
    def updateCtes(a: String, prev: String, next: String): String =
      // exact integer floor division at ANY magnitude: subtract the
      // positive mod, then // divides an exact multiple (DuckDB's //
      // truncates, which equals floor once the remainder is gone; a
      // double round-trip would lose exactness past 2^53)
      s"""u_$next AS (
         |  SELECT cell, list((s - ((s % n) + n) % n) // n
         |                    ORDER BY pos) AS c
         |  FROM (SELECT $a.cell, p.i AS pos, SUM($a.q[p.i]) AS s,
         |          COUNT(*) AS n
         |        FROM $a CROSS JOIN (SELECT unnest(range(1, 65)) AS i) p
         |        GROUP BY $a.cell, p.i)
         |  GROUP BY cell),
         |$next AS (
         |  SELECT $prev.cell, COALESCE(u_$next.c, $prev.c) AS c
         |  FROM $prev LEFT JOIN u_$next ON u_$next.cell = $prev.cell)"""
        .stripMargin
    val where = if (trainWhere.isEmpty) "" else s" WHERE $trainWhere"
    s"""q0 AS (
       |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
       |           x -> CAST(floor(x * 1000000) AS BIGINT)) AS q
       |  FROM embeddings),
       |t0 AS (SELECT vec_id, q FROM q0$where),
       |c0 AS (
       |  SELECT rn - 1 AS cell, q AS c FROM (
       |    SELECT q, row_number() OVER (ORDER BY $h, vec_id) AS rn
       |    FROM t0)
       |  WHERE rn <= $cellsExpr),
       |${assignCte("a1", "t0", "c0")},
       |${updateCtes("a1", "c0", "c1")},
       |${assignCte("a2", "t0", "c1")},
       |${updateCtes("a2", "c1", "c2")},
       |${assignCte("a3", "q0", "c2")}""".stripMargin
  }

  val s09Sql: String =
    s"""WITH $duckPkmeansCtes
       |SELECT vec_id, cell FROM a3 ORDER BY vec_id""".stripMargin

  val s04Sql: String =
    s"""WITH $duckPkmeansCtes,
       |j AS (
       |  SELECT qq.vec_id AS query_id, cc.vec_id AS neighbor_id,
       |    ${duckIntL2("qq.q", "cc.q")} AS d2
       |  FROM a3 qq JOIN a3 cc
       |    ON qq.cell = cc.cell AND qq.vec_id <> cc.vec_id
       |  WHERE qq.vec_id < 10),
       |r AS (
       |  SELECT query_id, neighbor_id, d2,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY d2, neighbor_id) AS rank
       |  FROM j)
       |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, d2
       |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** s13: the IVF serving index built by STREAMING INGEST — embedding
    * files arrive in four slices, batch 0 trains and FREEZES the
    * coarse quantizer (portable integer Lloyd's on the first slice:
    * the train-on-a-sample-then-freeze practice for a corpus that
    * cannot be rescanned), every later batch assigns its vectors
    * under the frozen centroids into a CELL-PARTITIONED stored index
    * ([[graft.streaming.AnnStream]]: O(batch) work per round, crash-
    * safe per-batch overwrite), and the query is answered FROM THE
    * STORE — [[graft.streaming.AnnStream.ivfServeTopK]] reads only
    * the probed cells' partition directories, so query cost is
    * proportional to the probed inverted lists, never the corpus.
    * Oracle: the one-shot batch build (train on slice 0
    * = `vec_id % 4 = 0`, assign everything, rank within the query's
    * cell) — equal because a frozen quantizer makes assignment a pure
    * per-row function once batch 0 commits, so the accumulated index
    * is independent of how the remaining corpus was sliced. */
  def s13StreamIvfIngest(s: SparkSession, d: String): DataFrame = {
    val (idx, cen) = ivfIngestSlices(s, d, tempDirCleanedOnExit("graft_s13"))
    serveIvfTop3(s, d, idx, cen)
  }

  /** The s13/s14/s15 shared ingest: the embeddings table arrives in
    * four slices with forced-increasing mtimes
    * ([[sharedArrivalSlices]]), so under maxFilesPerTrigger=1 the
    * oldest-first file source makes slice i BE batch i — batch 0
    * (slice `vec_id % 4 = 0`) trains the quantizer, exactly what the
    * oracle's training CTE assumes. Returns (indexPath,
    * centroidsPath). */
  private def ivfIngestSlices(s: SparkSession, d: String,
      base: java.nio.file.Path): (String, String) = {
    val idx = base.resolve("index").toString
    val cen = base.resolve("centroids").toString
    val ckpt = base.resolve("ckpt").toString
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val in = sharedArrivalSlices(s, d, "emb", emb, "vec_id", 4)
    val q = graft.streaming.AnnStream.ivfIngest(s, in, emb.schema, idx,
      cen, ckpt, "vec_id", "embedding", dim = 64, cells = 8, iters = 2)
    try q.processAllAvailable() finally q.stop()
    (idx, cen)
  }

  /** One shared streamed-index build per fixture dir, so s14/s15
    * price their OWN deltas (publish relayout, nprobe serve) on top
    * of an index that already exists — at 100 TB the serving
    * lifecycle REUSES the ingest's output rather than re-ingesting
    * per query, and the bench should price each step the way it
    * ships. s13 prices the ingest itself and never reads this cache.
    * Sound to share: the ingest output is a pure function of the
    * fixture dir (frozen quantizer, deterministic assignment), so
    * every consumer sees identical bytes. */
  private val ivfIngestShared =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]
  private def sharedIvfIngest(s: SparkSession, d: String): (String, String) =
    ivfIngestShared.computeIfAbsent(d, _ =>
      ivfIngestSlices(s, d, tempDirCleanedOnExit("graft_sivf")))

  private def serveIvfTop3(s: SparkSession, d: String, idx: String,
      cen: String): DataFrame =
    graft.streaming.AnnStream.ivfServeTopK(s, idx, cen,
        Tables.embeddings(s, d).select("vec_id", "embedding")
          .filter(col("vec_id") < 10),
        "vec_id", "embedding", topK = 3)
      .orderBy("query_id", "rank")

  /** s14: the PUBLISH step of the streamed-index lifecycle — the
    * crash-safe `batch_id=N/cell=M` ingest tree is folded into the
    * read-optimized `cell=M` serving layout (one shuffle by cell,
    * ONE file per inverted list instead of one per batch × cell —
    * the small-files lifecycle for an ingest-built index at 100 TB),
    * and the query is served from the PUBLISHED tree. Oracle: s13's
    * — publish is a pure relayout, so the served answer must be
    * bit-identical to serving from the raw ingest tree. */
  def s14PublishedServe(s: SparkSession, d: String): DataFrame = {
    val (idx, cen) = sharedIvfIngest(s, d)
    val pub = tempDirCleanedOnExit("graft_s14").resolve("serving").toString
    graft.streaming.AnnStream.publishIndex(s, idx, pub)
    serveIvfTop3(s, d, pub, cen)
  }

  // oracle: s13's — the publish relayout must not change the answer
  // (def: s13Sql is declared later in the file; a val here would
  // capture null during object init)
  def s14Sql: String = s13Sql

  /** s15: nprobe serving on the streamed index — the recall/read-cost
    * knob a real IVF deployment turns: each query probes its TWO
    * nearest cells ([[graft.similarity.Ann.portableQueryCells]]:
    * integer cell ranking, ties to the lower cell, exploded per
    * probed cell), the scan reads those cells' partition directories
    * only, and candidates from both lists rank together (no
    * duplicates — a corpus row lives in exactly one cell). Oracle
    * ranks cells against the frozen centroids (`c2`) and searches
    * the union of the top-2 inverted lists — every cell choice,
    * candidate and distance BIGINT-reproducible. */
  def s15NprobeServe(s: SparkSession, d: String): DataFrame = {
    val (idx, cen) = sharedIvfIngest(s, d)
    graft.streaming.AnnStream.ivfServeTopK(s, idx, cen,
        Tables.embeddings(s, d).select("vec_id", "embedding")
          .filter(col("vec_id") < 10),
        "vec_id", "embedding", topK = 3, nprobe = 2)
      .orderBy("query_id", "rank")
  }

  /** s19: RETIREMENT propagated to ANN serving — the deletion /
    * re-crawl lifecycle on the vector side (d20's twin): a 2-batch
    * index builds and publishes (batch 0 = the `vec_id % 4 = 0`
    * training slice, frozen quantizer), every `vec_id % 10 = 3` is
    * RETIRED from the published serving tree
    * ([[graft.streaming.AnnStream.retireIds]] — affected cells only)
    * AND the raw per-batch tree
    * ([[graft.streaming.DedupStream.retireIds]] with the `cell`
    * sub-layout preserved), then half the erased set re-arrives
    * (`vec_id % 20 = 3` — a re-crawl; the frozen quantizer makes
    * re-assignment deterministic) as a new batch, the delta publish
    * folds it back into its affected cells, and the query serves from
    * the published tree. `vec_id % 20 = 13` stays erased — the
    * right-to-erasure half. Oracle: s13's frozen-quantizer serve with
    * the INDEX side filtered by the erased set (queries keep their
    * pure-function cell assignment; retirement changes what the
    * probed inverted lists contain, nothing else). */
  def s19RetireServe(s: SparkSession, d: String): DataFrame = {
    val base = tempDirCleanedOnExit("graft_s19")
    val idx = base.resolve("index").toString
    val cen = base.resolve("centroids").toString
    val pub = base.resolve("serving").toString
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    def send(batch: DataFrame, id: Long): Unit =
      graft.streaming.AnnStream.processIvfBatch(batch, id, idx, cen,
        "vec_id", "embedding", dim = 64, cells = 8, iters = 2)
    send(emb.filter(col("vec_id") % 4 === 0), 0L) // trains + freezes
    send(emb.filter(col("vec_id") % 4 =!= 0), 1L)
    graft.streaming.AnnStream.publishIndex(s, idx, pub)
    val retire = emb.filter(col("vec_id") % 10 === 3).select("vec_id")
    graft.streaming.AnnStream.retireIds(s, pub, retire, "vec_id")
    graft.streaming.DedupStream.retireIds(s, idx, retire, "vec_id",
      partitionCols = Seq("cell"))
    send(emb.filter(col("vec_id") % 20 === 3), 2L) // the re-crawl
    graft.streaming.AnnStream.publishIndexDelta(s, idx, pub)
    serveIvfTop3(s, d, pub, cen)
  }

  val s19Sql: String =
    s"""WITH ${duckPkmeansCtesTrained("vec_id % 4 = 0")},
       |j AS (
       |  SELECT qq.vec_id AS query_id, cc.vec_id AS neighbor_id,
       |    ${duckIntL2("qq.q", "cc.q")} AS d2
       |  FROM a3 qq JOIN a3 cc
       |    ON qq.cell = cc.cell AND qq.vec_id <> cc.vec_id
       |  WHERE qq.vec_id < 10 AND NOT (cc.vec_id % 20 = 13)),
       |r AS (
       |  SELECT query_id, neighbor_id, d2,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY d2, neighbor_id) AS rank
       |  FROM j)
       |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, d2
       |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** s16: INCREMENTAL publish — the routine republish cadence of a
    * streamed index at 100 TB. A full [[graft.streaming.AnnStream
    * .publishIndex]] re-shuffles the whole raw tree every time;
    * [[graft.streaming.AnnStream.publishIndexDelta]] folds only the
    * batches newer than the published watermark into their AFFECTED
    * cells (read delta partitions + affected published cells, both
    * partition-pruned; rewrite exactly those cell dirs through the
    * per-cell rename-aside protocol; bump the watermark sidecar
    * last). Here: batches 0–1 publish in full, then the delta fold
    * brings in batches 2–3 — and the served answer must be
    * bit-identical to serving the raw tree (s13's oracle), because
    * a publish, full or incremental, is a pure relayout.
    * tools.IngestProbe's publish cell pins the cost claim: delta
    * fold wall scales with the delta, not the corpus. */
  def s16IncrementalPublish(s: SparkSession, d: String): DataFrame = {
    val (idx, cen) = sharedIvfIngest(s, d)
    val pub = tempDirCleanedOnExit("graft_s16").resolve("serving").toString
    graft.streaming.AnnStream.publishIndex(s, idx, pub, upToBatch = Some(1L))
    graft.streaming.AnnStream.publishIndexDelta(s, idx, pub)
    serveIvfTop3(s, d, pub, cen)
  }

  // oracle: s13's — a publish (full or incremental) is a pure
  // relayout of the same row set
  def s16Sql: String = s13Sql

  /** s17: the PQ-CODED serving form of the streamed index — the shape
    * a 100 TB deployment actually serves from. The raw ingest tree's
    * dim-long quantized vectors publish as m-byte RESIDUAL codes per
    * row ([[graft.streaming.AnnStream.publishPqIndex]]: residual vs
    * the frozen batch-0 centroid, encoded against the deterministic
    * portable codebook stored beside the centroids — both models
    * frozen, so the coded tree is a pure function of the raw tree),
    * and a query ADC-shortlists against ONLY its probed cells' code
    * rows, then re-ranks the shortlist by exact integer L2 against
    * the raw vector source ([[graft.streaming.AnnStream.pqServeTopK]]
    * — s10's two-stage architecture composed with s13's frozen
    * quantizer and s14's published layout). Integer-exact end to
    * end: DuckDB re-derives the frozen centroids, every residual
    * code, the probe order, the ADC sums, the shortlist and the
    * final ranks bit-for-bit. */
  def s17PqCodedServe(s: SparkSession, d: String): DataFrame = {
    val (idx, cen) = sharedIvfIngest(s, d)
    val coded = tempDirCleanedOnExit("graft_s17").resolve("coded").toString
    graft.streaming.AnnStream.publishPqIndex(s, idx, cen, coded, "vec_id",
      m = 8, k = 8)
    graft.streaming.AnnStream.pqServeTopK(s, coded, cen,
        vectors = Tables.embeddings(s, d).select("vec_id", "embedding"),
        queries = Tables.embeddings(s, d).select("vec_id", "embedding")
          .filter(col("vec_id") < 10),
        "vec_id", "embedding", m = 8, k = 8, nprobe = 2,
        shortlist = 20, topK = 5)
      .orderBy("query_id", "rank")
  }

  /** The s17 oracle: the frozen-quantizer CTEs (train on slice 0),
    * then s12's residual-code + distance-table machinery against the
    * FROZEN centroids `c2` and full assignment `a3`, then s10's exact
    * rerank over the shortlist. */
  val s17Sql: String = {
    val dim = 64; val m = 8; val k = 8; val sub = 8
    val nprobe = 2; val shortlist = 20; val topK = 5
    // the SPREAD serving codebook (codes must partition residual
    // space, not just pin arithmetic) — embedded as literals, so the
    // oracle follows whichever deterministic table the engine uses
    val cb = Ann.portablePqCodebookSpread(m, k, sub)
    val cbAll = cb.map(_.map(_.mkString("[", ",", "]"))
      .mkString("[", ",", "]")).mkString("[", ",", "]")
    def dist(qRef: String, cRef: String): String =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |            list_transform(range(1, ${dim + 1}),
         |              i -> ($qRef[i] - $cRef[i]) * ($qRef[i] - $cRef[i]))),
         |            (acc, x) -> acc + x)""".stripMargin
    def distsR(j: Int) = {
      val lits = cb(j).map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
      s"""list_transform(range(0, $k), c ->
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(range(1, ${sub + 1}), i ->
         |      (r[${j * sub} + i] - ($lits)[c + 1][i])
         |      * (r[${j * sub} + i] - ($lits)[c + 1][i]))),
         |    (acc, x) -> acc + x))""".stripMargin
    }
    val dCols = (0 until m).map(j => s"(${distsR(j)}) AS d$j").mkString(",\n  ")
    val codesArr = (0 until m)
      .map(j => s"CAST(list_position(d$j, list_min(d$j)) - 1 AS INTEGER)")
      .mkString("[", ", ", "]")
    s"""WITH ${duckPkmeansCtesTrained("vec_id % 4 = 0")},
       |resid AS (
       |  SELECT a3.vec_id, a3.cell,
       |    list_transform(range(1, ${dim + 1}), i -> a3.q[i] - c2.c[i]) AS r
       |  FROM a3 JOIN c2 ON a3.cell = c2.cell),
       |codes AS (
       |  SELECT vec_id, cell, unnest(range(0, $m)) AS j,
       |    unnest($codesArr) AS code
       |  FROM (SELECT vec_id, cell, $dCols FROM resid)),
       |qs AS (SELECT vec_id AS query_id, q FROM q0 WHERE vec_id < 10),
       |probe AS (
       |  SELECT query_id, cell,
       |    list_transform(range(1, ${dim + 1}), i -> q[i] - c[i]) AS qr
       |  FROM (
       |    SELECT qs.query_id, c2.cell, qs.q, c2.c,
       |      row_number() OVER (PARTITION BY qs.query_id
       |        ORDER BY ${dist("qs.q", "c2.c")}, c2.cell) AS rn
       |    FROM qs CROSS JOIN c2)
       |  WHERE rn <= $nprobe),
       |dtab AS (
       |  SELECT query_id, cell, jc.j AS j, jc.c AS code,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, ${sub + 1}), i ->
       |        (qr[jc.j * $sub + i] - ($cbAll)[jc.j + 1][jc.c + 1][i])
       |        * (qr[jc.j * $sub + i] - ($cbAll)[jc.j + 1][jc.c + 1][i]))),
       |      (acc, x) -> acc + x) AS dcell
       |  FROM probe CROSS JOIN (
       |    SELECT j, c FROM (SELECT unnest(range(0, $m)) AS j)
       |    CROSS JOIN (SELECT unnest(range(0, $k)) AS c)) jc),
       |adc AS (
       |  SELECT query_id, vec_id, CAST(SUM(dcell) AS BIGINT) AS adc
       |  FROM codes JOIN dtab ON codes.cell = dtab.cell
       |    AND codes.j = dtab.j AND codes.code = dtab.code
       |  WHERE query_id <> vec_id
       |  GROUP BY query_id, vec_id),
       |short AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY adc, vec_id) AS rn
       |    FROM adc)
       |  WHERE rn <= $shortlist),
       |exact AS (
       |  SELECT s.query_id, s.vec_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, ${dim + 1}),
       |        i -> (qq.q[i] - cv.q[i]) * (qq.q[i] - cv.q[i]))),
       |      (acc, x) -> acc + x) AS d2
       |  FROM short s JOIN q0 cv ON cv.vec_id = s.vec_id
       |  JOIN qs qq ON qq.query_id = s.query_id)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank,
       |  vec_id AS neighbor_id, d2
       |FROM (
       |  SELECT query_id, vec_id, d2,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY d2, vec_id) AS rank
       |  FROM exact)
       |WHERE rank <= $topK
       |ORDER BY query_id, rank""".stripMargin
  }

  /** s18: PQ-coded serving with a codebook TRAINED ON BATCH-0
    * RESIDUALS — s17's lifecycle with the data-independent spread
    * table replaced by the real thing: after the shared ingest, the
    * `batch_id=0` partition's residuals (vs the frozen coarse
    * centroids) train an exact-integer per-subspace codebook
    * ([[graft.streaming.AnnStream.trainPqCodebook]] — md5-hash-seeded,
    * two Lloyd's iterations, floorDiv means, ties to the lowest code),
    * which FREEZES beside the centroids
    * ([[graft.streaming.AnnStream.writePqCodebook]]) — train on the
    * sample, freeze, encode everything after: the same discipline as
    * the coarse quantizer, so the coded tree stays a pure function of
    * the raw tree plus two frozen models. Publish and serve are
    * s17's, against the stored table. Oracle: the frozen-model CTE
    * pattern extended through the TRAINER — DuckDB re-derives the
    * coarse centroids, the batch-0 residuals, the seeds, both Lloyd's
    * iterations (all m subspaces as one grouped k-means), every
    * corpus code, the ADC shortlist, and the exact reranked top-k
    * bit-for-bit. */
  def s18PqTrainedServe(s: SparkSession, d: String): DataFrame = {
    val (idx, cen) = sharedIvfIngest(s, d)
    val base = tempDirCleanedOnExit("graft_s18")
    val cbPath = base.resolve("codebook").toString
    val coded = base.resolve("coded").toString
    val cb = graft.streaming.AnnStream.trainPqCodebook(s, idx, cen,
      m = 8, k = 8, iters = 2)
    graft.streaming.AnnStream.writePqCodebook(s, cb, cbPath)
    // serve from the STORED model — the round-trip is part of the path
    val frozen = graft.streaming.AnnStream.readPqCodebook(s, cbPath)
    graft.streaming.AnnStream.publishPqIndex(s, idx, cen, coded, "vec_id",
      m = 8, k = 8, frozen)
    graft.streaming.AnnStream.pqServeTopK(s, coded, cen,
        vectors = Tables.embeddings(s, d).select("vec_id", "embedding"),
        queries = Tables.embeddings(s, d).select("vec_id", "embedding")
          .filter(col("vec_id") < 10),
        "vec_id", "embedding", m = 8, k = 8, nprobe = 2,
        shortlist = 20, topK = 5, frozen)
      .orderBy("query_id", "rank")
  }

  /** The s18 oracle: s17's serve pipeline with the codebook CTEs
    * trained in SQL — all m subspaces as ONE grouped k-means over
    * (vec_id, j, slice) rows (`pc0` seeds → assign `pa` → floorDiv
    * update `pu`/`pc`, `iters` times), then codes/dtab JOIN the
    * trained `pc{iters}` instead of embedding a literal table.
    * Parameterized over the serve tuning knobs so s20's TUNED point
    * (iters=5, shortlist=100 — the committed IngestProbe sweep's
    * pick) re-derives through the identical machinery, and over the
    * CAPACITY knobs (`k` codes per subspace; `cellsExpr`/`nprobeExpr`
    * as SQL expressions over an optional `cap` CTE) so s21's
    * corpus-scaled point re-derives through it too, and over the
    * COARSE TRAINING PREFIX (`coarseTrainWhere` — a predicate, or a
    * scalar subquery over s22's `mig` CTE, selecting the arrival
    * slices the quantizer trained on: slice 0 for the frozen-at-birth
    * lifecycles, the committed prefix at the last capacity migration
    * for s22); ends in `exact(query_id, vec_id, d2)` — the
    * exact-reranked shortlist — plus `qs`/`q0`; callers append their
    * final SELECT. */
  private def duckPqTrainedServeCtes(iters: Int, nprobe: Int,
      shortlist: Int, qn: Int, k: Int = 8, cellsExpr: String = "8",
      nprobeExpr: String = "",
      coarseTrainWhere: String = "vec_id % 4 = 0"): String = {
    val dim = 64; val m = 8; val sub = 8
    val npE = if (nprobeExpr.isEmpty) nprobe.toString else nprobeExpr
    val h = duckHash("'pqres:' || CAST(vec_id AS VARCHAR)")
    // exact integer squared-L2 between two BIGINT[sub] refs
    def subDist(aRef: String, bRef: String): String =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, ${sub + 1}),
         |        i -> ($aRef[i] - $bRef[i]) * ($aRef[i] - $bRef[i]))),
         |      (acc, x) -> acc + x)""".stripMargin
    def dist(qRef: String, cRef: String): String =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |            list_transform(range(1, ${dim + 1}),
         |              i -> ($qRef[i] - $cRef[i]) * ($qRef[i] - $cRef[i]))),
         |            (acc, x) -> acc + x)""".stripMargin
    def assignCte(name: String, src: String, cents: String): String =
      s"""$name AS MATERIALIZED (
         |  SELECT vec_id, j, code, s FROM (
         |    SELECT $src.vec_id, $src.j, $cents.code, $src.s,
         |      row_number() OVER (PARTITION BY $src.vec_id, $src.j
         |        ORDER BY ${subDist(s"$src.s", s"$cents.c")}, $cents.code)
         |        AS rn
         |    FROM $src JOIN $cents ON $cents.j = $src.j)
         |  WHERE rn = 1)""".stripMargin
    def updateCtes(a: String, prev: String, next: String): String =
      s"""pu_$next AS (
         |  SELECT j, code, list((sv - ((sv % n) + n) % n) // n
         |                       ORDER BY pos) AS c
         |  FROM (SELECT $a.j, $a.code, p.i AS pos, SUM($a.s[p.i]) AS sv,
         |          COUNT(*) AS n
         |        FROM $a CROSS JOIN (SELECT unnest(range(1, ${sub + 1}))
         |          AS i) p
         |        GROUP BY $a.j, $a.code, p.i)
         |  GROUP BY j, code),
         |$next AS MATERIALIZED (
         |  SELECT $prev.j, $prev.code, COALESCE(pu_$next.c, $prev.c) AS c
         |  FROM $prev LEFT JOIN pu_$next
         |    ON pu_$next.j = $prev.j AND pu_$next.code = $prev.code)"""
        .stripMargin
    val pcN = s"pc$iters"
    val rounds = (1 to iters).map { i =>
      val prev = if (i == 1) "pc0" else s"pc${i - 1}"
      s"${assignCte(s"pa$i", "psl", prev)},\n${updateCtes(s"pa$i", prev, s"pc$i")}"
    }.mkString(",\n")
    s"""${duckPkmeansCtesTrained(coarseTrainWhere, cellsExpr)},
       |resid AS MATERIALIZED (
       |  SELECT a3.vec_id, a3.cell,
       |    list_transform(range(1, ${dim + 1}), i -> a3.q[i] - c2.c[i]) AS r
       |  FROM a3 JOIN c2 ON a3.cell = c2.cell),
       |js AS (SELECT unnest(range(0, $m)) AS j),
       |psl AS MATERIALIZED (
       |  SELECT vec_id, j,
       |    list_transform(range(1, ${sub + 1}), i -> r[j * $sub + i]) AS s
       |  FROM resid CROSS JOIN js
       |  WHERE vec_id % 4 = 0),
       |pc0 AS MATERIALIZED (
       |  SELECT j, rn - 1 AS code, s AS c FROM (
       |    SELECT j, s, row_number() OVER (PARTITION BY j
       |      ORDER BY $h, vec_id) AS rn
       |    FROM psl)
       |  WHERE rn <= $k),
       |$rounds,
       |rsl AS MATERIALIZED (
       |  SELECT vec_id, cell, j,
       |    list_transform(range(1, ${sub + 1}), i -> r[j * $sub + i]) AS s
       |  FROM resid CROSS JOIN js),
       |codes AS MATERIALIZED (
       |  SELECT vec_id, cell, j, code FROM (
       |    SELECT rsl.vec_id, rsl.cell, rsl.j, $pcN.code,
       |      row_number() OVER (PARTITION BY rsl.vec_id, rsl.j
       |        ORDER BY ${subDist("rsl.s", s"$pcN.c")}, $pcN.code) AS rn
       |    FROM rsl JOIN $pcN ON $pcN.j = rsl.j)
       |  WHERE rn = 1),
       |qs AS (SELECT vec_id AS query_id, q FROM q0 WHERE vec_id < $qn),
       |probe AS (
       |  SELECT query_id, cell,
       |    list_transform(range(1, ${dim + 1}), i -> q[i] - c[i]) AS qr
       |  FROM (
       |    SELECT qs.query_id, c2.cell, qs.q, c2.c,
       |      row_number() OVER (PARTITION BY qs.query_id
       |        ORDER BY ${dist("qs.q", "c2.c")}, c2.cell) AS rn
       |    FROM qs CROSS JOIN c2)
       |  WHERE rn <= $npE),
       |dtab AS (
       |  SELECT query_id, cell, $pcN.j AS j, $pcN.code AS code,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, ${sub + 1}), i ->
       |        (qr[$pcN.j * $sub + i] - $pcN.c[i])
       |        * (qr[$pcN.j * $sub + i] - $pcN.c[i]))),
       |      (acc, x) -> acc + x) AS dcell
       |  FROM probe CROSS JOIN $pcN),
       |adc AS (
       |  SELECT query_id, vec_id, CAST(SUM(dcell) AS BIGINT) AS adc
       |  FROM codes JOIN dtab ON codes.cell = dtab.cell
       |    AND codes.j = dtab.j AND codes.code = dtab.code
       |  WHERE query_id <> vec_id
       |  GROUP BY query_id, vec_id),
       |short AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY adc, vec_id) AS rn
       |    FROM adc)
       |  WHERE rn <= $shortlist),
       |exact AS (
       |  SELECT s.query_id, s.vec_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, ${dim + 1}),
       |        i -> (qq.q[i] - cv.q[i]) * (qq.q[i] - cv.q[i]))),
       |      (acc, x) -> acc + x) AS d2
       |  FROM short s JOIN q0 cv ON cv.vec_id = s.vec_id
       |  JOIN qs qq ON qq.query_id = s.query_id)""".stripMargin
  }

  val s18Sql: String =
    s"""WITH ${duckPqTrainedServeCtes(iters = 2, nprobe = 2,
          shortlist = 20, qn = 10)}
       |SELECT query_id, CAST(rank AS BIGINT) AS rank,
       |  vec_id AS neighbor_id, d2
       |FROM (
       |  SELECT query_id, vec_id, d2,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY d2, vec_id) AS rank
       |  FROM exact)
       |WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** The s20 recall floor, in permille of the exact top-5 set. Pinned
    * from the measured recall of THIS configuration (4-slice shared
    * ingest, iters=5 codebook, nprobe=2, shortlist=100, 50 queries)
    * at all three driver scale factors — 0.496 / 0.532 / 0.380 at
    * sf0.001 / 0.01 / 0.1 — with margin below the minimum, and well
    * above the legacy shortlist=20/iters=2 point's 0.200: the gate
    * exists to catch a serving-quality REGRESSION (a codebook /
    * trainer / serve change silently dropping recall), not to
    * re-measure the committed sweep. */
  private val s20GatePermille = 350

  /** s20: the TUNED PQ serving point — the committed IngestProbe
    * sweep (`pq_sweep`/`pq_nprobe`, r14) showed recall@5 0.424 at
    * shortlist=100/iters=5 for LESS serve wall than the shipped
    * 0.200 point (shortlist=20/iters=2), so this query ADOPTS that
    * operating point end to end (train iters=5 on batch-0 residuals,
    * freeze, publish, serve at shortlist=100) and GATES it: the
    * result row is (n_exact, n_hit, gate_ok) — the d15b count-gate
    * pattern — where n_exact is the exhaustive exact top-5 pair set
    * over the same quantized corpus, n_hit the served pairs that
    * match it, and the query THROWS if recall falls below
    * [[s20GatePermille]]. Every count is integer-exact end to end,
    * so DuckDB re-derives both sides bit-for-bit (the s18 oracle
    * machinery at iters=5 plus an exhaustive-exact twin). s17/s18
    * keep the legacy point pinned for the lifecycle-correctness
    * story; this row is the operating point a deployment would
    * actually serve — and the [[graft.streaming.AnnStream]] API
    * defaults now match it. */
  def s20TunedServe(s: SparkSession, d: String): DataFrame = {
    val (idx, cen) = sharedIvfIngest(s, d)
    gatedPqServe(s, d, "s20", idx, cen, k = 8, nprobe = 2,
      gatePermille = s20GatePermille,
      pointDesc = "— serving quality regressed below the swept " +
        "operating point")
  }

  /** The ONE gated trained-PQ serve body behind s20, s21 and s22
    * (train the residual codebook at iters=5, freeze, publish the
    * coded tree, serve at shortlist=100/topK=5, count-gate against the
    * exhaustive exact integer top-5) — parameterized over the knobs
    * the operating points differ in (k, nprobe, gate floor, extra
    * config columns), so a fix to the gate arithmetic or the quantizer
    * can never leave one of the twins stale (the ingestBody
    * structural-not-hand-repeated rule). */
  private def gatedPqServe(s: SparkSession, d: String, tag: String,
      idx: String, cen: String, k: Int, nprobe: Int, gatePermille: Int,
      pointDesc: String, extraCols: Seq[(String, Long)] = Nil): DataFrame = {
    val base = tempDirCleanedOnExit(s"graft_$tag")
    val cbPath = base.resolve("codebook").toString
    val coded = base.resolve("coded").toString
    val cb = graft.streaming.AnnStream.trainPqCodebook(s, idx, cen,
      m = 8, k = k, iters = 5)
    graft.streaming.AnnStream.writePqCodebook(s, cb, cbPath)
    val frozen = graft.streaming.AnnStream.readPqCodebook(s, cbPath)
    graft.streaming.AnnStream.publishPqIndex(s, idx, cen, coded, "vec_id",
      m = 8, k = k, frozen)
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 50)
    // the served pair set is |queries|·topK = 250 rows — driver-tiny
    val served = graft.streaming.AnnStream.pqServeTopK(s, coded, cen,
        vectors = emb, queries = queries, "vec_id", "embedding",
        m = 8, k = k, nprobe = nprobe, shortlist = 100, topK = 5, frozen)
      .select(col("query_id").cast(LongType),
        col("neighbor_id").cast(LongType))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = sharedExactTop5(s, d)
    val (nExact, nHit) = (exact.size.toLong,
      served.count(exact.contains).toLong)
    require(nHit * 1000 >= nExact * gatePermille,
      s"$tag recall gate FAILED: hit $nHit of $nExact exact top-5 " +
        s"pairs (< $gatePermille permille) $pointDesc")
    import s.implicits._
    extraCols.foldLeft(
      Seq((nExact, nHit, true)).toDF("n_exact", "n_hit", "gate_ok")) {
      case (df, (name, v)) => df.withColumn(name, lit(v))
    }
  }

  /** The recall reference behind every gated serve: the exhaustive
    * EXACT integer top-5 pair set over the same quantized corpus and
    * the same 50-query set (brute force IS the oracle here — the gate
    * measures the index against ground truth, so the reference must
    * not itself be approximate). Computed ONCE per fixture dir and
    * shared by s20/s21/s22 (the [[sharedIvfIngest]] rationale — it is
    * a pure function of the embeddings table, independent of every
    * index configuration the gated queries vary), so the bench pays
    * the exhaustive scan once instead of once per gated lifecycle
    * (r16 verdict #5). Driver state: |queries|·5 = 250 id pairs. */
  private val exactTop5Shared =
    new java.util.concurrent.ConcurrentHashMap[String, Set[(Long, Long)]]
  private def sharedExactTop5(s: SparkSession, d: String): Set[(Long, Long)] =
    exactTop5Shared.computeIfAbsent(d, _ => {
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      def qz(df: DataFrame) = df.select(col("vec_id"),
        transform(col("embedding").cast(ArrayType(DoubleType)),
          x => floor(x * lit(1000000d)).cast(LongType)).as("q"))
      Ann.integerTopK(
        qz(emb).withColumn("k0", lit(0)),
        qz(emb.filter(col("vec_id") < 50))
          .select(col("vec_id").as("query_id"), col("q").as("qv"))
          .withColumn("k0", lit(0)),
        "vec_id", "k0", 5)
        .select(col("query_id").cast(LongType),
          col("neighbor_id").cast(LongType))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    })

  /** The s20 oracle: the trained-serve CTEs at the TUNED knobs, the
    * served top-5 (`sv`), the exhaustive exact top-5 (`ex5`), and the
    * same permille gate computed in SQL. */
  val s20Sql: String =
    s"""WITH ${duckPqTrainedServeCtes(iters = 5, nprobe = 2,
          shortlist = 100, qn = 50)},
       |sv AS (
       |  SELECT query_id, vec_id AS neighbor_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY d2, vec_id) AS rank
       |    FROM exact)
       |  WHERE rank <= 5),
       |ex5 AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT qs.query_id, cv.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY qs.query_id
       |        ORDER BY ${duckIntL2("qs.q", "cv.q")}, cv.vec_id) AS rn
       |    FROM qs CROSS JOIN q0 cv
       |    WHERE cv.vec_id <> qs.query_id)
       |  WHERE rn <= 5),
       |agg AS (
       |  SELECT (SELECT COUNT(*) FROM ex5) AS n_exact,
       |    (SELECT COUNT(*) FROM ex5 e JOIN sv s
       |       ON s.query_id = e.query_id
       |      AND s.neighbor_id = e.neighbor_id) AS n_hit)
       |SELECT CAST(n_exact AS BIGINT) AS n_exact,
       |  CAST(n_hit AS BIGINT) AS n_hit,
       |  (n_hit * 1000 >= n_exact * $s20GatePermille) AS gate_ok
       |FROM agg""".stripMargin

  /** The s21 recall floor, in permille of the exact top-5 set. Pinned
    * from the measured recall of the CAPACITY-SCALED configuration
    * (CAPACITY_r16.json: the [[graft.similarity.Ann.ivfCapacityForCorpus]]
    * rule point at k=16, iters=5, shortlist=100, 50 queries) at all
    * three driver scale factors — 0.500 / 0.532 / 0.468 at
    * sf0.001 / 0.01 / 0.1 — with margin below the minimum. Contrast
    * s20: the FIXED-capacity point decays to 0.380 at sf0.1 and a
    * further scale-up would fail its own gate; the scaled rule holds
    * recall roughly flat, which is the property this gate defends. */
  private val s21GatePermille = 400

  /** The capacity rule as a one-row SQL CTE `cap(cells, nprobe)` —
    * the EXACT integer formulation of
    * [[graft.similarity.Ann.ivfCapacityForCorpus]] (smallest power of
    * two ≥ 8 with cells²·16 ≥ n; nprobe = max(2, cells/4)), derived
    * from COUNT(*) of the same table, so the oracle re-computes the
    * configuration rather than having it pinned in (integer
    * comparisons only — no float boundary risk). The COALESCE mirrors
    * the Scala rule's 2²⁰ ceiling: above n = 2⁴⁰·16 no grid row
    * qualifies and MIN is NULL — without the cap the seed CTE's
    * `rn <= NULL` would select zero centroids, diverging from the
    * engine at exactly the scale the rule exists for (the grid's
    * largest entry, 8·2¹⁷, IS the Scala cap). */
  private val duckCapacityCte: String =
    """cap AS (
      |  SELECT cells, GREATEST(2, cells // 4) AS nprobe FROM (
      |    SELECT COALESCE(MIN(c), 1048576) AS cells FROM (
      |      SELECT 8 * (1 << g) AS c
      |      FROM (SELECT unnest(range(0, 18)) AS g))
      |    WHERE CAST(c AS BIGINT) * c * 16 >=
      |      (SELECT COUNT(*) FROM embeddings)))""".stripMargin

  /** One CAPACITY-SCALED streamed-index build per fixture dir (the
    * [[sharedIvfIngest]] rationale): 4 arrival slices through
    * [[graft.streaming.AnnStream.processIvfBatch]] at the rule's cell
    * count — slice 0 trains and freezes the coarse quantizer, exactly
    * the arrival shape the oracle's training CTE assumes. When the
    * rule lands on the legacy 8-cell point (n ≤ 1024: sf0.001/0.01)
    * the STREAMED shared ingest is reused outright — the frozen
    * quantizer makes the direct 4-slice build and the streamed build
    * byte-identical, and correctness runs then pay zero extra ingest. */
  private val capacityIngestShared =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]
  private def sharedCapacityIngest(s: SparkSession, d: String,
      cells: Int): (String, String) =
    if (cells == 8) sharedIvfIngest(s, d)
    else capacityIngestShared.computeIfAbsent(d, _ => {
      val base = tempDirCleanedOnExit("graft_scap")
      val idx = base.resolve("index").toString
      val cen = base.resolve("centroids").toString
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      (0 until 4).foreach { i =>
        graft.streaming.AnnStream.processIvfBatch(
          emb.filter(pmod(col("vec_id"), lit(4)) === i), i.toLong,
          idx, cen, "vec_id", "embedding", dim = 64, cells = cells,
          iters = 2)
      }
      (idx, cen)
    })

  /** s21: the CAPACITY-SCALED serving point — s20's gated lifecycle
    * with the model sized BY THE CORPUS instead of pinned: `cells` and
    * `nprobe` come from [[graft.similarity.Ann.ivfCapacityForCorpus]]
    * (cells ∝ √N at a fixed probed fraction — the sweep-backed rule
    * CAPACITY_r16.json prices), and the PQ codebook carries k=16
    * codes per subspace (the sweep's k axis: more recall at every
    * (cells, nprobe) point for 2× ADC-table cost). The lifecycle is
    * s20's end to end — train coarse on arrival slice 0 and freeze,
    * train the residual codebook at iters=5 and freeze, publish the
    * PQ-coded tree, serve at shortlist=100 — and the same count-gate
    * THROWS below [[s21GatePermille]]. Where s20 documents the decay
    * of a fixed model (recall 0.532 → 0.380 as the corpus grows 4×,
    * 30‰ from its own gate), s21 is the operating point that
    * SURVIVES scale: 0.500 / 0.532 / 0.468 measured at the three
    * SFs, and a 100× corpus re-derives a 100×-appropriate model from
    * the same rule instead of failing the gate. Oracle: the s18/s20
    * CTE machinery with the capacity itself re-derived in SQL from
    * COUNT(*) ([[duckCapacityCte]]) — the CONFIGURATION is part of
    * what the oracle checks. */
  def s21CapacityServe(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val cap = Ann.ivfCapacityForCorpus(emb.count())
    val (idx, cen) = sharedCapacityIngest(s, d, cap.cells)
    gatedPqServe(s, d, "s21", idx, cen, k = 16, nprobe = cap.nprobe,
      gatePermille = s21GatePermille,
      pointDesc = s"at capacity cells=${cap.cells}/nprobe=${cap.nprobe}" +
        "/k=16 — the scaled operating point regressed below the " +
        "sweep's measurement")
  }

  /** The s21 oracle: the trained-serve CTEs at k=16 with cells and
    * nprobe RE-DERIVED from COUNT(*) via [[duckCapacityCte]], plus the
    * served/exhaustive top-5 twins and the same permille gate. */
  val s21Sql: String =
    s"""WITH $duckCapacityCte,
       |${duckPqTrainedServeCtes(iters = 5, nprobe = 0,
          shortlist = 100, qn = 50, k = 16,
          cellsExpr = "(SELECT cells FROM cap)",
          nprobeExpr = "(SELECT nprobe FROM cap)")},
       |sv AS (
       |  SELECT query_id, vec_id AS neighbor_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY d2, vec_id) AS rank
       |    FROM exact)
       |  WHERE rank <= 5),
       |ex5 AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT qs.query_id, cv.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY qs.query_id
       |        ORDER BY ${duckIntL2("qs.q", "cv.q")}, cv.vec_id) AS rn
       |    FROM qs CROSS JOIN q0 cv
       |    WHERE cv.vec_id <> qs.query_id)
       |  WHERE rn <= 5),
       |agg AS (
       |  SELECT (SELECT COUNT(*) FROM ex5) AS n_exact,
       |    (SELECT COUNT(*) FROM ex5 e JOIN sv s
       |       ON s.query_id = e.query_id
       |      AND s.neighbor_id = e.neighbor_id) AS n_hit)
       |SELECT CAST(n_exact AS BIGINT) AS n_exact,
       |  CAST(n_hit AS BIGINT) AS n_hit,
       |  (n_hit * 1000 >= n_exact * $s21GatePermille) AS gate_ok
       |FROM agg""".stripMargin

  /** The s22 recall floor, in permille of the exact top-5 set —
    * measured for the MIGRATED configuration at the three driver SFs:
    * 0.500 / 0.532 / 0.420 at sf0.001 / 0.01 / 0.1 (the first two are
    * the no-migration outcomes, byte-identical trees to s21's rule
    * point; the third is the migrated 16/4 model trained on the
    * committed prefix at the crossing — within the seed-sensitivity
    * band of s21's slice-0-trained twin at the same capacity, 0.468,
    * and far above the frozen-8-cell decay point 0.380 the migration
    * exists to avoid). Floor set 40‰ under the minimum: the gate
    * catches a migration/trainer/serve regression, not sweep noise. */
  private val s22GatePermille = 380

  /** One capacity-MANAGED streamed-index build per fixture dir (the
    * [[sharedIvfIngest]] rationale): four arrival slices through
    * [[graft.streaming.AnnStream.processIvfBatch]] with `autoCells`
    * (batch 0 sizes the model by the rule over ITS OWN row count —
    * the stream does not know the final corpus) and
    * [[graft.streaming.AnnStream.migrateCapacityIfNeeded]] re-firing
    * the rule after every batch, exactly [[graft.streaming.AnnStream
    * .ivfIngest]]'s `autoCapacity` cadence in direct-batch form. At
    * sf0.1 (n = 2000) the committed corpus crosses the 8→16 boundary
    * after slice 2 (1500 > 8²·16) and the migration retrains on the
    * committed prefix and re-shards; at the 500-row SFs the rule
    * never re-fires (8 is its floor) and every check is a measured
    * no-op — both outcomes are what the oracle derives from COUNT(*).
    */
  private val migratedIngestShared =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]
  private def sharedMigratedIngest(s: SparkSession,
      d: String): (String, String) =
    migratedIngestShared.computeIfAbsent(d, _ => {
      val base = tempDirCleanedOnExit("graft_s22i")
      val idx = base.resolve("index").toString
      val cen = base.resolve("centroids").toString
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      (0 until 4).foreach { i =>
        graft.streaming.AnnStream.processIvfBatch(
          emb.filter(pmod(col("vec_id"), lit(4)) === i), i.toLong, idx,
          cen, "vec_id", "embedding", dim = 64, cells = 8, iters = 2,
          autoCells = true)
        graft.streaming.AnnStream.migrateCapacityIfNeeded(s, idx, cen,
          "vec_id", dim = 64, iters = 2)
      }
      (idx, cen)
    })

  /** s22: CAPACITY MIGRATION under a GROWING stream — the lifecycle
    * gap s21 leaves open, closed and gated. s21 sizes the model from
    * a corpus it can count up front; a production ingest cannot — it
    * starts at the rule's point for its FIRST slice and the corpus
    * grows past it (here 4×: exactly the growth s20 documents as
    * decaying recall 0.532 → 0.380 under a frozen model). This query
    * runs that stream: batch 0 trains at the rule over its own count,
    * [[graft.streaming.AnnStream.migrateCapacityIfNeeded]] re-fires
    * the rule after every batch, and when committed n crosses the
    * next boundary (sf0.1: 8→16 after slice 2) the quantizer RETRAINS
    * on the committed prefix and the raw tree RE-SHARDS in place,
    * crash-safe, between micro-batches — then the s20/s21 gated PQ
    * lifecycle (codebook on batch-0 residuals under the MIGRATED
    * model, publish, serve at shortlist=100) runs on the migrated
    * index and the count-gate THROWS below [[s22GatePermille]].
    * Result row carries (cells, nprobe) so the MIGRATED configuration
    * is itself oracle-checked: DuckDB re-derives the per-batch
    * committed counts, the rule at each of them, the LAST
    * boundary-crossing batch `m`, the quantizer trained on prefix ≤ m
    * at the migrated cells, and the full serve — the whole migration
    * decision is a pure function of COUNT(*)s the oracle recomputes.
    * Reference anchor: `MD-PS:224-228` (O11 "return the RIGHT top
    * element") — at ANN scale the right neighbors are the product, at
    * any corpus size the stream grows to. */
  def s22MigratedServe(s: SparkSession, d: String): DataFrame = {
    val (idx, cen) = sharedMigratedIngest(s, d)
    val cells = graft.streaming.AnnStream.readCentroids(s, cen).length
    val nprobe = math.max(2, cells / 4)
    gatedPqServe(s, d, "s22", idx, cen, k = 16, nprobe = nprobe,
      gatePermille = s22GatePermille,
      pointDesc = s"after capacity migration to cells=$cells" +
        s"/nprobe=$nprobe/k=16 — the migrated operating point " +
        "regressed below its measurement",
      extraCols = Seq("cells" -> cells.toLong, "nprobe" -> nprobe.toLong))
  }

  /** The s22 oracle: the migration DECISION re-derived in SQL — per
    * arrival slice i, the committed count and the capacity rule at it
    * (the s21 `cap` machinery, correlated per batch); `mig` is the
    * LAST batch where the rule's cells changed (batch 0 counts as a
    * change — the bootstrap training), which is exactly when the
    * engine's every-batch check last retrained. The serve CTEs then
    * train the quantizer on the committed prefix ≤ m at the migrated
    * cells and replay the gated lifecycle; the final row re-checks
    * the engine's (cells, nprobe) against the rule. */
  val s22Sql: String =
    s"""WITH mig AS (
       |  SELECT m, cells, GREATEST(2, cells // 4) AS nprobe FROM (
       |    SELECT i AS m, cells, lag(cells) OVER (ORDER BY i) AS prev
       |    FROM (
       |      SELECT i, COALESCE((
       |        SELECT MIN(c) FROM (
       |          SELECT 8 * (1 << g) AS c
       |          FROM (SELECT unnest(range(0, 18)) AS g))
       |        WHERE CAST(c AS BIGINT) * c * 16 >=
       |          (SELECT COUNT(*) FROM embeddings WHERE vec_id % 4 <= i)
       |      ), 1048576) AS cells
       |      FROM (SELECT unnest(range(0, 4)) AS i)))
       |  WHERE prev IS NULL OR cells <> prev
       |  ORDER BY m DESC LIMIT 1),
       |${duckPqTrainedServeCtes(iters = 5, nprobe = 0,
          shortlist = 100, qn = 50, k = 16,
          cellsExpr = "(SELECT cells FROM mig)",
          nprobeExpr = "(SELECT nprobe FROM mig)",
          coarseTrainWhere = "vec_id % 4 <= (SELECT m FROM mig)")},
       |sv AS (
       |  SELECT query_id, vec_id AS neighbor_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY d2, vec_id) AS rank
       |    FROM exact)
       |  WHERE rank <= 5),
       |ex5 AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT qs.query_id, cv.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY qs.query_id
       |        ORDER BY ${duckIntL2("qs.q", "cv.q")}, cv.vec_id) AS rn
       |    FROM qs CROSS JOIN q0 cv
       |    WHERE cv.vec_id <> qs.query_id)
       |  WHERE rn <= 5),
       |agg AS (
       |  SELECT (SELECT COUNT(*) FROM ex5) AS n_exact,
       |    (SELECT COUNT(*) FROM ex5 e JOIN sv s
       |       ON s.query_id = e.query_id
       |      AND s.neighbor_id = e.neighbor_id) AS n_hit)
       |SELECT CAST(n_exact AS BIGINT) AS n_exact,
       |  CAST(n_hit AS BIGINT) AS n_hit,
       |  (n_hit * 1000 >= n_exact * $s22GatePermille) AS gate_ok,
       |  CAST((SELECT cells FROM mig) AS BIGINT) AS cells,
       |  CAST((SELECT nprobe FROM mig) AS BIGINT) AS nprobe
       |FROM agg""".stripMargin

  val s15Sql: String =
    s"""WITH ${duckPkmeansCtesTrained("vec_id % 4 = 0")},
       |qc AS (
       |  SELECT vec_id AS query_id, q AS qv, cell FROM (
       |    SELECT q0.vec_id, q0.q, c2.cell,
       |      row_number() OVER (PARTITION BY q0.vec_id
       |        ORDER BY ${duckIntL2("q0.q", "c2.c")}, c2.cell) AS rn
       |    FROM q0 CROSS JOIN c2
       |    WHERE q0.vec_id < 10)
       |  WHERE rn <= 2),
       |j AS (
       |  SELECT qc.query_id, cc.vec_id AS neighbor_id,
       |    ${duckIntL2("qc.qv", "cc.q")} AS d2
       |  FROM qc JOIN a3 cc
       |    ON qc.cell = cc.cell AND qc.query_id <> cc.vec_id),
       |r AS (
       |  SELECT query_id, neighbor_id, d2,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY d2, neighbor_id) AS rank
       |  FROM j)
       |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, d2
       |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  // oracle: s04's search over assignments whose trainer saw ONLY the
  // first arrival slice (t0 = vec_id % 4 = 0), the frozen-quantizer twin
  val s13Sql: String =
    s"""WITH ${duckPkmeansCtesTrained("vec_id % 4 = 0")},
       |j AS (
       |  SELECT qq.vec_id AS query_id, cc.vec_id AS neighbor_id,
       |    ${duckIntL2("qq.q", "cc.q")} AS d2
       |  FROM a3 qq JOIN a3 cc
       |    ON qq.cell = cc.cell AND qq.vec_id <> cc.vec_id
       |  WHERE qq.vec_id < 10),
       |r AS (
       |  SELECT query_id, neighbor_id, d2,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY d2, neighbor_id) AS rank
       |  FROM j)
       |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, d2
       |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** s07: PQ codebook training as a QUANTITATIVE descent gate: 2
    * per-subspace k-means iterations must cut total reconstruction
    * error (Σ over the corpus of each vector's ADC distance to its own
    * codes — the quantity PQ training minimizes) to ≤ 90% of the seed
    * codebook's. Observed ratio ≈ 0.76-0.78 at sf0.001/0.01/0.1
    * (GateProbe); per-subspace Lloyd's descends monotonically, so the
    * ~12-point margin absorbs float merge-order jitter. Trained
    * floats themselves are merge-order sensitive (same as s04's
    * trainer) — the encode/serve machinery is pinned bit-for-bit by
    * s08 (encode), s10 (rerank) and s12 (IVF-PQ); search exactness
    * properties live in AnnSpec. */
  /** The s07 gate's reconstruction-error evaluation at an iteration
    * count — ONE body shared with tools.GateProbe (same rationale as
    * [[kmeansSseAt]]). */
  private[graft] def pqReconErrAt(emb: DataFrame, iters: Int): Double = {
    val cb = Ann.pqTrainCodebooks(emb, "vec_id", "embedding",
      dim = 64, m = 8, k = 16, iters = iters)
    emb.select(Ann.pqAdcDistance(col("embedding"),
        Ann.pqEncode(col("embedding"), 64, cb), 64, cb).as("e"))
      .agg(sum("e")).collect()(0).getDouble(0)
  }

  def s07PqTrained(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val e0 = pqReconErrAt(emb, 0)
    val e2 = pqReconErrAt(emb, 2)
    emb.agg(count(lit(1)).as("n_vectors"))
      .select(col("n_vectors"),
        lit(if (e2 * 10.0 <= e0 * 9.0) 1L else 0L).as("descended"))
  }

  val s07Sql: String =
    """SELECT COUNT(*) AS n_vectors, CAST(1 AS BIGINT) AS descended
      |FROM embeddings""".stripMargin

  /** s08: portable-PQ oracle twin — integer-exact encode +
    * reconstruction error over the fixed affine-mod codebook, so
    * DuckDB reproduces every code and distance bit-for-bit (the PQ
    * analog of s06/d08). Codes render as JSON (hash harness cannot
    * sort arrays). */
  def s08PqPortable(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        Ann.portablePqEncode(col("embedding"), dim = 64, m = 8, k = 8)
          .as("pq"))
      .select(col("vec_id"), to_json(col("pq.codes")).as("codes_json"),
        col("pq.recon_err").as("recon_err"))
      .orderBy("vec_id")

  val s08Sql: String = {
    val m = 8; val k = 8; val sub = 8
    val cb = Ann.portablePqCodebook(m, k, sub)
    // per subspace j: the k distances, first-min position = code
    def dists(j: Int) = {
      val lits = cb(j).map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
      s"""list_transform(range(0, $k), c ->
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(range(1, ${sub + 1}), i ->
         |      (q[${j * sub} + i] - ($lits)[c + 1][i])
         |      * (q[${j * sub} + i] - ($lits)[c + 1][i]))),
         |    (acc, x) -> acc + x))""".stripMargin
    }
    val dCols = (0 until m).map(j => s"(${dists(j)}) AS d$j").mkString(",\n  ")
    val codes = (0 until m)
      .map(j => s"CAST(list_position(d$j, list_min(d$j)) - 1 AS INTEGER)")
      .mkString("[", ", ", "]")
    val err = (0 until m).map(j => s"list_min(d$j)").mkString(" + ")
    s"""SELECT vec_id,
       |  CAST(to_json($codes) AS VARCHAR) AS codes_json,
       |  $err AS recon_err
       |FROM (
       |  SELECT vec_id,
       |  $dCols
       |  FROM (SELECT vec_id,
       |          list_transform(CAST(embedding AS DOUBLE[]),
       |            x -> CAST(floor(x * 1000000) AS BIGINT)) AS q
       |        FROM embeddings))
       |ORDER BY vec_id""".stripMargin
  }

  /** s10: two-stage retrieval — integer-exact ADC shortlist (corpus
    * code rows ⋈ the queries' per-(subspace, code) distance table)
    * re-ranked by exact quantized L2
    * ([[Ann.portablePqRerankTopK]]) — the PQ serving architecture
    * (compressed first pass, exact second pass over the shortlist),
    * reproduced bit-for-bit by DuckDB through both stages. */
  def s10PqRerank(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Ann.portablePqRerankTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", dim = 64, m = 8, k = 8,
        shortlist = 20, topK = 5)
      .orderBy("query_id", "rank")
  }

  val s10Sql: String = {
    val m = 8; val k = 8; val sub = 8
    val cb = Ann.portablePqCodebook(m, k, sub)
    val cbAll = cb.map(_.map(_.mkString("[", ",", "]"))
      .mkString("[", ",", "]")).mkString("[", ",", "]")
    def dists(j: Int) = {
      val lits = cb(j).map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
      s"""list_transform(range(0, $k), c ->
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(range(1, ${sub + 1}), i ->
         |      (q[${j * sub} + i] - ($lits)[c + 1][i])
         |      * (q[${j * sub} + i] - ($lits)[c + 1][i]))),
         |    (acc, x) -> acc + x))""".stripMargin
    }
    val dCols = (0 until m).map(j => s"(${dists(j)}) AS d$j").mkString(",\n  ")
    val codesArr = (0 until m)
      .map(j => s"CAST(list_position(d$j, list_min(d$j)) - 1 AS INTEGER)")
      .mkString("[", ", ", "]")
    s"""WITH q0 AS (
       |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
       |           x -> CAST(floor(x * 1000000) AS BIGINT)) AS q
       |  FROM embeddings),
       |codes AS (
       |  SELECT vec_id, unnest(range(0, $m)) AS j, unnest($codesArr) AS code
       |  FROM (SELECT vec_id, $dCols FROM q0)),
       |qs AS (SELECT vec_id AS query_id, q FROM q0 WHERE vec_id < 10),
       |dtab AS (
       |  SELECT query_id, jc.j AS j, jc.c AS code,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, ${sub + 1}), i ->
       |        (q[jc.j * $sub + i] - ($cbAll)[jc.j + 1][jc.c + 1][i])
       |        * (q[jc.j * $sub + i] - ($cbAll)[jc.j + 1][jc.c + 1][i]))),
       |      (acc, x) -> acc + x) AS dcell
       |  FROM qs CROSS JOIN (
       |    SELECT j, c FROM (SELECT unnest(range(0, $m)) AS j)
       |    CROSS JOIN (SELECT unnest(range(0, $k)) AS c)) jc),
       |adc AS (
       |  SELECT query_id, vec_id, SUM(dcell) AS adc
       |  FROM codes JOIN dtab ON codes.j = dtab.j AND codes.code = dtab.code
       |  WHERE query_id <> vec_id
       |  GROUP BY query_id, vec_id),
       |short AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY adc, vec_id) AS rn
       |    FROM adc)
       |  WHERE rn <= 20),
       |exact AS (
       |  SELECT s.query_id, s.vec_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, 65),
       |        i -> (qq.q[i] - cv.q[i]) * (qq.q[i] - cv.q[i]))),
       |      (acc, x) -> acc + x) AS d2
       |  FROM short s JOIN q0 cv ON cv.vec_id = s.vec_id
       |  JOIN qs qq ON qq.query_id = s.query_id)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank,
       |  vec_id AS neighbor_id, d2
       |FROM (
       |  SELECT query_id, vec_id, d2,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY d2, vec_id) AS rank
       |  FROM exact)
       |WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  /** s12: the composed IVF-PQ serving index, integer-exact end-to-end
    * ([[Ann.portableIvfPqTopK]]) — coarse k-means cells via s09's
    * trainer machinery, residual PQ codes per cell via s08's encode
    * machinery (over vector − cell centroid), nprobe cell probing and
    * asymmetric-distance ranking via s10's ADC machinery (on the
    * query's OWN residual in each probed cell). Every stage is exact
    * int64 over floor(x·10⁶) quantization with ties to the lower id,
    * so DuckDB re-derives the whole index — cells, residual codes,
    * probe order, distance tables, final top-k — bit-for-bit. */
  def s12IvfPq(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Ann.portableIvfPqTopK(emb, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", dim = 64, kCells = 4, coarseIters = 2, m = 8, k = 8,
        nprobe = 2, topK = 5)
      .orderBy("query_id", "rank")
  }

  val s12Sql: String = {
    val dim = 64; val kCells = 4; val m = 8; val k = 8; val sub = 8
    val nprobe = 2; val topK = 5
    val h = duckHash("'pkmeans:' || CAST(vec_id AS VARCHAR)")
    val cb = Ann.portablePqCodebook(m, k, sub)
    val cbAll = cb.map(_.map(_.mkString("[", ",", "]"))
      .mkString("[", ",", "]")).mkString("[", ",", "]")
    // exact int64 squared-L2 over the full dim (coarse assign + probe)
    def dist(qRef: String, cRef: String): String =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |            list_transform(range(1, ${dim + 1}),
         |              i -> ($qRef[i] - $cRef[i]) * ($qRef[i] - $cRef[i]))),
         |            (acc, x) -> acc + x)""".stripMargin
    // s09's Lloyd's CTE builders, parameterized by kCells
    def assignCte(name: String, cents: String): String =
      s"""$name AS (
         |  SELECT vec_id, q, cell FROM (
         |    SELECT q0.vec_id, q0.q, $cents.cell,
         |      row_number() OVER (PARTITION BY q0.vec_id
         |        ORDER BY ${dist("q0.q", s"$cents.c")}, $cents.cell) AS rn
         |    FROM q0 CROSS JOIN $cents)
         |  WHERE rn = 1)""".stripMargin
    def updateCtes(a: String, prev: String, next: String): String =
      s"""u_$next AS (
         |  SELECT cell, list((s - ((s % n) + n) % n) // n
         |                    ORDER BY pos) AS c
         |  FROM (SELECT $a.cell, p.i AS pos, SUM($a.q[p.i]) AS s,
         |          COUNT(*) AS n
         |        FROM $a CROSS JOIN (SELECT unnest(range(1, ${dim + 1})) AS i) p
         |        GROUP BY $a.cell, p.i)
         |  GROUP BY cell),
         |$next AS (
         |  SELECT $prev.cell, COALESCE(u_$next.c, $prev.c) AS c
         |  FROM $prev LEFT JOIN u_$next ON u_$next.cell = $prev.cell)"""
        .stripMargin
    // s08's per-subspace argmin over the RESIDUAL array r
    def distsR(j: Int) = {
      val lits = cb(j).map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
      s"""list_transform(range(0, $k), c ->
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(range(1, ${sub + 1}), i ->
         |      (r[${j * sub} + i] - ($lits)[c + 1][i])
         |      * (r[${j * sub} + i] - ($lits)[c + 1][i]))),
         |    (acc, x) -> acc + x))""".stripMargin
    }
    val dCols = (0 until m).map(j => s"(${distsR(j)}) AS d$j").mkString(",\n  ")
    val codesArr = (0 until m)
      .map(j => s"CAST(list_position(d$j, list_min(d$j)) - 1 AS INTEGER)")
      .mkString("[", ", ", "]")
    s"""WITH q0 AS (
       |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
       |           x -> CAST(floor(x * 1000000) AS BIGINT)) AS q
       |  FROM embeddings),
       |c0 AS (
       |  SELECT rn - 1 AS cell, q AS c FROM (
       |    SELECT q, row_number() OVER (ORDER BY $h, vec_id) AS rn
       |    FROM q0)
       |  WHERE rn <= $kCells),
       |${assignCte("a1", "c0")},
       |${updateCtes("a1", "c0", "c1")},
       |${assignCte("a2", "c1")},
       |${updateCtes("a2", "c1", "c2")},
       |${assignCte("af", "c2")},
       |resid AS (
       |  SELECT af.vec_id, af.cell,
       |    list_transform(range(1, ${dim + 1}), i -> af.q[i] - c2.c[i]) AS r
       |  FROM af JOIN c2 ON af.cell = c2.cell),
       |codes AS (
       |  SELECT vec_id, cell, unnest(range(0, $m)) AS j,
       |    unnest($codesArr) AS code
       |  FROM (SELECT vec_id, cell, $dCols FROM resid)),
       |qs AS (SELECT vec_id AS query_id, q FROM q0 WHERE vec_id < 10),
       |probe AS (
       |  SELECT query_id, cell,
       |    list_transform(range(1, ${dim + 1}), i -> q[i] - c[i]) AS qr
       |  FROM (
       |    SELECT qs.query_id, c2.cell, qs.q, c2.c,
       |      row_number() OVER (PARTITION BY qs.query_id
       |        ORDER BY ${dist("qs.q", "c2.c")}, c2.cell) AS rn
       |    FROM qs CROSS JOIN c2)
       |  WHERE rn <= $nprobe),
       |dtab AS (
       |  SELECT query_id, cell, jc.j AS j, jc.c AS code,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, ${sub + 1}), i ->
       |        (qr[jc.j * $sub + i] - ($cbAll)[jc.j + 1][jc.c + 1][i])
       |        * (qr[jc.j * $sub + i] - ($cbAll)[jc.j + 1][jc.c + 1][i]))),
       |      (acc, x) -> acc + x) AS dcell
       |  FROM probe CROSS JOIN (
       |    SELECT j, c FROM (SELECT unnest(range(0, $m)) AS j)
       |    CROSS JOIN (SELECT unnest(range(0, $k)) AS c)) jc),
       |adc AS (
       |  SELECT query_id, vec_id, CAST(SUM(dcell) AS BIGINT) AS adc
       |  FROM codes JOIN dtab ON codes.cell = dtab.cell
       |    AND codes.j = dtab.j AND codes.code = dtab.code
       |  WHERE query_id <> vec_id
       |  GROUP BY query_id, vec_id)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank,
       |  vec_id AS neighbor_id, adc
       |FROM (
       |  SELECT query_id, vec_id, adc,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc, vec_id) AS rank
       |  FROM adc)
       |WHERE rank <= $topK
       |ORDER BY query_id, rank""".stripMargin
  }

  // -------------------------------------------------- corpus selection

  /** DuckDB rendering of [[Selection.hashValue]]: parse the first 8
    * hex chars of md5(key) with an exact integer fold — bit-identical
    * to Spark's `conv(substring(md5(key),1,8),16,10)`. The ONE
    * rendering of the determinism-critical hash; bucket = % n. */
  private def duckHash(key: String): String =
    s"""(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |     list_transform(regexp_extract_all(substr(md5($key), 1, 8), '.'),
       |       c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT))),
       |     (acc, d) -> acc * 16 + d))""".stripMargin

  /** DuckDB rendering of [[Selection.hashBucket]]. */
  private def duckBucket(key: String, n: Int): String =
    s"(${duckHash(key)} % $n)"

  /** c01: deterministic train/val/test split assignment (80/10/10) —
    * membership is a pure function of (salt, doc_id), reproducible by
    * any engine, stable as the corpus grows. */
  def c01SplitAssign(s: SparkSession, d: String): DataFrame =
    Selection.assignSplits(Tables.documents(s, d), "doc_id")
      .select("doc_id", "split")
      .orderBy("doc_id")

  val c01Sql: String = {
    val b = duckBucket("'graft:' || CAST(doc_id AS VARCHAR)", 100)
    s"""SELECT doc_id,
       |  CASE WHEN $b < 80 THEN 'train'
       |       WHEN $b < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** c02: stratified sampling — 50% of src0, 25% of src1, 10% of the
    * rest, decided by the salted hash gate (nested across rates). */
  def c02StratifiedSample(s: SparkSession, d: String): DataFrame =
    Selection.stratifiedSample(Tables.documents(s, d), "doc_id", "source",
        Map("src0" -> 50, "src1" -> 25), defaultPct = 10)
      .select("doc_id", "source")
      .orderBy("doc_id")

  val c02Sql: String = {
    val b = duckBucket("'sample:' || CAST(doc_id AS VARCHAR)", 100)
    s"""SELECT doc_id, source FROM documents
       |WHERE $b < CASE WHEN source = 'src0' THEN 50
       |                WHEN source = 'src1' THEN 25 ELSE 10 END
       |ORDER BY doc_id""".stripMargin
  }

  /** c03: benchmark decontamination report — training docs (doc_id %
    * 97 ≠ 0) sharing ≥1 word 3-gram with the held-out eval slice
    * (doc_id % 97 = 0), with distinct shared-shingle counts. */
  def c03Decontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Selection.contaminationReport(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 3)
      .orderBy("doc_id")
  }

  val c03Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |        FROM documents)),
      |ev AS (SELECT DISTINCT unnest(sh) AS s FROM tok WHERE doc_id % 97 = 0),
      |tr AS (SELECT doc_id, unnest(sh) AS s FROM tok WHERE doc_id % 97 <> 0)
      |SELECT tr.doc_id AS doc_id, COUNT(*) AS n_shared
      |FROM tr JOIN ev ON tr.s = ev.s
      |GROUP BY tr.doc_id ORDER BY doc_id""".stripMargin

  /** c04: sequence packing — documents in id order form one token
    * stream cut into 128-token training sequences; per-doc global
    * start offset and sequence id via the distributed two-phase
    * prefix sum (shardSize 100 exercises multiple shards + the
    * offset join at every SF). */
  def c04PackSequences(s: SparkSession, d: String): DataFrame =
    Selection.packSequences(Tables.documents(s, d), "doc_id", "text",
        budget = 128, shardSize = 100L)
      .orderBy("doc_id")

  val c04Sql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
      |      AS n_tokens
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS start_token
      |  FROM t)
      |SELECT doc_id, n_tokens, start_token,
      |  start_token // 128 AS seq_id
      |FROM r ORDER BY doc_id""".stripMargin

  /** c05: domain-mixture resampling — src0 upweighted 2.5×, src1
    * downsampled to 0.4×, everything else kept; deterministic
    * hash-gated fractional copies. */
  def c05MixtureResample(s: SparkSession, d: String): DataFrame =
    Selection.mixtureResample(Tables.documents(s, d), "doc_id", "source",
        Map("src0" -> 2.5, "src1" -> 0.4))
      .select(col("doc_id"), col("source"), col("copy").cast(LongType))
      .orderBy("doc_id", "copy")

  val c05Sql: String = {
    val b = duckBucket("'mix:' || CAST(doc_id AS VARCHAR)", 1000000)
    s"""WITH w AS (
       |  SELECT doc_id, source,
       |    CASE WHEN source = 'src0' THEN 2.5
       |         WHEN source = 'src1' THEN 0.4 ELSE 1.0 END AS w
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, source,
       |    CAST(floor(w) AS BIGINT) +
       |    CASE WHEN $b < CAST(round((w - floor(w)) * 1000000) AS BIGINT)
       |         THEN 1 ELSE 0 END AS reps
       |  FROM w)
       |SELECT doc_id, source,
       |  CAST(unnest(generate_series(1, reps)) AS BIGINT) AS copy
       |FROM r WHERE reps > 0 ORDER BY doc_id, copy""".stripMargin
  }

  /** c07: cluster-balanced curation — cap every embedding cluster
    * (label) at 10 members, drawn in deterministic salted-hash order;
    * the diversity pass that stops over-represented modes from
    * dominating a training mix. */
  def c07ClusterQuota(s: SparkSession, d: String): DataFrame =
    Selection.clusterQuotaSample(Tables.embeddings(s, d), "vec_id",
        "label", cap = 10)
      .select("vec_id", "label")
      .orderBy("vec_id")

  val c07Sql: String = {
    val h = duckHash("'quota:' || CAST(vec_id AS VARCHAR)")
    s"""SELECT vec_id, label FROM (
       |  SELECT vec_id, label,
       |    ROW_NUMBER() OVER (PARTITION BY label ORDER BY $h, vec_id) AS draw
       |  FROM embeddings)
       |WHERE draw <= 10 ORDER BY vec_id""".stripMargin
  }

  /** c08: deterministic shuffle + sharding — every document's output
    * shard and its position within the shard in salted-hash order;
    * the reproducible "randomize then shard" layout before training. */
  def c08ShuffleShards(s: SparkSession, d: String): DataFrame =
    Selection.shuffleShards(Tables.documents(s, d), "doc_id", nShards = 8)
      .select("doc_id", "shard", "pos")
      .orderBy("doc_id")

  val c08Sql: String = {
    val h = duckHash("'shuffle:' || CAST(doc_id AS VARCHAR)")
    s"""SELECT doc_id, $h % 8 AS shard,
       |  ROW_NUMBER() OVER (PARTITION BY $h % 8 ORDER BY $h, doc_id) AS pos
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** c09: end-to-end curation pipeline — the stages composed the way
    * a real corpus build runs them: language + quality gate
    * (en, ≥5 tokens, repetition < 0.5) → exact dedup keeping the
    * first copy → deterministic split assignment. One oracle checks
    * the whole chain; every stage stays in the scan's codegen span
    * except the single dedup hash-agg shuffle. */
  def c09CurationPipeline(s: SparkSession, d: String): DataFrame = {
    val gated = Tables.documents(s, d).filter(
      TextOps.langId(col("text")) === "en" &&
        TextOps.tokenCount(col("text")) >= 5 &&
        TextOps.repetitionRatio(col("text")) < 0.5)
    val deduped = gated.groupBy(col("text"))
      .agg(min("doc_id").as("doc_id"))
    Selection.assignSplits(deduped, "doc_id")
      .select("doc_id", "split")
      .orderBy("doc_id")
  }

  val c09Sql: String = {
    val b = duckBucket("'graft:' || CAST(doc_id AS VARCHAR)", 100)
    s"""WITH gated AS (
       |  SELECT doc_id, text,
       |    len(list_filter(string_split(text,' '), x -> x <> '')) AS n_tok
       |  FROM documents
       |  WHERE len(list_filter(list_filter(string_split(text,' '), x -> x <> ''),
       |            t -> t IN ('the','a','of','and','in','to','is')))
       |        / len(list_filter(string_split(text,' '), x -> x <> '')) >= 0.05
       |    AND len(list_filter(string_split(text,' '), x -> x <> '')) >= 5),
       |rep AS (
       |  SELECT doc_id, text FROM (
       |    SELECT doc_id, text,
       |      list_filter(string_split(text,' '), x -> x <> '') AS w
       |    FROM gated)
       |  WHERE len(w) - 1 <= 0 OR
       |    1.0 - len(list_distinct(list_transform(range(1, len(w)),
       |          i -> w[i] || ' ' || w[i+1]))) / (len(w) - 1) < 0.5),
       |deduped AS (
       |  SELECT MIN(doc_id) AS doc_id FROM rep GROUP BY text)
       |SELECT doc_id,
       |  CASE WHEN $b < 80 THEN 'train'
       |       WHEN $b < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM deduped ORDER BY doc_id""".stripMargin
  }

  /** c06: corpus vocabulary — top-20 tokens by frequency, ties
    * lexicographic; executes as TakeOrderedAndProject (per-partition
    * top-k, never a full sort). */
  def c06VocabTopK(s: SparkSession, d: String): DataFrame =
    Selection.vocabTopK(Tables.documents(s, d), "text", 20)

  val c06Sql: String =
    """SELECT token, COUNT(*) AS cnt
      |FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
      |        AS token
      |      FROM documents)
      |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin

  /** s05: distributed k-means (Lloyd's, 8 cells, deterministic
    * hash-drawn seeds) as a QUANTITATIVE descent gate: 3 training
    * iterations must cut the clustering objective (total within-cell
    * squared L2, [[Ann.kmeansSse]]) to ≤ 90% of the seed centroids'
    * objective. Observed ratio ≈ 0.57-0.58 at sf0.001/0.01/0.1
    * (GateProbe), so the bound has >30 points of margin; exact Lloyd's
    * (squared objective — the one its mean update minimizes) descends
    * monotonically and the float trainer's merge-order jitter is
    * orders of magnitude below it. The trained ASSIGNMENT is
    * float-merge-order sensitive and stays spec-tested
    * (planted-cluster recovery, degeneracy guard); s09 pins the
    * trainer machinery bit-for-bit in integer arithmetic. */
  /** The s05 gate's objective evaluation at an iteration count — ONE
    * body shared with tools.GateProbe, so the recorded calibration
    * evidence can never drift from the shipped gate's computation. */
  private[graft] def kmeansSseAt(emb: DataFrame, iters: Int): Double =
    Ann.kmeansSse(emb, "embedding",
      Ann.kmeansCentroids(emb, "vec_id", "embedding", k = 8, iters = iters))

  def s05Kmeans(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val sse0 = kmeansSseAt(emb, 0)
    val sse3 = kmeansSseAt(emb, 3)
    emb.agg(count(lit(1)).as("n_points"))
      .select(col("n_points"),
        lit(if (sse3 * 10.0 <= sse0 * 9.0) 1L else 0L).as("descended"))
  }

  val s05Sql: String =
    """SELECT COUNT(*) AS n_points, CAST(1 AS BIGINT) AS descended
      |FROM embeddings""".stripMargin

  // -------------------------------------------------------- multimodal

  /** m01: multimodal column plumbing — opaque binary payloads through
    * the per-partition decode stage; byte counts and digests are
    * engine-portable (md5 of the same UTF-8 bytes). */
  def m01MediaMeta(s: SparkSession, d: String): DataFrame = {
    import graft.multimodal.Multimodal
    Multimodal.decodeFeatures(Multimodal.mediaFromDocuments(s, d))
      .select(col("media_id"), col("n_bytes"), col("digest"))
      .orderBy("media_id")
  }

  val m01Sql: String =
    """SELECT doc_id AS media_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS digest
      |FROM documents ORDER BY media_id""".stripMargin

  /** m02: decoded feature vectors (stub codec). The stub's lane sums
    * are exact small integers, so the compared output renders the
    * vector as a JSON string of ints — array-free (the hash harness
    * cannot sort array columns) and bit-exactly reproducible by the
    * DuckDB oracle from `md5(text)`. */
  def m02MediaFeatures(s: SparkSession, d: String): DataFrame = {
    import graft.multimodal.Multimodal
    Multimodal.decodeFeatures(Multimodal.mediaFromDocuments(s, d))
      .select(col("media_id"),
        to_json(col("feature").cast(ArrayType(IntegerType)))
          .as("feature_json"))
      .orderBy("media_id")
  }

  val m02Sql: String =
    """SELECT doc_id AS media_id,
      |  CAST(to_json(list_transform(range(0, 8), j ->
      |    CAST(list_sum(list_transform(range(0, 4), k ->
      |      ord(substr(md5(text), 1 + j + 8 * k, 1)))) AS INTEGER)))
      |    AS VARCHAR) AS feature_json
      |FROM documents ORDER BY media_id""".stripMargin

  /** m03: REAL frame sampling — every 3rd frame of a genuine
    * animated-GIF container (m08's fixture), decoded with
    * `javax.imageio` read sequences
    * ([[graft.multimodal.Multimodal.sampleGifFrames]]); each sampled
    * frame emits its dimensions plus an order-sensitive pixel
    * fingerprint (polynomial fold over row-major pixels) — the
    * frame-identity key a video-dedup stage buckets on, which channel
    * sums (m08) cannot provide. The oracle reproduces every
    * fingerprint from the closed-form pixel function with no codec —
    * so the hash match also proves the GIF round-trip is pixel-exact
    * in ORDER, not just in aggregate. */
  def m03FrameSample(s: SparkSession, d: String): DataFrame = {
    import graft.multimodal.Multimodal
    Multimodal.sampleGifFrames(Multimodal.gifFromDocuments(s, d), stride = 3)
      .orderBy("media_id", "frame_idx")
  }

  val m03Sql: String =
    """WITH fs AS (
      |  SELECT doc_id, unnest(range(0, 2 + doc_id % 3)) AS f FROM documents),
      |sampled AS (SELECT doc_id, f FROM fs WHERE f % 3 = 0)
      |SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_idx,
      |  CAST(3 + doc_id % 4 AS INTEGER) AS width,
      |  CAST(3 + doc_id % 2 AS INTEGER) AS height,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    flatten(list_transform(range(0, 3 + doc_id % 2), y ->
      |      list_transform(range(0, 3 + doc_id % 4), x ->
      |        ((doc_id * 29 + f * 41 + x * 7 + y * 13) % 256) * 65536
      |        + ((doc_id * 37 + f * 43 + x * 11 + y * 3) % 256) * 256
      |        + ((doc_id * 41 + f * 47 + x * 5 + y * 19) % 256))))),
      |    (acc, p) -> (acc * 31 + p) % 2147483647) AS pix_fp
      |FROM sampled ORDER BY media_id, frame_idx""".stripMargin

  /** m04: REAL image codec end to end — each document id is rendered
    * into actual PNG bytes (javax.imageio encode) whose pixels follow
    * a closed-form function of (id, x, y), then decoded back
    * ([[graft.multimodal.Multimodal.MediaCodec.decodeImage]]) into
    * dimensions + per-channel pixel sums. The features come from real
    * decoded pixel data; the oracle reproduces them from the closed
    * form without a codec. Integer-exact throughout. */
  def m04PngDecode(s: SparkSession, d: String): DataFrame = {
    import graft.multimodal.Multimodal
    Multimodal.decodeImageStats(Multimodal.pngFromDocuments(s, d))
      .select(col("media_id"), col("width"), col("height"),
        col("sum_r"), col("sum_g"), col("sum_b"))
      .orderBy("media_id")
  }

  val m04Sql: String =
    """WITH xs AS (
      |  SELECT doc_id, unnest(range(0, 4 + doc_id % 5)) AS x FROM documents),
      |ps AS (
      |  SELECT doc_id, x, unnest(range(0, 4 + doc_id % 3)) AS y FROM xs)
      |SELECT doc_id AS media_id,
      |  CAST(4 + doc_id % 5 AS INTEGER) AS width,
      |  CAST(4 + doc_id % 3 AS INTEGER) AS height,
      |  CAST(SUM((doc_id * 31 + x * 7 + y * 13) % 256) AS BIGINT) AS sum_r,
      |  CAST(SUM((doc_id * 17 + x * 11 + y * 3) % 256) AS BIGINT) AS sum_g,
      |  CAST(SUM((doc_id * 23 + x * 5 + y * 19) % 256) AS BIGINT) AS sum_b
      |FROM ps GROUP BY doc_id ORDER BY media_id""".stripMargin

  /** m05: REAL WAV audio decode — every document id becomes a genuine
    * RIFF/WAVE payload (mono PCM16, closed-form samples), the engine
    * decodes it with `javax.sound.sampled`, and the oracle reproduces
    * the decoded-sample statistics from the closed form without any
    * codec (the m04 pattern applied to audio). */
  def m05WavDecode(s: SparkSession, d: String): DataFrame = {
    import graft.multimodal.Multimodal
    Multimodal.decodeAudioStats(Multimodal.wavFromDocuments(s, d))
      .select(col("media_id"), col("sample_rate"), col("n_samples"),
        col("sum_samples"), col("max_abs"))
      .orderBy("media_id")
  }

  val m05Sql: String =
    """WITH ss AS (
      |  SELECT doc_id, unnest(range(0, 64 + doc_id % 33)) AS i FROM documents),
      |vs AS (
      |  SELECT doc_id, ((doc_id * 7919 + i * 104729) % 65536) - 32768 AS v
      |  FROM ss)
      |SELECT doc_id AS media_id,
      |  CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate,
      |  CAST(64 + doc_id % 33 AS BIGINT) AS n_samples,
      |  CAST(SUM(v) AS BIGINT) AS sum_samples,
      |  CAST(MAX(ABS(v)) AS BIGINT) AS max_abs
      |FROM vs GROUP BY doc_id ORDER BY media_id""".stripMargin

  /** m06: REAL image RESIZE — decode the genuine PNG payloads, map
    * every output pixel to its nearest-neighbor source pixel (pure
    * integer index math), and verify the RESIZED channel sums against
    * an oracle that composes the closed-form pixel function with the
    * same index mapping — the resize every vision pipeline runs
    * before batching, end-to-end through a real codec. */
  def m06ResizeStats(s: SparkSession, d: String): DataFrame = {
    import graft.multimodal.Multimodal
    Multimodal.resizedImageStats(Multimodal.pngFromDocuments(s, d),
        outW = 6, outH = 4)
      .select(col("media_id"), col("width"), col("height"),
        col("sum_r"), col("sum_g"), col("sum_b"))
      .orderBy("media_id")
  }

  val m06Sql: String =
    """WITH xs AS (
      |  SELECT doc_id, unnest(range(0, 6)) AS x FROM documents),
      |ps AS (
      |  SELECT doc_id, x, unnest(range(0, 4)) AS y FROM xs),
      |mm AS (
      |  SELECT doc_id,
      |    (x * (4 + doc_id % 5)) // 6 AS sx,
      |    (y * (4 + doc_id % 3)) // 4 AS sy
      |  FROM ps)
      |SELECT doc_id AS media_id,
      |  CAST(6 AS INTEGER) AS width,
      |  CAST(4 AS INTEGER) AS height,
      |  CAST(SUM((doc_id * 31 + sx * 7 + sy * 13) % 256) AS BIGINT) AS sum_r,
      |  CAST(SUM((doc_id * 17 + sx * 11 + sy * 3) % 256) AS BIGINT) AS sum_g,
      |  CAST(SUM((doc_id * 23 + sx * 5 + sy * 19) % 256) AS BIGINT) AS sum_b
      |FROM mm GROUP BY doc_id ORDER BY media_id""".stripMargin

  /** m07: REAL audio feature extraction — decode the genuine WAV
    * payloads and reduce each to an 8-band Σ|sample| energy profile
    * (the cheap fingerprint audio dedup/quality gates run on); the
    * oracle recomputes every band from the closed-form sample
    * function with no codec. */
  def m07AudioEnergy(s: SparkSession, d: String): DataFrame = {
    import graft.multimodal.Multimodal
    Multimodal.audioEnergyProfile(Multimodal.wavFromDocuments(s, d))
      .select(col("media_id"), posexplode(col("energy")))
      .toDF("media_id", "band", "energy")
      .orderBy("media_id", "band")
  }

  val m07Sql: String =
    """WITH ss AS (
      |  SELECT doc_id, 64 + doc_id % 33 AS n,
      |    unnest(range(0, 64 + doc_id % 33)) AS i
      |  FROM documents),
      |vs AS (
      |  SELECT doc_id, n, i,
      |    abs(((doc_id * 7919 + i * 104729) % 65536) - 32768) AS a
      |  FROM ss)
      |SELECT doc_id AS media_id, CAST(b AS INTEGER) AS band,
      |  CAST(SUM(a) AS BIGINT) AS energy
      |FROM vs CROSS JOIN (SELECT unnest(range(0, 8)) AS b)
      |WHERE i >= (b * n) // 8 AND i < ((b + 1) * n) // 8
      |GROUP BY doc_id, b
      |ORDER BY media_id, band""".stripMargin

  /** m08: REAL multi-frame (video-shaped) frame extraction — every
    * document id becomes a genuine ANIMATED GIF (the one multi-frame
    * container the JVM ships a codec for; frames written indexed with
    * exact per-frame palettes, interlace disabled), the engine
    * extracts every frame with `javax.imageio` read sequences and
    * keeps every 2nd frame (the sampling step of a video pipeline),
    * and the oracle reproduces each sampled frame's channel sums from
    * the closed-form pixel function with no codec. m03 runs the same
    * container through the stride-sampling stage with per-frame pixel
    * FINGERPRINTS (order-sensitive) instead of channel sums. */
  def m08GifFrames(s: SparkSession, d: String): DataFrame = {
    import graft.multimodal.Multimodal
    Multimodal.gifFrameStats(Multimodal.gifFromDocuments(s, d))
      .filter(col("frame_idx") % 2 === 0)
      .orderBy("media_id", "frame_idx")
  }

  val m08Sql: String =
    """WITH fs AS (
      |  SELECT doc_id, unnest(range(0, 2 + doc_id % 3)) AS f FROM documents),
      |sampled AS (SELECT doc_id, f FROM fs WHERE f % 2 = 0),
      |xs AS (
      |  SELECT doc_id, f, unnest(range(0, 3 + doc_id % 4)) AS x FROM sampled),
      |ps AS (
      |  SELECT doc_id, f, x, unnest(range(0, 3 + doc_id % 2)) AS y FROM xs)
      |SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_idx,
      |  CAST(3 + doc_id % 4 AS INTEGER) AS width,
      |  CAST(3 + doc_id % 2 AS INTEGER) AS height,
      |  CAST(SUM((doc_id * 29 + f * 41 + x * 7 + y * 13) % 256) AS BIGINT) AS sum_r,
      |  CAST(SUM((doc_id * 37 + f * 43 + x * 11 + y * 3) % 256) AS BIGINT) AS sum_g,
      |  CAST(SUM((doc_id * 41 + f * 47 + x * 5 + y * 19) % 256) AS BIGINT) AS sum_b
      |FROM ps GROUP BY doc_id, f ORDER BY media_id, frame_idx""".stripMargin

  /** m09: REAL image feature extraction — 4-bin-per-channel color
    * histograms over the decoded PNG pixels
    * ([[graft.multimodal.Multimodal.imageHistogram]]): the classic
    * pre-learned retrieval/near-dup image feature, computed from real
    * codec output and integer-exact, so the oracle reproduces every
    * count from the closed-form pixel function with no codec. This
    * retires "feature extraction" as a fake: m02's digest featurizer
    * remains only as the shape contract for LEARNED (model-weight)
    * featurizers, which genuinely don't exist in this container. */
  def m09ImageHistogram(s: SparkSession, d: String): DataFrame = {
    import graft.multimodal.Multimodal
    Multimodal.imageHistogram(Multimodal.pngFromDocuments(s, d), bins = 4)
      .orderBy("media_id", "channel", "bin")
  }

  val m09Sql: String =
    """WITH xs AS (
      |  SELECT doc_id, unnest(range(0, 4 + doc_id % 5)) AS x FROM documents),
      |ps AS (
      |  SELECT doc_id, x, unnest(range(0, 4 + doc_id % 3)) AS y FROM xs),
      |px AS (
      |  SELECT doc_id,
      |    (doc_id * 31 + x * 7 + y * 13) % 256 AS r,
      |    (doc_id * 17 + x * 11 + y * 3) % 256 AS g,
      |    (doc_id * 23 + x * 5 + y * 19) % 256 AS b
      |  FROM ps),
      |long AS (
      |  SELECT doc_id, 'r' AS channel, r // 64 AS bin FROM px
      |  UNION ALL SELECT doc_id, 'g', g // 64 FROM px
      |  UNION ALL SELECT doc_id, 'b', b // 64 FROM px),
      |counts AS (
      |  SELECT doc_id, channel, bin, COUNT(*) AS n
      |  FROM long GROUP BY doc_id, channel, bin),
      |dense AS (
      |  SELECT d.doc_id, c.channel, b.bin
      |  FROM (SELECT DISTINCT doc_id FROM documents) d
      |  CROSS JOIN (SELECT unnest(['r','g','b']) AS channel) c
      |  CROSS JOIN (SELECT unnest(range(0, 4)) AS bin) b)
      |SELECT dense.doc_id AS media_id, dense.channel AS channel,
      |  CAST(dense.bin AS BIGINT) AS bin,
      |  CAST(COALESCE(counts.n, 0) AS BIGINT) AS n
      |FROM dense LEFT JOIN counts
      |  ON counts.doc_id = dense.doc_id AND counts.channel = dense.channel
      | AND counts.bin = dense.bin
      |ORDER BY media_id, channel, bin""".stripMargin

  /** m10: file-based multimodal INGESTION — the PNG fixtures are
    * materialized as real `.png` FILES on disk and read back through
    * Spark's built-in `binaryFile` source (path/length/content rows,
    * small files bin-packed into splits), then decoded with the real
    * codec. This is the production shape of a vision corpus — payloads
    * as objects in a store, not rows already in a table — and the scan
    * itself supplies decode parallelism (one split per file group).
    * Output equals m04's, so the same closed-form oracle verifies the
    * entire file write → binaryFile scan → codec decode loop. */
  def m10BinaryFileIngest(s: SparkSession, d: String): DataFrame = {
    import graft.multimodal.Multimodal
    val dir = Multimodal.pngFileFixture(s, d)
    Multimodal.imageStatsFromFiles(s, dir)
      .select(col("media_id"), col("width"), col("height"),
        col("sum_r"), col("sum_g"), col("sum_b"))
      .orderBy("media_id")
  }

  val m10Sql: String = m04Sql

  /** m11: perceptual image fingerprint — the aHash every cheap image
    * dedup runs ([[graft.multimodal.Multimodal.imageAHash]]: real PNG
    * decode → 8×8 nearest-neighbor downsample → integer grayscale →
    * mean-threshold bits), emitted as two unsigned 32-bit halves +
    * the set-bit count. The oracle rebuilds every BIT from the pixel
    * closed form (m04/m06's pattern: the same resize index math, the
    * same integer grayscale and mean), so a hash match pins the
    * entire codec → resize → threshold → pack path. Near-dup pairing
    * over these hashes is d04's chunk-collision machinery unchanged
    * (spec plants a one-pixel edit and checks its hamming). */
  def m11ImageAHash(s: SparkSession, d: String): DataFrame = {
    import graft.multimodal.Multimodal
    Multimodal.imageAHash(Multimodal.pngFromDocuments(s, d), side = 8)
      .orderBy("media_id")
  }

  val m11Sql: String =
    """WITH xs AS (
      |  SELECT doc_id, unnest(range(0, 8)) AS x FROM documents),
      |ps AS (
      |  SELECT doc_id, x, unnest(range(0, 8)) AS y FROM xs),
      |g AS (
      |  SELECT doc_id, x, y,
      |    (((doc_id * 31 + sx * 7 + sy * 13) % 256)
      |     + ((doc_id * 17 + sx * 11 + sy * 3) % 256)
      |     + ((doc_id * 23 + sx * 5 + sy * 19) % 256)) // 3 AS gray
      |  FROM (SELECT doc_id, x, y,
      |          (x * (4 + doc_id % 5)) // 8 AS sx,
      |          (y * (4 + doc_id % 3)) // 8 AS sy
      |        FROM ps)),
      |m AS (SELECT doc_id, SUM(gray) // 64 AS mean FROM g GROUP BY doc_id),
      |b AS (
      |  SELECT g.doc_id, y * 8 + x AS i,
      |    CASE WHEN gray > mean THEN 1 ELSE 0 END AS bit
      |  FROM g JOIN m ON g.doc_id = m.doc_id)
      |SELECT doc_id AS media_id,
      |  CAST(SUM(CASE WHEN i < 32 THEN bit * (CAST(1 AS BIGINT) << i)
      |       ELSE 0 END) AS BIGINT) AS ahash_lo,
      |  CAST(SUM(CASE WHEN i >= 32 THEN bit * (CAST(1 AS BIGINT) << (i - 32))
      |       ELSE 0 END) AS BIGINT) AS ahash_hi,
      |  CAST(SUM(bit) AS BIGINT) AS n_set
      |FROM b GROUP BY doc_id ORDER BY media_id""".stripMargin

  /** m12: IMAGE near-dup detection as a COUNT GATE — the m11
    * fingerprints run through the SimHash chunk-collision machinery
    * ([[graft.dedup.Dedup.hammingPairsFromSignatures]]): the corpus
    * images plus a planted near-dup slice (every doc_id % 10 == 0
    * image re-rendered with its (0,0) pixel blown out —
    * [[graft.multimodal.Multimodal.pngEditedCopies]]) are hashed,
    * 16-bit-chunk bucketed, and exact-hamming verified at ≤ 16. The
    * synthetic gradients are LOW-ENTROPY for any perceptual hash
    * (smooth images collide — the reason pHash variants exist), so
    * the full pair list is collision-dominated and corpus-quadratic;
    * the query therefore emits the d03-style one-row gate instead:
    * (n_pairs, n_planted_found, n_planted_total), with the oracle
    * rebuilding BOTH hash sets from the pixel closed form (the edit
    * is one CASE), applying the SAME chunk-collision candidate rule,
    * and recomputing every hamming — so all three counts are
    * bit-reproduced.
    *
    * The shipped path runs with the hot-bucket cap ON
    * (`maxBucketSize = 256`, the SKEW_PROBE-selected setting: at the
    * 10× corpus the uncapped join emits 178M collision pairs in
    * 37.7 s vs 1.4M in 3.2 s capped — the 100 TB default must be the
    * capped one), and the oracle applies the IDENTICAL rule: a
    * (chunk, value) bucket with more than 256 members contributes no
    * candidates. A planted pair whose EVERY shared chunk is hot is
    * dropped by both sides alike — n_planted_found gates the capped
    * rule's recall, bit-reproduced, not recall 1.0. */
  def m12ImageNearDup(s: SparkSession, d: String): DataFrame = {
    import graft.multimodal.Multimodal
    val all = Multimodal.pngFromDocuments(s, d)
      .unionByName(Multimodal.pngEditedCopies(s, d))
    // cache: the chunk self-join reads the signature frame from both
    // sides — without this the PNG encode/decode/hash pipeline (the
    // expensive stage) can run twice (the simhashPairs contract)
    val sigs = Multimodal.imageAHash(all, side = 8)
      .select(col("media_id"),
        (col("ahash_lo").bitwiseOR(shiftleft(col("ahash_hi"), 32)))
          .as("sig"))
      .cache()
    val pairs = Dedup.hammingPairsFromSignatures(sigs, "media_id", "sig",
      maxHamming = 16, maxBucketSize = Some(256))
    val planted = Tables.documents(s, d)
      .filter(col("doc_id") % 10 === 0)
      .agg(count(lit(1)).as("n_planted_total"))
    pairs
      .agg(count(lit(1)).as("n_pairs"),
        sum((col("b_id") === col("a_id") + Multimodal.EditedIdOffset)
          .cast(LongType))
          .as("n_planted_found"))
      .crossJoin(broadcast(planted))
      .select(col("n_pairs"), col("n_planted_found"),
        col("n_planted_total"))
  }

  /** CTE prefix shared by the m12 (one-shot) and m13 (streamed)
    * oracles: rebuild both aHash sets — corpus + planted edits — from
    * the pixel closed form, down to the 16-bit chunk explosion `ch`. */
  private val mImageHashCtes: String =
    """ids AS (
      |  SELECT doc_id AS media_id, doc_id AS id, 0 AS is_edit FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000, doc_id, 1 FROM documents WHERE doc_id % 10 = 0),
      |xs AS (SELECT media_id, id, is_edit, unnest(range(0, 8)) AS x FROM ids),
      |ps AS (SELECT media_id, id, is_edit, x, unnest(range(0, 8)) AS y FROM xs),
      |mm AS (SELECT media_id, id, is_edit, x, y,
      |    (x * (4 + id % 5)) // 8 AS sx, (y * (4 + id % 3)) // 8 AS sy
      |  FROM ps),
      |g AS (SELECT media_id, x, y,
      |    CASE WHEN is_edit = 1 AND sx = 0 AND sy = 0 THEN 255
      |         ELSE (((id * 31 + sx * 7 + sy * 13) % 256)
      |               + ((id * 17 + sx * 11 + sy * 3) % 256)
      |               + ((id * 23 + sx * 5 + sy * 19) % 256)) // 3 END AS gray
      |  FROM mm),
      |m AS (SELECT media_id, SUM(gray) // 64 AS mean FROM g GROUP BY media_id),
      |b AS (SELECT g.media_id, y * 8 + x AS i,
      |        CASE WHEN gray > mean THEN 1 ELSE 0 END AS bit
      |      FROM g JOIN m ON g.media_id = m.media_id),
      |sig AS (SELECT media_id,
      |    SUM(CASE WHEN i < 32 THEN bit * (CAST(1 AS BIGINT) << i)
      |        ELSE 0 END) AS lo,
      |    SUM(CASE WHEN i >= 32 THEN bit * (CAST(1 AS BIGINT) << (i - 32))
      |        ELSE 0 END) AS hi
      |  FROM b GROUP BY media_id),
      |ch AS (SELECT media_id, lo, hi,
      |    unnest([lo % 65536, lo // 65536, hi % 65536, hi // 65536]) AS chash,
      |    unnest([0, 1, 2, 3]) AS chunk
      |  FROM sig)""".stripMargin

  val m12Sql: String =
    s"""WITH $mImageHashCtes,
      |bsz AS (SELECT chunk, chash, COUNT(*) AS bn
      |  FROM ch GROUP BY chunk, chash),
      |cand AS (SELECT DISTINCT a.media_id AS a_id, b.media_id AS b_id,
      |    a.lo AS alo, a.hi AS ahi, b.lo AS blo, b.hi AS bhi
      |  FROM ch a JOIN ch b
      |    ON a.chunk = b.chunk AND a.chash = b.chash
      |   AND a.media_id < b.media_id
      |  JOIN bsz s ON s.chunk = a.chunk AND s.chash = a.chash
      |  WHERE s.bn <= 256),
      |p AS (SELECT a_id, b_id, hamming FROM (
      |  SELECT a_id, b_id,
      |    CAST(bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) AS BIGINT)
      |      AS hamming
      |  FROM cand)
      |  WHERE hamming <= 16)
      |SELECT COUNT(*) AS n_pairs,
      |  CAST(SUM(CASE WHEN b_id = a_id + 10000000 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_planted_found,
      |  (SELECT COUNT(*) FROM documents WHERE doc_id % 10 = 0)
      |    AS n_planted_total
      |FROM p""".stripMargin

  /** m13: image near-dup detection at INGEST TIME — each arrival
    * batch is decoded and aHash-fingerprinted ONCE
    * ([[graft.multimodal.Multimodal.imageAHash]] inside the ingest's
    * signature stage), scored against the committed 16-byte/row
    * signature index
    * ([[graft.streaming.DedupStream.processSignatureBatch]]:
    * chunk-collision candidates + exact hamming verify, per-batch
    * overwrite crash safety). Like m12, the shipped path runs the
    * hot-bucket cap (`maxBucketSize = 256`) — and under streaming the
    * cap is PREFIX-DEPENDENT ([[graft.dedup.Dedup.hammingPairsFromIndexes]]
    * Scaladoc): each batch's hot-bucket test sees committed-index +
    * batch, so a pair emits iff SOME shared chunk bucket is within
    * the cap at the LATER member's arrival. Because signatures are
    * static (a pair report, no survivor feedback), that rule is still
    * a closed-form function of the arrival split (media_id % 3): the
    * oracle computes per-bucket CUMULATIVE member counts by arrival
    * slice and admits a candidate when the count at
    * greatest(arr_a, arr_b) is ≤ 256 — bit-reproducing the streamed
    * capped set rather than pretending batch-split invariance the cap
    * breaks. At 100 TB this is how an image corpus is actually
    * deduplicated: every image decoded exactly once on arrival, the
    * rolling index holding signatures, never pixels, hot buckets
    * bounded at every join. */
  def m13StreamImageNearDup(s: SparkSession, d: String): DataFrame = {
    import graft.multimodal.Multimodal
    val base = tempDirCleanedOnExit("graft_m13")
    val idx = base.resolve("index").toString
    val pairsDir = base.resolve("pairs").toString
    val ckpt = base.resolve("ckpt").toString
    val media = Multimodal.pngFromDocuments(s, d)
      .unionByName(Multimodal.pngEditedCopies(s, d)).toDF()
    val in = sharedArrivalSlices(s, d, "media", media, "media_id", 3)
    val q = graft.streaming.DedupStream.signatureIngest(s, in,
        media.schema, idx, pairsDir, ckpt, "media_id", "sig",
        maxHamming = 16, maxBucketSize = Some(256)) { batch =>
      import s.implicits._
      Multimodal.imageAHash(batch.as[Multimodal.MediaRecord], side = 8)
        .select(col("media_id"),
          col("ahash_lo").bitwiseOR(shiftleft(col("ahash_hi"), 32))
            .as("sig"))
    }
    try q.processAllAvailable() finally q.stop()
    // explicit schema: a batch with no pairs writes an empty partition
    val pairSchema = StructType(Seq(
      StructField("a_id", LongType), StructField("b_id", LongType),
      StructField("hamming", IntegerType)))
    val pairs = s.read.schema(pairSchema).parquet(pairsDir)
    val planted = Tables.documents(s, d)
      .filter(col("doc_id") % 10 === 0)
      .agg(count(lit(1)).as("n_planted_total"))
    pairs
      .agg(count(lit(1)).as("n_pairs"),
        sum((col("b_id") === col("a_id") + Multimodal.EditedIdOffset)
          .cast(LongType)).as("n_planted_found"))
      .crossJoin(broadcast(planted))
      .select(col("n_pairs"), col("n_planted_found"),
        col("n_planted_total"))
  }

  /** The m13 oracle: the shared hash CTEs, then the PREFIX-capped
    * candidate rule — `cum` is each bucket's cumulative member count
    * by arrival slice, and a candidate pair is admitted through a
    * bucket only if that bucket's count at the later member's slice
    * is within the cap (the exact test the streamed per-batch join
    * performs; see m13's Scaladoc). */
  val m13Sql: String =
    s"""WITH $mImageHashCtes,
      |chb AS (SELECT media_id, lo, hi, chunk, chash,
      |    media_id % 3 AS arr FROM ch),
      |cum AS (SELECT chunk, chash, arr,
      |    SUM(COUNT(*)) OVER (PARTITION BY chunk, chash ORDER BY arr)
      |      AS cn
      |  FROM chb GROUP BY chunk, chash, arr),
      |cand AS (SELECT DISTINCT a.media_id AS a_id, b.media_id AS b_id,
      |    a.lo AS alo, a.hi AS ahi, b.lo AS blo, b.hi AS bhi
      |  FROM chb a JOIN chb b
      |    ON a.chunk = b.chunk AND a.chash = b.chash
      |   AND a.media_id < b.media_id
      |  JOIN cum c ON c.chunk = a.chunk AND c.chash = a.chash
      |   AND c.arr = greatest(a.arr, b.arr)
      |  WHERE c.cn <= 256),
      |p AS (SELECT a_id, b_id, hamming FROM (
      |  SELECT a_id, b_id,
      |    CAST(bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) AS BIGINT)
      |      AS hamming
      |  FROM cand)
      |  WHERE hamming <= 16)
      |SELECT COUNT(*) AS n_pairs,
      |  CAST(SUM(CASE WHEN b_id = a_id + 10000000 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_planted_found,
      |  (SELECT COUNT(*) FROM documents WHERE doc_id % 10 = 0)
      |    AS n_planted_total
      |FROM p""".stripMargin

  /** c10: Bloom-gated decontamination — same contamination semantics
    * as c03 but the scale path: a fixed-size Bloom filter of the eval
    * shingles prunes the train side before the exact join, so the
    * shuffle carries only candidates. Bit-identical to the exact
    * anti-join (the Bloom stage cannot drop a true match), which is
    * exactly what the oracle checks. */
  def c10BloomDecontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Selection.bloomDecontaminate(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 3,
        expectedItems = 1L << 18, fpp = 0.01)
      .select("doc_id", "source")
      .orderBy("doc_id")
  }

  val c10Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |        FROM documents)),
      |ev AS (SELECT DISTINCT unnest(sh) AS s FROM tok WHERE doc_id % 97 = 0),
      |tr AS (SELECT doc_id, unnest(sh) AS s FROM tok WHERE doc_id % 97 <> 0),
      |bad AS (SELECT DISTINCT tr.doc_id FROM tr JOIN ev ON tr.s = ev.s)
      |SELECT d.doc_id AS doc_id, d.source AS source
      |FROM documents d
      |WHERE d.doc_id % 97 <> 0
      |  AND d.doc_id NOT IN (SELECT doc_id FROM bad)
      |ORDER BY doc_id""".stripMargin

  /** c11: sliding-window chunking — 32-token windows every 24 tokens
    * (8-token overlap); the final window may run short but a window
    * fully contained in its predecessor is not emitted (start lattice
    * bounded by n − 32 + 24). Map-only per-row op
    * ([[Selection.chunkSliding]]). */
  def c11ChunkSliding(s: SparkSession, d: String): DataFrame =
    Selection.chunkSliding(Tables.documents(s, d), "doc_id", "text",
        chunkSize = 32, stride = 24)
      .orderBy("doc_id", "chunk_start")

  val c11Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents),
      |st AS (
      |  SELECT doc_id, w,
      |    unnest(range(1, greatest(len(w) - 8, 1) + 1, 24)) AS chunk_start
      |  FROM tok)
      |SELECT doc_id, CAST(chunk_start AS BIGINT) AS chunk_start,
      |  CAST(len(list_slice(w, chunk_start, chunk_start + 31)) AS BIGINT) AS n_tokens,
      |  array_to_string(list_slice(w, chunk_start, chunk_start + 31), ' ') AS chunk_text
      |FROM st ORDER BY doc_id, chunk_start""".stripMargin

  /** c13: the flagship end-to-end pretraining pipeline — NFC normalize
    * → PII redact → clean (lower, digits→`<num>`, whitespace collapse)
    * → quality gate (token count + distinct ratio) → exact dedup (min
    * id per text) → benchmark decontamination (3-gram overlap with the
    * held-out eval slice) → quote/inclusion removal (LSH containment,
    * round 11) → sliding-window chunking → split assignment. Every
    * stage is an operator this engine ships individually (t09 t07 t05
    * t02 d01 c03 d15 c11 c01); this query pins their COMPOSITION,
    * oracle-checked end to end. Redaction runs before cleaning (digit
    * scrubbing would destroy the PII patterns).
    *
    * Plan shape: one map-only projection chain over the scan, a hash
    * agg for dedup, a broadcast semi-join for decontamination, a
    * per-row explode for chunking — two shuffles total (dedup group,
    * decontaminate report), everything else stays in the scan's
    * codegen span. */
  /** The c13 pipeline's intermediate frames, shared with the c14
    * funnel report so both queries pin the SAME composition.
    *
    * `prepped` and `deduped` are cached: the decontamination stage
    * reads the deduped corpus from three plan branches (train side,
    * eval side, report join) and the funnel report counts every
    * stage — without the cache each branch re-runs the NFC + 5-regex
    * prep chain over the whole corpus (measured 5.7 s → 2.4 s at
    * sf0.1). `cleanTrain` and `quoteRemoved` are cached for the same
    * reason: containmentDedup reads its input from two branches
    * (shingle/pair derivation + the survivor anti-join), and the
    * shared materialization ([[sharedPretrain]]) counts every stage
    * while writing the last two — both frames are post-gate,
    * post-dedup (a few % of the corpus), so the cache is small.
    * Callers run `spark.catalog.clearCache()` between corpora
    * (the Verify/Bench harness contract, as Dedup's pair producers). */
  /** The ONE rendering of the pipeline's prep projection and quality
    * gate — shared by the batch chain ([[pretrainStages]]) and its
    * streaming twin (c25), so the two cannot drift. */
  private def prepCol(text: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import graft.functions.UnicodeFunctions
    lower(regexp_replace(regexp_replace(trim(
        TextOps.redactPii(UnicodeFunctions.nfcNormalize(text))),
      "[0-9]+", "<num>"), "\\s+", " "))
  }

  private def gateCond(t: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    TextOps.tokenCount(t).between(20, 1000) &&
      TextOps.distinctRatio(t) >= 0.3

  private def pretrainStages(s: SparkSession, d: String)
      : Seq[(String, DataFrame)] = {
    val prepped = Tables.documents(s, d).select(col("doc_id"),
      prepCol(col("text")).as("t"))
      .cache()
    val gated = prepped.filter(gateCond(col("t")))
    val deduped = gated.groupBy("t").agg(min(col("doc_id")).as("doc_id"))
      .cache()
    val cleanTrain = Selection.decontaminate(
      deduped.filter(col("doc_id") % 97 =!= 0),
      deduped.filter(col("doc_id") % 97 === 0), "doc_id", "t", n = 3)
      .cache()
    // quote/inclusion removal (round 11): a surviving doc ≥ 0.8
    // shingle-contained in a LARGER survivor is redundant — its
    // content lives inside the container. The shipped LSH containment
    // path (d15's operator) finds the pairs; the size/id survivor rule
    // is deterministic ([[graft.dedup.Dedup.containmentDedup]]). The
    // oracle re-derives the stage from the EXACT directed pair set —
    // the d15/d16 equivalence (recall 1.0 on this corpus, verified by
    // the d15b gate; hashed-shingle counts injective).
    val quoteRemoved = Dedup.containmentDedup(cleanTrain, "doc_id", "t",
      n = 3, k = 64, bands = 32, threshold = 0.8)
      .cache()
    val chunks = Selection.chunkSliding(quoteRemoved, "doc_id", "t",
      chunkSize = 32, stride = 24)
    Seq("1_prepped" -> prepped, "2_gated" -> gated, "3_deduped" -> deduped,
      "4_decontaminated" -> cleanTrain, "5_quote_removed" -> quoteRemoved,
      "6_chunks" -> chunks)
  }

  def c13PretrainPipeline(s: SparkSession, d: String): DataFrame = {
    val chunks = pretrainStages(s, d).last._2
    Selection.assignSplits(chunks, "doc_id")
      .select("doc_id", "split", "chunk_start", "n_tokens", "chunk_text")
      .orderBy("doc_id", "chunk_start")
  }

  /** ONE materialization of the c13 chain per fixture dir — the
    * production shape of the capstone family: a deployment computes
    * the pretraining chain ONCE and every downstream consumer (the
    * funnel report, the corpus build) reads its persisted stage
    * outputs, rather than re-deriving the chain per report
    * (round-12 verdict lead: c13+c14+c24 each rebuilding the chain
    * was 28 s of a 160 s bench). c13 itself never reads this cache —
    * it keeps pricing the live pipeline. Sound to share for the same
    * reason as [[sharedIvfIngest]]: every stage is a deterministic
    * function of the fixture dir (regex prep, hash dedup survivor
    * rule, fixed-seed MinHash containment), so every consumer sees
    * identical bytes. Persists the funnel row counts (all six stages
    * counted in one pass while the chain's cached frames are hot) and
    * the `5_quote_removed` frame (the stage c24 builds from). */
  private val pretrainShared =
    new java.util.concurrent.ConcurrentHashMap[String, String]
  private def sharedPretrain(s: SparkSession, d: String): String =
    pretrainShared.computeIfAbsent(d, _ => {
      val dir = tempDirCleanedOnExit("graft_pretrain").toString
      val stages = pretrainStages(s, d)
      // the write materializes the whole chain (and its caches); the
      // funnel counts after it run against the cached frames
      stages.collectFirst { case ("5_quote_removed", df) => df }.get
        .write.parquet(s"$dir/quote_removed")
      stages.map { case (name, df) =>
          df.agg(count(lit(1)).as("n_rows"))
            .select(lit(name).as("stage"), col("n_rows"))
        }
        .reduce(_ unionByName _)
        .coalesce(1).write.parquet(s"$dir/funnel")
      dir
    })

  /** The ONE rendering of the c13 pipeline's CTE chain (the SQL twin
    * of [[pretrainStages]] — duckHash discipline: both the pipeline
    * oracle and the funnel oracle interpolate this constant, so a
    * one-sided edit cannot desynchronize them). */
  /** The ONE SQL rendering of [[prepCol]] — interpolated by the batch
    * chain's CTEs AND the streaming twin's oracle (c25). */
  private val prepSqlExpr: String =
    s"""lower(regexp_replace(regexp_replace(trim(
       |      regexp_replace(regexp_replace(regexp_replace(nfc_normalize(text),
       |        '${TextOps.EmailRe}', '<email>', 'g'),
       |        '${TextOps.Ipv4Re}', '<ip>', 'g'),
       |        '${TextOps.PhoneRe}', '<phone>', 'g')),
       |      '[0-9]+', '<num>', 'g'), '\\s+', ' ', 'g'))""".stripMargin

  private val pretrainCtesSql: String =
    s"""WITH prepped AS (
       |  SELECT doc_id, $prepSqlExpr AS t
       |  FROM documents),
       |gated AS (
       |  SELECT doc_id, t FROM (
       |    SELECT doc_id, t,
       |      list_filter(string_split(t, ' '), x -> x <> '') AS w
       |    FROM prepped)
       |  WHERE len(w) BETWEEN 20 AND 1000
       |    AND len(list_distinct(w)) / len(w) >= 0.3),
       |dedup AS (SELECT MIN(doc_id) AS doc_id, t FROM gated GROUP BY t),
       |sh AS (
       |  SELECT doc_id, w, list_distinct(list_transform(range(1, len(w)-1),
       |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
       |  FROM (SELECT doc_id, list_filter(string_split(t, ' '), x -> x <> '') AS w
       |        FROM dedup)),
       |ev AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id % 97 = 0),
       |bad AS (
       |  SELECT DISTINCT a.doc_id
       |  FROM (SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id % 97 <> 0) a
       |  JOIN ev ON a.s = ev.s),
       |train AS (
       |  SELECT doc_id, w FROM sh
       |  WHERE doc_id % 97 <> 0
       |    AND doc_id NOT IN (SELECT doc_id FROM bad)),
       |qn AS (SELECT doc_id, len(sh) AS nsh FROM sh
       |       WHERE doc_id IN (SELECT doc_id FROM train)),
       |qpair AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
       |  FROM (SELECT doc_id, unnest(sh) AS s FROM sh
       |        WHERE doc_id IN (SELECT doc_id FROM train)) a
       |  JOIN (SELECT doc_id, unnest(sh) AS s FROM sh
       |        WHERE doc_id IN (SELECT doc_id FROM train)) b
       |    ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |qdir AS (
       |  SELECT a_id AS src_id, b_id AS dst_id, inter / na.nsh AS containment,
       |         na.nsh AS n_src, nb.nsh AS n_dst
       |  FROM qpair JOIN qn na ON na.doc_id = a_id
       |             JOIN qn nb ON nb.doc_id = b_id
       |  UNION ALL
       |  SELECT b_id, a_id, inter / nb.nsh, nb.nsh, na.nsh
       |  FROM qpair JOIN qn na ON na.doc_id = a_id
       |             JOIN qn nb ON nb.doc_id = b_id),
       |qdrop AS (
       |  SELECT DISTINCT src_id AS doc_id FROM qdir
       |  WHERE containment >= 0.8
       |    AND (n_src < n_dst OR (n_src = n_dst AND src_id > dst_id))),
       |quote_removed AS (
       |  SELECT doc_id, w FROM train
       |  WHERE doc_id NOT IN (SELECT doc_id FROM qdrop)),
       |st AS (
       |  SELECT doc_id, w,
       |    unnest(range(1, greatest(len(w) - 8, 1) + 1, 24)) AS chunk_start
       |  FROM quote_removed)""".stripMargin

  val c13Sql: String = {
    val b = duckBucket("'graft:' || CAST(doc_id AS VARCHAR)", 100)
    s"""$pretrainCtesSql
       |SELECT doc_id,
       |  CASE WHEN $b < 80 THEN 'train'
       |       WHEN $b < 90 THEN 'val'
       |       ELSE 'test' END AS split,
       |  CAST(chunk_start AS BIGINT) AS chunk_start,
       |  CAST(len(list_slice(w, chunk_start, chunk_start + 31)) AS BIGINT)
       |    AS n_tokens,
       |  array_to_string(list_slice(w, chunk_start, chunk_start + 31), ' ')
       |    AS chunk_text
       |FROM st ORDER BY doc_id, chunk_start""".stripMargin
  }

  /** c14: funnel/retention report for the c13 pipeline — rows
    * surviving each stage (the reference's row-count instrumentation
    * O20 lifted to corpus level: where did my documents go?). Same
    * stage frames as c13 — the counts are computed inside
    * [[sharedPretrain]]'s one chain materialization and read back
    * here, so the report can never drift from the pipeline it
    * describes and never re-derives it. */
  def c14FunnelReport(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"${sharedPretrain(s, d)}/funnel").orderBy("stage")

  val c14Sql: String =
    s"""$pretrainCtesSql
      |SELECT '1_prepped' AS stage, COUNT(*) AS n_rows FROM prepped
      |UNION ALL SELECT '2_gated', COUNT(*) FROM gated
      |UNION ALL SELECT '3_deduped', COUNT(*) FROM dedup
      |UNION ALL SELECT '4_decontaminated', COUNT(*) FROM train
      |UNION ALL SELECT '5_quote_removed', COUNT(*) FROM quote_removed
      |UNION ALL SELECT '6_chunks', COUNT(*) FROM st
      |ORDER BY stage""".stripMargin

  /** c15: curriculum ordering — the corpus cut into 3 equal-depth
    * phases by quality score (cleanest documents first), the standard
    * curriculum-learning data schedule
    * ([[Selection.curriculumPhases]] over [[TextOps.qualityScore]]). */
  def c15Curriculum(s: SparkSession, d: String): DataFrame =
    Selection.curriculumPhases(
        Tables.documents(s, d).select(col("doc_id"),
          TextOps.qualityScore(col("text")).as("quality_score")),
        "doc_id", col("quality_score"), phases = 3)
      .select("doc_id", "phase")
      .orderBy("doc_id")

  val c15Sql: String =
    s"""$duckQualityCtes
      |SELECT doc_id,
      |  CAST(NTILE(3) OVER (ORDER BY ($duckQualityScore) DESC, doc_id)
      |    AS BIGINT) AS phase
      |FROM m ORDER BY doc_id""".stripMargin

  /** c16: curriculum-ordered EXPORT — [[Selection.writeSortedRuns]]
    * lays the corpus out as sorted runs whose file-name order is the
    * global (quality DESC, doc_id) order, then each document's
    * position is derived from the PHYSICAL layout read back in ONE
    * distributed scan: the parquet `_metadata` columns give every row
    * its (file_path, row_index) — the row's byte-order position in its
    * file, straight from the reader, no re-sort — and per-file base
    * offsets are a #files-sized aggregate (metadata, not row data)
    * cumulative-summed and broadcast-joined back. No driver file
    * listing and no per-file `coalesce(1)` round trips: the position
    * of every row is computed where the row is read. The oracle's
    * row_number can only hash-match if the written order is actually
    * the total order. */
  def c16SortedExport(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"),
      TextOps.qualityScore(col("text")).as("q"))
    val out = tempDirCleanedOnExit("graft_c16").resolve("runs").toString
    Selection.writeSortedRuns(docs, Seq(col("q").desc, col("doc_id")),
      out, runs = 8)
    val back = s.read.parquet(out)
      .select(col("doc_id"),
        col("_metadata.file_path").as("fp"),
        col("_metadata.row_index").as("ri"))
    // run files are part-00000..part-0000N under one directory, so
    // path order ≡ name order ≡ run order; the window is over #files
    // rows (8 here, thousands at 100 TB — still metadata-sized)
    val fileBase = back.groupBy("fp").agg(count(lit(1)).as("n"))
      .withColumn("base", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.orderBy("fp")) - col("n"))
      .select("fp", "base")
    back.join(broadcast(fileBase), Seq("fp"))
      .select(col("doc_id"), (col("base") + col("ri") + lit(1L)).as("pos"))
      .orderBy("doc_id")
  }

  val c16Sql: String =
    s"""$duckQualityCtes
      |SELECT doc_id,
      |  CAST(row_number() OVER (ORDER BY ($duckQualityScore) DESC, doc_id)
      |    AS BIGINT) AS pos
      |FROM m ORDER BY doc_id""".stripMargin

  // ---- BPE vocabulary training (graft.corpus.Bpe) -------------------

  /** The shared CTE prefix of the BPE oracles: corpus → word counts →
    * double-space-encoded per-character segmentations (the same
    * encoding [[graft.corpus.Bpe]] trains over). */
  private val duckBpeBase: String =
    """WITH t AS (
      |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents),
      |wc AS (SELECT word, count(*) AS cnt
      |  FROM (SELECT unnest(w) AS word FROM t) GROUP BY word),
      |s0 AS (SELECT '  ' || array_to_string(regexp_extract_all(word, '.'), '  ') || '  ' AS s,
      |  cnt FROM wc)""".stripMargin

  /** `k` UNROLLED trainer iterations as CTE layers — p_i (pair
    * counts), b_i (argmax merge, ties by (l, r)), s_i (vocabulary
    * re-segmented by one `replace`). Because the double-space
    * encoding makes one literal replace ≡ the greedy merge fold, this
    * lets DuckDB re-derive the ITERATIVE trainer's exact output. */
  private def duckBpeIters(k: Int): String =
    (1 to k).map { i =>
      s""",
         |p$i AS (
         |  SELECT c[i] AS l, c[i+1] AS r, CAST(SUM(cnt) AS BIGINT) AS n
         |  FROM (SELECT c, cnt, unnest(range(1, len(c))) AS i
         |        FROM (SELECT string_split(trim(s), '  ') AS c, cnt FROM s${i - 1}))
         |  GROUP BY 1, 2),
         |b$i AS (SELECT l, r, n FROM p$i ORDER BY n DESC, l, r LIMIT 1),
         |s$i AS (SELECT replace(s, ' ' || b.l || '  ' || b.r || ' ',
         |                          ' ' || b.l || b.r || ' ') AS s, cnt
         |        FROM s${i - 1}, b$i b)""".stripMargin
    }.mkString

  /** c17: first-iteration adjacent symbol-pair counts, top 20 —
    * pins [[graft.corpus.Bpe.wordCounts]] + [[graft.corpus.Bpe.pairCounts]]
    * (explode + weighted hash agg over the vocabulary table). */
  def c17BpePairs(s: SparkSession, d: String): DataFrame = {
    val wc = Bpe.wordCounts(Tables.documents(s, d), "text")
    Bpe.pairCounts(
        wc.select(Bpe.spacedChars(col("word")).as("s"), col("cnt")),
        "s", "cnt")
      .orderBy(desc("n"), asc("l"), asc("r")).limit(20)
  }

  val c17Sql: String =
    s"""$duckBpeBase
      |SELECT c[i] AS l, c[i+1] AS r, CAST(SUM(cnt) AS BIGINT) AS n
      |FROM (SELECT c, cnt, unnest(range(1, len(c))) AS i
      |      FROM (SELECT string_split(trim(s), '  ') AS c, cnt FROM s0))
      |GROUP BY 1, 2 ORDER BY n DESC, l, r LIMIT 20""".stripMargin

  /** c18: the iterative distributed trainer itself, 3 merges — the
    * oracle re-derives every iteration (argmax + re-segmentation)
    * through [[duckBpeIters]], so the trainer's driver loop, argmax
    * tie-break, and merge application are ALL hash-pinned. */
  def c18BpeTrain(s: SparkSession, d: String): DataFrame = {
    val merges = Bpe.train(Bpe.wordCounts(Tables.documents(s, d), "text"), 3)
    s.createDataFrame(merges)
      .select(col("rank"), col("left").as("l"), col("right").as("r"), col("n"))
      .orderBy("rank")
  }

  val c18Sql: String =
    s"""$duckBpeBase${duckBpeIters(3)}
      |SELECT CAST(1 AS INTEGER) AS rank, l, r, n FROM b1
      |UNION ALL SELECT CAST(2 AS INTEGER), l, r, n FROM b2
      |UNION ALL SELECT CAST(3 AS INTEGER), l, r, n FROM b3
      |ORDER BY rank""".stripMargin

  /** c19: train-then-segment end to end — the 3 trained merges are
    * applied to every document ([[graft.corpus.Bpe.segmentStats]],
    * map-only: merges ride the plan as literal replaces) and the
    * oracle re-derives the merges AND the per-document subword counts
    * itself, so training + application are pinned as one composed
    * pipeline. */
  def c19BpeSegment(s: SparkSession, d: String): DataFrame = {
    val merges = Bpe.train(Bpe.wordCounts(Tables.documents(s, d), "text"), 3)
    Bpe.segmentStats(Tables.documents(s, d), "doc_id", "text", merges)
      .orderBy("doc_id")
  }

  val c19Sql: String =
    s"""$duckBpeBase${duckBpeIters(3)},
      |doc AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents),
      |wd AS (SELECT doc_id, unnest(w) AS word FROM doc),
      |g0 AS (SELECT doc_id, '  ' || array_to_string(regexp_extract_all(word, '.'), '  ') || '  ' AS s
      |  FROM wd),
      |g1 AS (SELECT doc_id, replace(s, ' ' || b.l || '  ' || b.r || ' ',
      |                                 ' ' || b.l || b.r || ' ') AS s FROM g0, b1 b),
      |g2 AS (SELECT doc_id, replace(s, ' ' || b.l || '  ' || b.r || ' ',
      |                                 ' ' || b.l || b.r || ' ') AS s FROM g1, b2 b),
      |g3 AS (SELECT doc_id, replace(s, ' ' || b.l || '  ' || b.r || ' ',
      |                                 ' ' || b.l || b.r || ' ') AS s FROM g2, b3 b),
      |cnts AS (SELECT doc_id, SUM(len(string_split(trim(s), '  '))) AS ns
      |  FROM g3 GROUP BY doc_id)
      |SELECT doc.doc_id, CAST(len(doc.w) AS BIGINT) AS n_tokens,
      |  CAST(coalesce(cnts.ns, 0) AS BIGINT) AS n_subwords
      |FROM doc LEFT JOIN cnts ON doc.doc_id = cnts.doc_id
      |ORDER BY doc.doc_id""".stripMargin

  /** c20: DSIR-style importance resampling — target domain lang='en',
    * 64 hashed-unigram buckets, integer-rendered ratio weights
    * ([[graft.corpus.Importance]]); the oracle re-derives both model
    * vectors, the per-document mean ratio, and the top-100 selection.
    * Spark plan: two model aggs (collapse to 64 rows), one map-only
    * scoring scan with the model as an array literal, TakeOrdered. */
  def c20ImportanceResample(s: SparkSession, d: String): DataFrame =
    Importance.resample(Tables.documents(s, d), "doc_id", "text",
      col("lang") === "en", k = 100, buckets = 64)

  val c20Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
      |    x -> x <> '')) AS w
      |  FROM documents),
      |tb AS (
      |  SELECT doc_id,
      |    ((list_reduce(list_prepend(CAST(13 AS BIGINT),
      |       list_transform(regexp_extract_all(w, '.'),
      |         c -> CAST(ascii(c) AS BIGINT))),
      |       (acc, c) -> (acc * 137 + c) % 2147483629) << 32)
      |     + list_reduce(list_prepend(CAST(7 AS BIGINT),
      |       list_transform(regexp_extract_all(w, '.'),
      |         c -> CAST(ascii(c) AS BIGINT))),
      |       (acc, c) -> (acc * 131 + c) % 2147483647)) % 64 AS b
      |  FROM tok),
      |raw AS (SELECT b, count(*) AS rn FROM tb GROUP BY b),
      |tgt AS (SELECT b, count(*) AS tn
      |  FROM tb JOIN documents USING (doc_id)
      |  WHERE documents.lang = 'en' GROUP BY b),
      |rat AS (SELECT raw.b,
      |    ((coalesce(tn, 0) + 1) * 1000000) // (rn + 1) AS ratio
      |  FROM raw LEFT JOIN tgt ON raw.b = tgt.b),
      |ds AS (SELECT tb.doc_id, SUM(ratio) AS sc, count(*) AS nt
      |  FROM tb JOIN rat ON tb.b = rat.b GROUP BY tb.doc_id)
      |SELECT d.doc_id, CAST(coalesce(nt, 0) AS BIGINT) AS n_tokens,
      |  CAST(CASE WHEN coalesce(nt, 0) > 0 THEN (sc * 1000) // nt
      |       ELSE 0 END AS BIGINT) AS importance
      |FROM documents d LEFT JOIN ds ON d.doc_id = ds.doc_id
      |ORDER BY importance DESC, d.doc_id LIMIT 100""".stripMargin

  /** c21: fuzzy decontamination report — train docs holding a 3-gram
    * within levenshtein 1 of an eval 3-gram (c03's eval slice), the
    * near-verbatim-leakage check exact matching misses. Eval shingles
    * broadcast keyed by the ±1 length band; levenshtein runs only on
    * band candidates; the train scan never shuffles. The oracle runs
    * the identical band-blocked join (DuckDB levenshtein). */
  def c21FuzzyDecontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Selection.fuzzyContaminationReport(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 3, maxDist = 1)
      .orderBy("doc_id")
  }

  val c21Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
      |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      |        FROM documents)),
      |ev AS (SELECT DISTINCT unnest(sh) AS es FROM tok WHERE doc_id % 97 = 0),
      |evb AS (SELECT es, unnest([len(es)-1, len(es), len(es)+1]) AS band
      |  FROM ev),
      |tr AS (SELECT doc_id, unnest(sh) AS s FROM tok WHERE doc_id % 97 <> 0)
      |SELECT tr.doc_id AS doc_id, COUNT(*) AS n_fuzzy
      |FROM tr JOIN evb ON len(tr.s) = evb.band
      |              AND levenshtein(tr.s, evb.es) <= 1
      |GROUP BY tr.doc_id ORDER BY doc_id""".stripMargin

  /** c22: semantic decontamination report — train vectors within 0.3
    * cosine of an eval vector in the same portable-LSH bucket (d12's
    * blocking; eval slice = vec_id % 7, sized so blocked hits exist
    * at every SF). Embedding-space leakage detection: catches
    * paraphrases n-gram decontamination misses. The oracle re-derives
    * the integer hyperplane buckets and recomputes every intra-bucket
    * cosine. */
  def c22SemanticDecontaminate(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"),
      Ann.portableLshBucket(col("embedding"), nBits = 6, dim = 64).as("bucket"))
    Selection.semanticContaminationReport(
        emb.filter(col("vec_id") % 7 =!= 0),
        emb.filter(col("vec_id") % 7 === 0),
        "vec_id", "embedding", "bucket", threshold = 0.3)
      .orderBy("vec_id")
  }

  val c22Sql: String = {
    val (q, bits) = duckLshBucket(nBits = 6, dim = 64)
    s"""WITH b AS (
       |  SELECT vec_id, embedding,
       |  $bits AS bucket
       |  FROM (SELECT vec_id, embedding, $q AS q FROM embeddings)),
       |tr AS (SELECT * FROM b WHERE vec_id % 7 <> 0),
       |ev AS (SELECT * FROM b WHERE vec_id % 7 = 0)
       |SELECT tr.vec_id AS vec_id, COUNT(*) AS n_close
       |FROM tr JOIN ev ON tr.bucket = ev.bucket
       |WHERE list_cosine_similarity(CAST(tr.embedding AS DOUBLE[]),
       |        CAST(ev.embedding AS DOUBLE[])) >= 0.3
       |GROUP BY tr.vec_id ORDER BY vec_id""".stripMargin
  }

  /** c23: bigram language-model quality scoring — the CCNet/KenLM
    * recipe: fit a bigram LM (add-one smoothing) on the trusted
    * reference class (`lang = 'en'`, like t10/c20's supervision),
    * score every document by average bigram likelihood. The driver
    * query runs the integer-ppm twin
    * ([[Selection.lmScore]] `logProb = false`) so every count,
    * smoothed probability, and document score hash-matches DuckDB;
    * the production per-token log-likelihood path is spec-pinned. */
  def c23LmScore(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Selection.lmScore(docs, docs.filter(col("lang") === "en"),
        "doc_id", "text", logProb = false)
      .orderBy("doc_id")
  }

  val c23Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents),
      |rg AS (
      |  SELECT unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
      |         unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS w2
      |  FROM tok WHERE lang = 'en'),
      |bi AS (SELECT w1, w2, COUNT(*) AS c FROM rg GROUP BY w1, w2),
      |hist AS (SELECT w1, SUM(c) AS h FROM bi GROUP BY w1),
      |voc AS (SELECT COUNT(DISTINCT t) AS v FROM (
      |  SELECT unnest(w) AS t FROM tok WHERE lang = 'en')),
      |occ AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
      |    unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS w2
      |  FROM tok),
      |sc AS (
      |  SELECT o.doc_id, COUNT(*) AS n,
      |    SUM(((coalesce(bi.c, 0) + 1) * 1000000)
      |        // (coalesce(hist.h, 0) + voc.v)) AS s
      |  FROM occ o
      |  LEFT JOIN bi ON o.w1 = bi.w1 AND o.w2 = bi.w2
      |  LEFT JOIN hist ON o.w1 = hist.w1
      |  CROSS JOIN voc
      |  GROUP BY o.doc_id)
      |SELECT d.doc_id,
      |  CAST(coalesce(sc.n, 0) AS BIGINT) AS n_bigrams,
      |  CAST(coalesce(sc.s, 0) AS BIGINT) AS score_sum,
      |  CAST(CASE WHEN coalesce(sc.n, 0) > 0
      |    THEN coalesce(sc.s, 0) // sc.n ELSE 0 END AS BIGINT)
      |    AS score_avg
      |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** c24: the END-TO-END corpus build — every family of the library's
    * LLM-data operators composed into ONE pipeline, checked by ONE
    * oracle (the capstone the per-operator queries build toward):
    *
    *   1–5. c13's pretraining stages: PII-redact + normalize prep,
    *        length/diversity gate, exact dedup (min-id survivor),
    *        3-gram eval decontamination, quote/inclusion removal via
    *        LSH containment — d15's operator with the size/id survivor
    *        rule ([[pretrainStages]], round 11);
    *   6.   near-dup removal AT SCALE: MinHash+LSH pairs over the
    *        prepped text ([[Dedup.minhashLshPairs]] — band-bucket
    *        join, never N²); a doc with a smaller-id near-dup partner
    *        is dropped (deterministic, order-free survivor rule).
    *        Banding is 32×2 (not d03's 16×4): the ORACLE for this
    *        stage is the exact all-pairs Jaccard, so candidate recall
    *        at the J=0.5 threshold must be ~certain — P[collide] =
    *        1−(1−J^rows)^bands is 0.64 at J=0.5 under 16×4 but
    *        1−0.75^32 ≈ 0.9999 under 32×2 (precision is unaffected:
    *        candidates are exact-verified before emission). The gate
    *        is therefore PROBABILISTIC with a quantified envelope:
    *        worst case ~1e-4 miss per exactly-threshold pair, and the
    *        observed gate corpora carry ~25 exact pairs (d03's count
    *        gate), nearly all planted well above J=0.5 where the miss
    *        probability is ≤1e-13 — end-to-end flake odds ≲ a few in
    *        10⁵ per regeneration, and a miss localizes to this stage
    *        by construction (the d03 count gate fails with it);
    *   7.   semantic decontamination: doc embeddings within cosine
    *        0.3 of a held-out eval vector in the same LSH bucket
    *        ([[Selection.semanticContaminationReport]], c22's shape);
    *   8.   curriculum phases by quality score over the surviving
    *        docs ([[Selection.curriculumPhases]], c15's shape);
    *   9.   deterministic shuffle into 8 shards with in-shard
    *        positions ([[Selection.shuffleShards]], c08's shape) —
    *        the layout a data loader streams.
    *
    * The DuckDB oracle re-derives all eight stages (the c13 CTE chain,
    * an exact-Jaccard twin of the LSH stage — the d07-established
    * equivalence — the c22 bucket/cosine join, the c15 NTILE, the c08
    * hash shards) and must hash-match the composition end to end.
    *
    * Plan: the whole pipeline is anti-joins + one LSH band join +
    * one broadcast bucket join over the gated corpus — no stage
    * materializes to the driver; shares pretrainStages'/LSH's
    * documented caching contract. */
  def c24CorpusBuild(s: SparkSession, d: String): DataFrame = {
    import graft.dedup.Dedup
    // round 11: the capstone builds from the QUOTE-REMOVED stage —
    // the containment operator (d15's path) runs inside the capstone
    // composition, and its funnel row shows in c14. Round 12: read
    // from sharedPretrain's one materialization — c24 prices ITS OWN
    // stages (6-9) over the persisted chain output, not a rebuild of
    // stages 1-5 the deployment already has on disk.
    val cleanTrain =
      s.read.parquet(s"${sharedPretrain(s, d)}/quote_removed")
    val pairs = Dedup.minhashLshPairs(cleanTrain, "doc_id", "t",
      n = 3, k = 64, bands = 32, threshold = 0.5)
    val nearDeduped = cleanTrain.join(
      pairs.select(col("b_id").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"),
      Ann.portableLshBucket(col("embedding"), nBits = 6, dim = 64).as("bucket"))
    val flagged = Selection.semanticContaminationReport(
        emb.filter(col("vec_id") % 7 =!= 0),
        emb.filter(col("vec_id") % 7 === 0),
        "vec_id", "embedding", "bucket", threshold = 0.3)
      .select(col("vec_id").as("doc_id"))
    val decon = nearDeduped.join(flagged, Seq("doc_id"), "left_anti")
    val withQ = decon.select(col("doc_id"))
      .join(Tables.documents(s, d).select(col("doc_id"),
        TextOps.qualityScore(col("text")).as("q")), Seq("doc_id"))
    val phased = Selection.curriculumPhases(withQ, "doc_id", col("q"),
      phases = 3)
    Selection.shuffleShards(phased, "doc_id", nShards = 8)
      .select("doc_id", "phase", "shard", "pos")
      .orderBy("doc_id")
  }

  val c24Sql: String = {
    val h = duckHash("'shuffle:' || CAST(doc_id AS VARCHAR)")
    val (q6, bits6) = duckLshBucket(nBits = 6, dim = 64)
    // duckQualityCtes is a full WITH clause; splice its body into this
    // query's chain (names t/m are free here)
    val qualityBody = duckQualityCtes.stripPrefix("WITH ")
    s"""$pretrainCtesSql,
       |inv AS (SELECT doc_id, unnest(sh) AS s3 FROM sh
       |        WHERE doc_id IN (SELECT doc_id FROM quote_removed)),
       |nsz AS (SELECT doc_id, len(sh) AS nsh FROM sh
       |        WHERE doc_id IN (SELECT doc_id FROM quote_removed)),
       |cand AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
       |  FROM inv a JOIN inv b ON a.s3 = b.s3 AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |nd_drop AS (
       |  SELECT DISTINCT c.b_id AS doc_id
       |  FROM cand c JOIN nsz sa ON c.a_id = sa.doc_id
       |              JOIN nsz sb ON c.b_id = sb.doc_id
       |  WHERE c.inter / (sa.nsh + sb.nsh - c.inter) >= 0.5),
       |surv1 AS (SELECT doc_id FROM quote_removed
       |          WHERE doc_id NOT IN (SELECT doc_id FROM nd_drop)),
       |eb AS (
       |  SELECT vec_id,
       |  $bits6 AS bucket, embedding
       |  FROM (SELECT vec_id, embedding, $q6 AS q FROM embeddings)),
       |sem_flag AS (
       |  SELECT DISTINCT tr.vec_id
       |  FROM (SELECT * FROM eb WHERE vec_id % 7 <> 0) tr
       |  JOIN (SELECT * FROM eb WHERE vec_id % 7 = 0) ev2
       |    ON tr.bucket = ev2.bucket
       |  WHERE list_cosine_similarity(CAST(tr.embedding AS DOUBLE[]),
       |          CAST(ev2.embedding AS DOUBLE[])) >= 0.3),
       |surv2 AS (SELECT doc_id FROM surv1
       |          WHERE doc_id NOT IN (SELECT vec_id FROM sem_flag)),
       |$qualityBody,
       |scored AS (
       |  SELECT m.doc_id, ($duckQualityScore) AS q
       |  FROM m JOIN surv2 ON m.doc_id = surv2.doc_id)
       |SELECT doc_id,
       |  CAST(NTILE(3) OVER (ORDER BY q DESC, doc_id) AS BIGINT) AS phase,
       |  $h % 8 AS shard,
       |  ROW_NUMBER() OVER (PARTITION BY $h % 8 ORDER BY $h, doc_id) AS pos
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  /** c25: the STREAMING curation twin (round 11) — ingest-time corpus
    * curation run END TO END under the streaming engine: prep → gate →
    * watermark-bounded exact dedup → eval decontamination → chunking,
    * hash-matched against a one-statement batch oracle. At 100 TB this
    * is how a corpus is actually built: documents arrive as a stream
    * and every curation decision is made as they land, not in a later
    * batch sweep.
    *
    * Stage mapping (ONE rendering with the batch chain where shared):
    *  - prep/gate: [[prepCol]]/[[gateCond]] — stateless projections,
    *    identical to c13's stages 1-2;
    *  - dedup: `dropDuplicatesWithinWatermark` on the prepped-text
    *    digest (q37's operator) over a synthetic ingest time; the
    *    horizon exceeds the corpus span, so streaming dedup ≡ global
    *    DISTINCT for any micro-batch split (q37's equivalence);
    *  - decontamination: the eval benchmark's shingle-hash set is
    *    STATIC (known upfront), probed map-side by the exact
    *    set-membership kernel ([[graft.functions.SetFunctions
    *    .arrayAnyInLongSet]]) — c03's broadcast semantics in the form
    *    the streaming engine composes freely (a stream-static anti
    *    join cannot express the doc-level ANY-shingle predicate
    *    without a stream-stream recombination);
    *  - chunking: [[Selection.chunkSliding]], map-only.
    *
    * The output is keyed by the CONTENT digest, not doc_id, so it is
    * independent of which duplicate row the engine happens to keep —
    * what makes a streaming dedup twin deterministic at all. Oracle:
    * DISTINCT prepped texts, gated, train-side, `list_has_any`-free of
    * eval shingles, chunked — every stage re-derived relationally. */
  def c25StreamCuration(s: SparkSession, d: String): DataFrame = {
    import graft.functions.SetFunctions
    import graft.streaming.EventsStream
    // static eval shingle-hash set (benchmarks known upfront): the
    // driver holds ~10^4 longs — metadata-sized, same posture as the
    // trained-model reference objects
    val evalHashes: Array[Long] = Tables.documents(s, d)
      .filter(col("doc_id") % 97 === 0)
      .select(prepCol(col("text")).as("t"))
      .select(explode(TextOps.shingles(col("t"), 3)).as("sh"))
      .select(xxhash64(col("sh")).as("h")).distinct()
      .collect().map(_.getLong(0))
    EventsStream.runToCompletion(s, session => {
      val docs = EventsStream.readDocuments(session, d)
      // synthetic ingest time from the id: span ≪ the 1-hour horizon,
      // so the dedup state never evicts mid-corpus (q37's argument)
      val prepped = docs
        .withColumn("ing_ts", timestamp_micros(col("doc_id")))
        .select(col("doc_id"), col("ing_ts"), prepCol(col("text")).as("t"))
      val train = prepped.filter(gateCond(col("t")))
        .filter(col("doc_id") % 97 =!= 0)
      val deduped = train
        .withColumn("digest", md5(col("t")))
        .withWatermark("ing_ts", "1 hour")
        .dropDuplicatesWithinWatermark("digest")
      val clean = deduped.filter(!SetFunctions.arrayAnyInLongSet(
        transform(TextOps.shingles(col("t"), 3), sh => xxhash64(sh)),
        evalHashes))
      Selection.chunkSliding(clean.select("digest", "t"), "digest", "t",
        chunkSize = 32, stride = 24)
    }, "c25_stream_curation_mem", outputMode = "append")
      .orderBy("digest", "chunk_start")
  }

  val c25Sql: String =
    s"""WITH prepped AS (
       |  SELECT doc_id, $prepSqlExpr AS t FROM documents),
       |gw AS (SELECT doc_id, t,
       |         list_filter(string_split(t, ' '), x -> x <> '') AS w
       |       FROM prepped),
       |train AS (
       |  SELECT t FROM gw
       |  WHERE len(w) BETWEEN 20 AND 1000
       |    AND len(list_distinct(w)) / len(w) >= 0.3
       |    AND doc_id % 97 <> 0),
       |dd AS (SELECT DISTINCT t FROM train),
       |ddsh AS (
       |  SELECT t, w, list_distinct(list_transform(range(1, len(w)-1),
       |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
       |  FROM (SELECT t, list_filter(string_split(t, ' '), x -> x <> '') AS w
       |        FROM dd)),
       |evsh AS (
       |  SELECT list(DISTINCT s) AS ev FROM (
       |    SELECT unnest(list_distinct(list_transform(range(1, len(w)-1),
       |             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
       |    FROM (SELECT list_filter(string_split(t, ' '), x -> x <> '') AS w
       |          FROM (SELECT $prepSqlExpr AS t FROM documents
       |                WHERE doc_id % 97 = 0)))),
       |clean AS (
       |  SELECT d.t, d.w FROM ddsh d CROSS JOIN evsh e
       |  WHERE NOT list_has_any(d.sh, e.ev)),
       |st AS (
       |  SELECT t, w,
       |    unnest(range(1, greatest(len(w) - 8, 1) + 1, 24)) AS chunk_start
       |  FROM clean)
       |SELECT md5(t) AS digest,
       |  CAST(chunk_start AS BIGINT) AS chunk_start,
       |  CAST(len(list_slice(w, chunk_start, chunk_start + 31)) AS BIGINT)
       |    AS n_tokens,
       |  array_to_string(list_slice(w, chunk_start, chunk_start + 31), ' ')
       |    AS chunk_text
       |FROM st ORDER BY digest, chunk_start""".stripMargin

  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("d01_exact_dedup", d01Exact _, Some(d01Sql)),
    ("d02_ngram_jaccard", d02NgramJaccard _, Some(d02Sql)),
    ("d03_minhash_lsh", d03MinhashLsh _, Some(d03Sql)),
    ("d07_lsh_vs_exact", d07LshVsExact _, Some(d07Sql)),
    ("d04_simhash", d04Simhash _, Some(d04Sql)),
    ("d08_simhash_portable", d08SimhashPortable _, Some(d08Sql)),
    ("d09_incremental_dedup", d09IncrementalDedup _, Some(d09Sql)),
    ("d10_span_dedup", d10SpanDedup _, Some(d10Sql)),
    ("d11_edit_distance", d11EditDistance _, Some(d11Sql)),
    ("d13_containment", d13Containment _, Some(d13Sql)),
    ("d15_containment_lsh", d15ContainmentLsh _, Some(d15Sql)),
    ("d15b_containment_recall_gate", d15bContainmentRecallGate _, Some(d15bSql)),
    ("d17_stream_containment", d17StreamContainment _, Some(d17Sql)),
    ("d18_stream_dedup", d18StreamDedup _, Some(d18Sql)),
    ("d19_stream_embedding_neardup", d19StreamEmbeddingNeardup _, Some(d19Sql)),
    ("d20_retire_reingest", d20RetireReingest _, Some(d20Sql)),
    ("d16_incremental_containment", d16IncrementalContainment _, Some(d16Sql)),
    ("d14_substring_dedup", d14SubstringDedup _, Some(d14Sql)),
    ("d05_embedding_neardup", d05EmbeddingNearDup _, Some(d05Sql)),
    ("d06_dup_clusters", d06DupClusters _, Some(d06Sql)),
    ("t01_lang_id", t01LangId _, Some(t01Sql)),
    ("t02_quality", t02Quality _, Some(t02Sql)),
    ("t03_fingerprint", t03Fingerprint _, Some(t03Sql)),
    ("t04_corpus_stats", t04CorpusStats _, Some(t04Sql)),
    ("t05_clean", t05Clean _, Some(t05Sql)),
    ("t06_repetition", t06Repetition _, Some(t06Sql)),
    ("t07_redact_pii", t07RedactPii _, Some(t07Sql)),
    ("t08_token_freq", t08TokenFreq _, Some(t08Sql)),
    ("t09_normalize", t09Normalize _, Some(t09Sql)),
    ("t10_classifier", t10Classifier _, Some(t10Sql)),
    ("t11_tfidf", t11Tfidf _, Some(t11Sql)),
    ("t12_top_ngram", t12TopNgram _, Some(t12Sql)),
    ("s01_ann_bruteforce", s01AnnBruteForce _, Some(s01Sql)),
    ("s02_ann_ivf", s02AnnIvf _, Some(s02Sql)),
    ("s03_ann_lsh", s03AnnLsh _, Some(s03Sql)),
    ("s04_ann_ivf_trained", s04AnnIvfTrained _, Some(s04Sql)),
    ("s05_kmeans", s05Kmeans _, Some(s05Sql)),
    ("s06_lsh_portable", s06LshPortable _, Some(s06Sql)),
    ("s07_pq_trained", s07PqTrained _, Some(s07Sql)),
    ("s08_pq_portable", s08PqPortable _, Some(s08Sql)),
    ("s09_kmeans_portable", s09KmeansPortable _, Some(s09Sql)),
    ("s10_pq_rerank", s10PqRerank _, Some(s10Sql)),
    ("s11_ann_recall", s11AnnRecall _, Some(s11Sql)),
    ("s12_ivfpq", s12IvfPq _, Some(s12Sql)),
    ("s13_stream_ivf", s13StreamIvfIngest _, Some(s13Sql)),
    ("s14_published_serve", s14PublishedServe _, Some(s14Sql)),
    ("s19_retire_serve", s19RetireServe _, Some(s19Sql)),
    ("s15_nprobe_serve", s15NprobeServe _, Some(s15Sql)),
    ("s16_incremental_publish", s16IncrementalPublish _, Some(s16Sql)),
    ("s17_pq_coded_serve", s17PqCodedServe _, Some(s17Sql)),
    ("s18_pq_trained_serve", s18PqTrainedServe _, Some(s18Sql)),
    ("s20_tuned_serve", s20TunedServe _, Some(s20Sql)),
    ("s21_capacity_serve", s21CapacityServe _, Some(s21Sql)),
    ("s22_migrated_serve", s22MigratedServe _, Some(s22Sql)),
    ("m01_media_meta", m01MediaMeta _, Some(m01Sql)),
    ("m02_media_features", m02MediaFeatures _, Some(m02Sql)),
    ("m03_frame_sample", m03FrameSample _, Some(m03Sql)),
    ("m04_png_decode", m04PngDecode _, Some(m04Sql)),
    ("m05_wav_decode", m05WavDecode _, Some(m05Sql)),
    ("m06_resize", m06ResizeStats _, Some(m06Sql)),
    ("m07_audio_energy", m07AudioEnergy _, Some(m07Sql)),
    ("m08_gif_frames", m08GifFrames _, Some(m08Sql)),
    ("m09_image_histogram", m09ImageHistogram _, Some(m09Sql)),
    ("m10_binaryfile_ingest", m10BinaryFileIngest _, Some(m10Sql)),
    ("m11_image_ahash", m11ImageAHash _, Some(m11Sql)),
    ("m12_image_neardup", m12ImageNearDup _, Some(m12Sql)),
    ("m13_stream_image_neardup", m13StreamImageNearDup _, Some(m13Sql)),
    ("c01_split_assign", c01SplitAssign _, Some(c01Sql)),
    ("c02_stratified_sample", c02StratifiedSample _, Some(c02Sql)),
    ("c03_decontaminate", c03Decontaminate _, Some(c03Sql)),
    ("c04_pack_sequences", c04PackSequences _, Some(c04Sql)),
    ("c05_mixture_resample", c05MixtureResample _, Some(c05Sql)),
    ("c06_vocab_topk", c06VocabTopK _, Some(c06Sql)),
    ("c07_cluster_quota", c07ClusterQuota _, Some(c07Sql)),
    ("c08_shuffle_shards", c08ShuffleShards _, Some(c08Sql)),
    ("c09_curation_pipeline", c09CurationPipeline _, Some(c09Sql)),
    ("c10_bloom_decontaminate", c10BloomDecontaminate _, Some(c10Sql)),
    ("c11_chunk_sliding", c11ChunkSliding _, Some(c11Sql)),
    ("c13_pretrain_pipeline", c13PretrainPipeline _, Some(c13Sql)),
    ("c14_funnel_report", c14FunnelReport _, Some(c14Sql)),
    ("c15_curriculum", c15Curriculum _, Some(c15Sql)),
    ("c16_sorted_export", c16SortedExport _, Some(c16Sql)),
    ("c17_bpe_pairs", c17BpePairs _, Some(c17Sql)),
    ("c18_bpe_train", c18BpeTrain _, Some(c18Sql)),
    ("c19_bpe_segment", c19BpeSegment _, Some(c19Sql)),
    ("c20_importance_resample", c20ImportanceResample _, Some(c20Sql)),
    ("c21_fuzzy_decontaminate", c21FuzzyDecontaminate _, Some(c21Sql)),
    ("c22_semantic_decontaminate", c22SemanticDecontaminate _, Some(c22Sql)),
    ("c23_lm_score", c23LmScore _, Some(c23Sql)),
    ("c24_corpus_build", c24CorpusBuild _, Some(c24Sql)),
    ("c25_stream_curation", c25StreamCuration _, Some(c25Sql)),
    ("d12_semantic_dedup", d12SemanticDedup _, Some(d12Sql)),
  )
}
