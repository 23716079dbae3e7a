package graft.corpus

import graft.SparkSpec
import graft.core.Tables
import graft.functions.TextOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("assignSplits: deterministic, exhaustive, roughly 80/10/10, stable under corpus growth") {
    val docs = Tables.documents(spark, sf)
    val a = Selection.assignSplits(docs, "doc_id")
    val counts = a.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    assert(total == docs.count())
    // hash is uniform; 500 docs at 80/10/10 → loose bounds
    assert(counts("train") > total * 0.7 && counts("train") < total * 0.9)
    assert(counts("val") > 0 && counts("test") > 0)
    // same decision on a re-run (no rand())
    val b = Selection.assignSplits(docs, "doc_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // growth stability: assignment of a doc doesn't depend on the rest
    // of the corpus — the half-corpus assignment is a subset
    val half = Selection.assignSplits(docs.filter($"doc_id" < 250), "doc_id")
    assert(half.exceptAll(a).isEmpty)
  }

  test("stratifiedSample: rates nest — the 25% sample is a subset of the 50% sample") {
    val docs = Tables.documents(spark, sf)
    def ids(pct: Int) = Selection.stratifiedSample(docs, "doc_id", "source",
        Map.empty, defaultPct = pct)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s25 = ids(25)
    val s50 = ids(50)
    assert(s25.subsetOf(s50))
    assert(s25.nonEmpty && s50.size < docs.count())
    // per-stratum override actually differs from the default rate
    val strat = Selection.stratifiedSample(docs, "doc_id", "source",
      Map("src0" -> 100), defaultPct = 0)
    assert(strat.select("source").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("src0"))
  }

  test("contaminationReport flags exactly the planted overlap; decontaminate removes it") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "totally unrelated training text here"),
      (3L, "ends with alpha beta gamma")
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "eval doc contains alpha beta gamma inside"))
      .toDF("doc_id", "text")
    val rep = Selection.contaminationReport(train, eval, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 1 and 3 share the 3-gram "alpha beta gamma"; doc 2 shares none
    assert(rep.keySet == Set(1L, 3L))
    assert(rep(1L) >= 1 && rep(3L) >= 1)
    val clean = Selection.decontaminate(train, eval, "doc_id", "text", n = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(2L))
  }

  test("bloomDecontaminate is bit-identical to the exact anti-join and probes inside the scan") {
    val docs = Tables.documents(spark, sf)
    val train = docs.filter($"doc_id" % 97 =!= 0)
    val eval = docs.filter($"doc_id" % 97 === 0)
    val exact = Selection.decontaminate(train, eval, "doc_id", "text", 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bloomed = Selection.bloomDecontaminate(train, eval,
      "doc_id", "text", 3, expectedItems = 1L << 16, fpp = 0.01)
    assert(bloomed.select("doc_id").collect().map(_.getLong(0)).toSet
      == exact)
    // the Bloom probe is a native predicate in the plan, not a UDF —
    // and it sits on the candidate side before the exact join
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(!plan.toLowerCase.contains("batchevalpython"))
    // even at an absurd fpp the result must not change — false
    // positives only cost work, never correctness
    val sloppy = Selection.bloomDecontaminate(train, eval,
        "doc_id", "text", 3, expectedItems = 100L, fpp = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sloppy == exact)
  }

  test("BloomOps: no false negatives; a disjoint key set is mostly rejected") {
    import graft.functions.BloomOps
    val members = (0L until 2000L).map(i => s"key-$i").toDF("k")
    val bloom = BloomOps.buildBloom(members, $"k", expectedItems = 2000, fpp = 0.01)
    // every member passes (Bloom's contract)
    assert(members.filter(BloomOps.mightContain(bloom, $"k")).count() == 2000)
    // non-members pass only at ≈fpp
    val others = (0L until 2000L).map(i => s"other-$i").toDF("k")
    val fp = others.filter(BloomOps.mightContain(bloom, $"k")).count()
    assert(fp < 100, s"false-positive count $fp far above the 1% target")
  }

  test("contaminationReport plans the scale shape: eval shingles broadcast, no shuffle of the train explode") {
    val docs = Tables.documents(spark, sf)
    val plan = Selection.contaminationReport(
        docs.filter($"doc_id" % 97 =!= 0), docs.filter($"doc_id" % 97 === 0),
        "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan) // eval side broadcast
    assert(!plan.contains("SortMergeJoin"), plan)    // train side not shuffled for the join
  }

  test("packSequences: sharded prefix sum equals the single-window reference; shardSize-invariant") {
    val docs = Tables.documents(spark, sf)
    val packed = Selection.packSequences(docs, "doc_id", "text",
      budget = 128, shardSize = 100L)
    // reference: one global window (fine at test scale)
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ref = docs.select($"doc_id",
        TextOps.tokenCount($"text").as("n_tokens"))
      .withColumn("start_token", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("seq_id", floor($"start_token" / 128))
    assert(packed.exceptAll(ref).isEmpty && ref.exceptAll(packed).isEmpty)
    // a different shard size must not change the answer
    val packed7 = Selection.packSequences(docs, "doc_id", "text",
      budget = 128, shardSize = 7L)
    assert(packed7.exceptAll(packed).isEmpty && packed.exceptAll(packed7).isEmpty)
    // sequences respect the budget: every doc's start lands in seq start/128
    val bad = packed.filter($"seq_id" =!= floor($"start_token" / 128)).count()
    assert(bad == 0)
  }

  test("mixtureResample: integer weights duplicate exactly; zero drops; fractions gate deterministically") {
    val docs = Seq(
      (1L, "a", "x"), (2L, "a", "x"), (3L, "b", "x"), (4L, "c", "x")
    ).toDF("doc_id", "dom", "text")
    val out = Selection.mixtureResample(docs, "doc_id", "dom",
        Map("a" -> 2.0, "b" -> 0.0), defaultWeight = 1.0)
      .select("doc_id", "copy")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byDoc(1L) == Seq(1, 2) && byDoc(2L) == Seq(1, 2)) // w=2 → 2 copies
    assert(!byDoc.contains(3L))                              // w=0 → dropped
    assert(byDoc(4L) == Seq(1))                              // default 1×
    // fractional gate: over the corpus, w=0.5 keeps roughly half, deterministically
    val corpus = Tables.documents(spark, sf)
    val frac = Selection.mixtureResample(corpus, "doc_id", "source",
      Map.empty, defaultWeight = 0.5)
    val n = frac.count()
    assert(n > 150 && n < 350)                               // ~250 of 500
    val again = Selection.mixtureResample(corpus, "doc_id", "source",
      Map.empty, defaultWeight = 0.5)
    assert(frac.exceptAll(again).isEmpty)
  }

  test("clusterQuotaSample: caps every cluster, keeps small clusters whole, deterministic") {
    val emb = Tables.embeddings(spark, sf)
    val capped = Selection.clusterQuotaSample(emb, "vec_id", "label", cap = 10)
    val sizes = capped.groupBy("label").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.values.forall(_ <= 10))
    val orig = emb.groupBy("label").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // small clusters survive intact; big ones hit the cap exactly
    orig.foreach { case (l, n) => assert(sizes(l) == math.min(n, 10L)) }
    // the draw is stable across runs
    val again = Selection.clusterQuotaSample(emb, "vec_id", "label", cap = 10)
    assert(capped.exceptAll(again).isEmpty)
    // and nested in cap: the cap=5 subset is inside the cap=10 subset
    val five = Selection.clusterQuotaSample(emb, "vec_id", "label", cap = 5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ten = capped.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(five.subsetOf(ten))
  }

  test("shuffleShards: exhaustive, balanced, positions contiguous per shard, stable; writer lays out shard dirs sorted by pos") {
    val docs = Tables.documents(spark, sf)
    val out = Selection.shuffleShards(docs, "doc_id", nShards = 8)
    assert(out.count() == docs.count())
    val byShard = out.groupBy("shard").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byShard.keySet == (0L until 8L).toSet)
    // hash balance: 500 docs over 8 shards, loose 2x bounds
    assert(byShard.values.forall(n => n > 20 && n < 125), byShard)
    // positions are 1..count(shard) with no gaps
    val posOk = out.groupBy("shard")
      .agg(min("pos").as("lo"), max("pos").as("hi"), count(lit(1)).as("n"))
      .filter($"lo" =!= 1L || $"hi" =!= $"n").count()
    assert(posOk == 0)
    // the shuffle order is NOT id order (it actually randomizes)
    val firstShard = out.filter($"shard" === byShard.keys.head)
      .orderBy("pos").select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(firstShard != firstShard.sorted)
    // reproducible across runs
    val again = Selection.shuffleShards(docs, "doc_id", nShards = 8)
    assert(out.exceptAll(again).isEmpty)
    // writer: one directory per shard, rows stream back in pos order
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    Selection.writeShuffleShards(docs, "doc_id", 4, dir)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.toSeq == (0 until 4).map(n => s"shard=$n"))
    val shard0 = spark.read.parquet(s"$dir/shard=0").select("pos")
      .collect().map(_.getLong(0)).toSeq
    assert(shard0 == shard0.sorted && shard0.head == 1L)
    // sized-file mode splits a shard into multiple part files
    val dir2 = java.nio.file.Files.createTempDirectory("shards2").toString
    Selection.writeShuffleShards(docs, "doc_id", 4, dir2,
      maxRecordsPerFile = Some(50L))
    val parts = new java.io.File(s"$dir2/shard=0").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parts > 1) // ~125 rows per shard at cap 50
  }

  test("writeJsonlShards: shard layout, pos-ordered lines, loader-readable JSONL") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    Selection.writeJsonlShards(docs.select("doc_id", "text"), "doc_id", 4, dir)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.toSeq == (0 until 4).map(n => s"shard=$n"))
    // every line is a standalone JSON object a non-Spark loader can read
    val f = new java.io.File(s"$dir/shard=0").listFiles()
      .filter(_.getName.endsWith(".json")).minBy(_.getName)
    val lines = scala.io.Source.fromFile(f).getLines().toSeq
    assert(lines.nonEmpty && lines.forall(l =>
      l.startsWith("{") && l.endsWith("}") && l.contains("\"doc_id\":")))
    // the whole corpus survives the round-trip, shard+pos intact
    val back = spark.read.json(dir)
    assert(back.count() == docs.count())
    val pos0 = back.filter($"shard" === 0).orderBy("pos")
      .select("pos").collect().map(_.getLong(0)).toSeq
    assert(pos0 == (1L to pos0.length))
  }

  test("chunkSliding: full coverage, overlap, short tail, empty doc kept") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                   // shorter than a chunk
      (3L, "")                                         // no tokens at all
    ).toDF("doc_id", "text")
    val out = Selection.chunkSliding(docs, "doc_id", "text",
      chunkSize = 4, stride = 3)
    val rows = out.orderBy("doc_id", "chunk_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 1: start lattice bounded by n−chunk+stride = 9 → 1,4,7; the
    // lattice point 10 is NOT emitted (its window ⊆ window 7 — pure
    // duplicate text)
    assert(rows.filter(_._1 == 1L).toSeq == Seq(
      (1L, 1L, 4L, "t1 t2 t3 t4"),
      (1L, 4L, 4L, "t4 t5 t6 t7"),
      (1L, 7L, 4L, "t7 t8 t9 t10")))
    // every token of doc 1 appears in at least one chunk
    val covered = rows.filter(_._1 == 1L).flatMap(_._4.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"t$i").toSet)
    // doc 2: single short chunk; doc 3: one empty chunk, doc not lost
    assert(rows.filter(_._1 == 2L).toSeq == Seq((2L, 1L, 3L, "a b c")))
    assert(rows.filter(_._1 == 3L).toSeq == Seq((3L, 1L, 0L, "")))
    // map-only: no Exchange in the plan
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("distributedNtile: bit-identical to the single-window ntile, partitioned and global") {
    val li = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
    val order = Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    // partitioned form vs NTILE OVER (PARTITION BY flag ORDER BY ...)
    val dist = Selection.distributedNtile(li, 10, Seq("l_returnflag"), order,
        outCol = "decile")
      .select(col("l_orderkey"), col("l_linenumber"), col("decile"))
    val window = li.withColumn("decile",
        ntile(10).over(Window.partitionBy("l_returnflag").orderBy(order: _*))
          .cast("long"))
      .select(col("l_orderkey"), col("l_linenumber"), col("decile"))
    assert(dist.exceptAll(window).isEmpty && window.exceptAll(dist).isEmpty)
    // global form (empty partition spec), odd bucket count, explicit parts
    val g = Selection.distributedNtile(li, 7, Seq.empty,
        Seq(col("l_orderkey"), col("l_linenumber")), outCol = "b",
        numPartitions = 5)
      .select(col("l_orderkey"), col("l_linenumber"), col("b"))
    val gw = li.withColumn("b",
        ntile(7).over(Window.orderBy("l_orderkey", "l_linenumber")).cast("long"))
      .select(col("l_orderkey"), col("l_linenumber"), col("b"))
    assert(g.exceptAll(gw).isEmpty && gw.exceptAll(g).isEmpty)
  }

  test("distributedNtile: more buckets than rows, empty input, scale-safe plan") {
    val tiny = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "v")
    val out = Selection.distributedNtile(tiny, 10, Seq.empty,
      Seq(col("id")), outCol = "b")
    // n < buckets: row with rank r goes to bucket r, buckets n+1.. empty
    assert(out.orderBy("id").collect().map(_.getAs[Long]("b")).toSeq ==
      Seq(1L, 2L, 3L))
    val empty = Selection.distributedNtile(tiny.filter(col("id") < 0), 4,
      Seq("v"), Seq(col("id")), outCol = "b")
    assert(empty.collect().isEmpty && empty.columns.contains("b"))
    // the whole point: no window with an empty partition spec in the plan
    val winNodes = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    assert(winNodes.isEmpty, "distributedNtile must never plan a global window")
  }

  test("distributedNtile: NULL partition keys form a normal group; reserved outCol rejected") {
    val df = Seq((Option("a"), 1L), (Option.empty[String], 2L),
      (Option("a"), 3L), (Option.empty[String], 4L),
      (Option("b"), 5L), (Option.empty[String], 6L)).toDF("k", "id")
    val dist = Selection.distributedNtile(df, 2, Seq("k"), Seq(col("id")),
        outCol = "b")
      .select("id", "b")
    // the window form keeps the NULL group — so must the distributed form
    val win = df.withColumn("b",
        ntile(2).over(Window.partitionBy("k").orderBy("id")).cast("long"))
      .select("id", "b")
    assert(dist.count() == 6, "NULL-key rows must not be dropped")
    assert(dist.exceptAll(win).isEmpty && win.exceptAll(dist).isEmpty)
    intercept[IllegalArgumentException] {
      Selection.distributedNtile(df, 2, Seq("k"), Seq(col("id")),
        outCol = "_dn_rank")
    }
    // an existing outCol is replaced in place — exactly one column out
    val twice = Selection.distributedNtile(
      Selection.distributedNtile(df, 2, Seq("k"), Seq(col("id")),
        outCol = "b"),
      3, Seq("k"), Seq(col("id")), outCol = "b")
    assert(twice.columns.count(_ == "b") == 1)
    assert(twice.select(max("b")).head.getLong(0) == 3L)
  }

  test("curriculumPhases: matches the ntile definition and replaces an existing phase column") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), TextOps.qualityScore(col("text")).as("q"))
    val cur = Selection.curriculumPhases(docs, "doc_id", col("q"), 3)
      .select("doc_id", "phase")
    val ref = docs.withColumn("phase",
        ntile(3).over(Window.orderBy(col("q").desc, col("doc_id"))).cast("long"))
      .select("doc_id", "phase")
    assert(cur.exceptAll(ref).isEmpty && ref.exceptAll(cur).isEmpty)
    // an existing phase column is replaced, not duplicated
    val again = Selection.curriculumPhases(
      Selection.curriculumPhases(docs, "doc_id", col("q"), 3),
      "doc_id", col("q"), 5)
    assert(again.columns.count(_ == "phase") == 1)
    assert(again.select(max("phase")).head.getLong(0) == 5L)
  }

  test("writeSortedRuns: file-name order is the global order, files internally sorted, content preserved") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    val path = java.nio.file.Files.createTempDirectory("graft_runs")
      .resolve("runs").toString
    Selection.writeSortedRuns(li,
      Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")),
      path, runs = 6)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    assert(files.length > 1, "expected multiple run files")
    // per-file key sequences, read in physical row order
    val seqs = files.map { f =>
      spark.read.parquet(f).coalesce(1)
        .select(col("l_extendedprice"), col("l_orderkey").cast("long"),
          col("l_linenumber").cast("long"))
        .collect()
        .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    }
    import scala.math.Ordering.Implicits._
    seqs.foreach { s =>
      assert(s.zip(s.tail).forall { case (a, b) => a <= b },
        "each run must be internally sorted")
    }
    // ranges don't overlap across name order: concatenation is sorted
    val all = seqs.flatten
    assert(all.zip(all.tail).forall { case (a, b) => a <= b },
      "file-name order must be the global order")
    // nothing lost or invented
    val back = spark.read.parquet(path)
    assert(back.count() == li.count())
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
  }

  test("vocabTopK: counts match a manual count and the plan is a TakeOrdered top-k") {
    val docs = Seq((1L, "a b a"), (2L, "b a c")).toDF("doc_id", "text")
    val top = Selection.vocabTopK(docs, "text", 2)
    assert(top.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 3L), ("b", 2L)))
    val plan = Selection.vocabTopK(Tables.documents(spark, sf), "text", 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("classifier: planted weights and margins, log-odds sign-agrees, OOV scores 0") {
    val labeled = Seq(
      (1L, "good clean prose", true),
      (2L, "good solid prose", true),
      (3L, "spam junk garbage", false),
      (4L, "junk spam words", false)
    ).toDF("doc_id", "text", "y")
    // integer contrast weights: w = cp*Nn - cn*Np with Np = Nn = 2
    val w = Selection.classifierWeights(labeled, "doc_id", "text", "y",
        logOdds = false)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w("good") == 4 && w("prose") == 4 && w("clean") == 2)
    assert(w("spam") == -4 && w("junk") == -4 && w("garbage") == -2)
    // margins classify the training docs correctly; an OOV-only doc
    // and an exactly-balanced doc both land at 0 → predicted 0
    val test = Seq((1L, "good clean prose"), (3L, "spam junk garbage"),
      (5L, "good spam"), (6L, "zzz")).toDF("doc_id", "text")
    val weights = Selection.classifierWeights(labeled, "doc_id", "text", "y",
      logOdds = false)
    val sc = Selection.classifierScore(test, weights, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(sc(1L) == ((3L, 10L, 1)))
    assert(sc(3L) == ((3L, -10L, 0)))
    assert(sc(5L) == ((2L, 0L, 0)))
    assert(sc(6L) == ((0L, 0L, 0)))
    // production log-odds path: same sign on every class-skewed token
    val lo = Selection.classifierWeights(labeled, "doc_id", "text", "y",
        logOdds = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    w.foreach { case (tok, wi) =>
      assert(math.signum(lo(tok)) == math.signum(wi.toDouble),
        s"log-odds sign disagrees on '$tok': $wi vs ${lo(tok)}")
    }
  }

  test("lmScore: planted add-one bigram probabilities, integer and log paths agree") {
    // reference corpus: bigrams (a,b):2 (b,a):1 (a,c):1; hist a->3 b->1;
    // vocabulary {a,b,c} -> V = 3
    val ref = Seq((100L, "a b a b"), (101L, "a c")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b"),    // (2+1)*1e6 // (3+3) = 500000
      (2L, "z z"),    // unseen: (0+1)*1e6 // (0+3) = 333333
      (3L, "b a c"),  // (1+1)*1e6//(1+3)=500000; (1+1)*1e6//(3+3)=333333
      (4L, "solo"),   // < 2 tokens -> 0 bigrams
      (100L, "a b a b"), (101L, "a c")
    ).toDF("doc_id", "text")
    val out = Selection.lmScore(docs, ref, "doc_id", "text", logProb = false)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((1L, 500000L, 500000L)))
    assert(out(2L) == ((1L, 333333L, 333333L)))
    assert(out(3L) == ((2L, 833333L, 416666L)))
    assert(out(4L) == ((0L, 0L, 0L)))
    // production path: closed-form log-likelihoods on the same corpus
    val lp = Selection.lmScore(docs, ref, "doc_id", "text", logProb = true)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(lp(1L)._1 == 1L && math.abs(lp(1L)._3 - math.log(3.0 / 6)) < 1e-12)
    assert(math.abs(lp(2L)._3 - math.log(1.0 / 3)) < 1e-12)
    assert(math.abs(lp(3L)._2 -
      (math.log(2.0 / 4) + math.log(2.0 / 6))) < 1e-12)
    assert(lp(4L) == ((0L, 0.0, 0.0)))
    // fluent in-reference text outscores unseen text on both paths
    assert(out(1L)._3 > out(2L)._3 && lp(1L)._3 > lp(2L)._3)
  }

  test("tfidfTopK: planted ranks, deterministic ties, log path agrees on the ranking") {
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "b b b c"))
      .toDF("doc_id", "text")
    val out = Selection.tfidfTopK(docs, "doc_id", "text", k = 2,
        logIdf = false)
      .collect().map(r => (r.getLong(0), r.getInt(5)) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // df(a)=df(b)=df(c)=2, N=3; score = tf*1e6 div df
    assert(out((1L, 1)) == (("a", 2L, 2L, 1000000L)))
    assert(out((1L, 2)) == (("b", 1L, 2L, 500000L)))
    assert(out((3L, 1)) == (("b", 3L, 2L, 1500000L)))
    // doc 2: both tokens tie at 500000 → lexicographic token order
    assert(out((2L, 1))._1 == "a" && out((2L, 2))._1 == "c")
    // classic tf·ln(N/df) path ranks identically on this corpus
    val logRanks = Selection.tfidfTopK(docs, "doc_id", "text", k = 2,
        logIdf = true)
      .select("doc_id", "token", "rank")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getInt(2))
      .toMap
    out.foreach { case ((id, rank), (tok, _, _, _)) =>
      assert(logRanks((id, tok)) == rank,
        s"log-idf rank differs for doc $id token $tok")
    }
  }

  test("fuzzyContaminationReport: catches the 1-edit leak exact matching misses; maxDist=0 degenerates to exact") {
    val train = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "unrelated words entirely here")
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "alpha beta gamda x")).toDF("doc_id", "text")
    // "alpha beta gamma" vs eval's typo'd "alpha beta gamda": distance 1
    val fuzzy = Selection.fuzzyContaminationReport(train, eval,
        "doc_id", "text", n = 3, maxDist = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fuzzy == Map(1L -> 1L))
    // exact matching misses it entirely
    assert(Selection.contaminationReport(train, eval, "doc_id", "text",
      n = 3).isEmpty)
    // decontaminate drops the leaked doc, keeps the clean one
    val kept = Selection.fuzzyDecontaminate(train, eval, "doc_id", "text",
      n = 3, maxDist = 1).select("doc_id").collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(2L))
    // maxDist = 0 is the exact report, on the real corpus slices
    val docs = Tables.documents(spark, sf)
    val tr = docs.filter($"doc_id" % 97 =!= 0)
    val ev = docs.filter($"doc_id" % 97 === 0)
    val d0 = Selection.fuzzyContaminationReport(tr, ev, "doc_id", "text",
        n = 3, maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Selection.contaminationReport(tr, ev, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(d0 == exact)
    // scale shape: eval bands broadcast, the train explode never shuffles
    val plan = Selection.fuzzyContaminationReport(tr, ev, "doc_id", "text",
        n = 3, maxDist = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("semanticContaminationReport: intra-block cosine flags the planted leak; cross-block is consciously out of scope") {
    val train = Seq(
      (1L, Array(1f, 0f, 0f), 10), // identical to the eval vector, same block → flagged
      (2L, Array(0f, 1f, 0f), 10), // orthogonal, same block → kept
      (3L, Array(1f, 0f, 0f), 20)  // identical direction, DIFFERENT block → kept (blocking is the declared semantics)
    ).toDF("id", "vec", "blk")
    val eval = Seq((100L, Array(1f, 0f, 0f), 10)).toDF("id", "vec", "blk")
    val rep = Selection.semanticContaminationReport(train, eval,
        "id", "vec", "blk", threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep == Map(1L -> 1L))
    val kept = Selection.semanticDecontaminate(train, eval,
        "id", "vec", "blk", threshold = 0.9)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
    // scale shape: eval side broadcast, train never shuffles
    val plan = Selection.semanticContaminationReport(train, eval,
        "id", "vec", "blk", threshold = 0.9)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("contamination eval broadcasts auto-fall back to a shuffle join past the size bound, same answer") {
    val docs = Tables.documents(spark, sf)
    val tr = docs.filter($"doc_id" % 97 =!= 0)
    val ev = docs.filter($"doc_id" % 97 === 0)
    // disable Spark's own stats-driven auto-broadcast so the guard's
    // decision is the only broadcast source: with the hint the join
    // broadcasts regardless of this conf, without it it must shuffle
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      // healthy side: estimate fits the default bound → broadcast hint
      val healthy = Selection.fuzzyContaminationReport(tr, ev,
        "doc_id", "text", n = 3, maxDist = 1)
      assert(healthy.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      // forced-tiny bound: the guard must refuse the hint → shuffle
      // join on the pigeonhole key, train scan shuffles but never
      // collapses into one build
      val guarded = Selection.fuzzyContaminationReport(tr, ev,
        "doc_id", "text", n = 3, maxDist = 1, maxBroadcastBytes = 0L)
      val gplan = guarded.queryExecution.executedPlan.toString
      assert(!gplan.contains("BroadcastHashJoin"), gplan)
      assert(gplan.contains("SortMergeJoin") ||
        gplan.contains("ShuffledHashJoin"), gplan)
      // both sides of the threshold: identical answers
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows(guarded) == rows(healthy) && rows(healthy).nonEmpty)
      // exact-match path: same guard, same invariance
      val exHealthy = Selection.contaminationReport(tr, ev,
        "doc_id", "text", n = 3)
      assert(exHealthy.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      val exGuarded = Selection.contaminationReport(tr, ev,
        "doc_id", "text", n = 3, maxBroadcastBytes = 0L)
      assert(!exGuarded.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      assert(rows(exGuarded) == rows(exHealthy) && rows(exHealthy).nonEmpty)
      // semantic twin: same guard, same invariance
      val emb = Tables.embeddings(spark, sf)
        .select($"vec_id", $"embedding",
          graft.similarity.Ann.portableLshBucket($"embedding",
            nBits = 6, dim = 64).as("bucket"))
      val (trE, evE) = (emb.filter($"vec_id" % 7 =!= 0),
        emb.filter($"vec_id" % 7 === 0))
      val semHealthy = Selection.semanticContaminationReport(trE, evE,
        "vec_id", "embedding", "bucket", threshold = 0.3)
      assert(semHealthy.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      val semGuarded = Selection.semanticContaminationReport(trE, evE,
        "vec_id", "embedding", "bucket", threshold = 0.3,
        maxBroadcastBytes = 0L)
      val splan = semGuarded.queryExecution.executedPlan.toString
      assert(!splan.contains("BroadcastHashJoin"), splan)
      assert(rows(semGuarded) == rows(semHealthy) &&
        rows(semHealthy).nonEmpty)
    } finally spark.conf.set(key, saved)
  }

  test("editOneKeys pigeonhole is lossless: maxDist=1 equals the brute-force pair set on real corpus shingles") {
    import graft.dedup.Dedup
    val docs = Tables.documents(spark, sf)
    val tr = docs.filter($"doc_id" % 97 =!= 0 && $"doc_id" < 100)
    val ev = docs.filter($"doc_id" % 97 === 0)
    val fast = Selection.fuzzyContaminationReport(tr, ev, "doc_id", "text",
        n = 3, maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: every (train shingle, eval shingle) pair, no blocking
    val trSh = Dedup.withShingles(tr, "doc_id", "text", 3)
      .select($"doc_id", explode($"sh").as("s"))
    val evSh = Dedup.withShingles(ev, "doc_id", "text", 3)
      .select(explode($"sh").as("es")).distinct()
    val brute = trSh.crossJoin(evSh)
      .filter(levenshtein($"s", $"es") <= 1)
      .groupBy($"doc_id").agg(count(lit(1)).as("n_fuzzy"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == brute)
    assert(brute.nonEmpty, "fixture slice should contain at least one fuzzy hit")
  }
}
