package graft.corpus

import graft.SparkSpec
import graft.functions.TextOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks for the selection invariants that every
  * downstream training job silently depends on: split exhaustiveness,
  * sample nesting, packing conservation, and mixture cardinality.
  */
class SelectionPropertySpec extends SparkSpec {

  /** forAll replacement over fixed seeds (raw ScalaCheck, no scalatest
    * bridge in the offline dep set): deterministic, replayable. */
  private def forSeeds[T](gen: Gen[T], n: Int = 10)(body: T => Unit): Unit =
    (1 to n).foreach { seed =>
      body(gen.pureApply(Gen.Parameters.default, Seed(seed.toLong)))
    }
  import spark.implicits._

  private val idsGen: Gen[List[Long]] =
    Gen.listOfN(40, Gen.chooseNum(0L, 1000000L)).map(_.distinct)

  test("property: splits partition every corpus exactly once, any salt and percentages") {
    val cfg = for {
      ids <- idsGen
      train <- Gen.chooseNum(0, 100)
      v <- Gen.chooseNum(0, 100)
      salt <- Gen.identifier.map(_.take(6))
    } yield (ids, train, math.min(v, 100 - train), salt)
    forSeeds(cfg) { case (ids, trainPct, valPct, salt) =>
      val df = ids.toDF("doc_id")
      val out = Selection.assignSplits(df, "doc_id", trainPct, valPct, salt)
        .select("doc_id", "split").collect()
      assert(out.length == ids.length)              // no row lost or duped
      assert(out.forall(r =>
        Set("train", "val", "test").contains(r.getString(1))))
      // degenerate percentages behave: 100/0 => everything train
      if (trainPct == 100)
        assert(out.forall(_.getString(1) == "train"))
    }
  }

  test("property: stratified samples nest across any increasing rate pair") {
    val cfg = for {
      ids <- idsGen
      lo <- Gen.chooseNum(0, 100)
      hi <- Gen.chooseNum(0, 100)
    } yield (ids, math.min(lo, hi), math.max(lo, hi))
    forSeeds(cfg) { case (ids, lo, hi) =>
      val df = ids.map(i => (i, s"s${i % 3}")).toDF("doc_id", "source")
      def sample(p: Int) =
        Selection.stratifiedSample(df, "doc_id", "source", Map.empty, p)
          .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(sample(lo).subsetOf(sample(hi)))
      assert(sample(0).isEmpty && sample(100).size == ids.length)
    }
  }

  test("property: packSequences conserves the token stream for any budget/shard size") {
    val cfg = for {
      ids <- idsGen
      budget <- Gen.chooseNum(8, 512)
      shard <- Gen.chooseNum(1L, 64L)
    } yield (ids, budget, shard)
    forSeeds(cfg) { case (ids, budget, shardSize) =>
      val df = ids.map(i => (i, s"tok word${i % 7} x" * (1 + (i % 5).toInt)))
        .toDF("doc_id", "text")
      val out = Selection.packSequences(df, "doc_id", "text", budget, shardSize)
        .orderBy("doc_id").collect()
      // starts are the exclusive prefix sums of token counts in id order
      var expect = 0L
      out.foreach { r =>
        assert(r.getLong(2) == expect, s"start mismatch at ${r.getLong(0)}")
        assert(r.getLong(3) == expect / budget)   // seq = start div budget
        expect += r.getLong(1)
      }
    }
  }

  test("property: chunkSliding covers every token; stride==chunkSize reconstructs the document") {
    val cfg = for {
      nTok <- Gen.chooseNum(0, 60)
      chunk <- Gen.chooseNum(1, 20)
      stride <- Gen.chooseNum(1, chunk) // > chunk is rejected (coverage gap)
    } yield (nTok, chunk, stride)
    forSeeds(cfg, n = 15) { case (nTok, chunk, stride) =>
      val text = (1 to nTok).map(i => s"w$i").mkString(" ")
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val rows = Selection.chunkSliding(df, "doc_id", "text", chunk, stride)
        .orderBy("chunk_start").collect()
      // chunk starts: the stride lattice, bounded so no window is fully
      // contained in its predecessor
      val starts = rows.map(_.getLong(1)).toSeq
      assert(starts ==
        (1L to math.max(nTok - (chunk - stride), 1).toLong by stride.toLong))
      // every token appears in at least one chunk (full coverage)
      val covered = rows.flatMap(_.getString(3).split(" ")).filter(_.nonEmpty)
      assert(covered.toSet == (1 to nTok).map(i => s"w$i").toSet)
      // no chunk's window is a subset of the previous chunk's window
      rows.sliding(2).foreach {
        case Array(prev, cur) =>
          assert(cur.getLong(1) + cur.getLong(2) >
            prev.getLong(1) + prev.getLong(2))
        case _ => ()
      }
      // non-overlapping chunks concatenate back to the original document
      if (stride == chunk)
        assert(covered.mkString(" ") == text)
      // n_tokens is the real token count of each chunk text
      rows.foreach { r =>
        assert(r.getLong(2) ==
          r.getString(3).split(" ").count(_.nonEmpty).toLong)
      }
    }
    // stride > chunkSize is rejected up front (it would silently skip
    // the tokens between windows — the property that caught it)
    intercept[IllegalArgumentException] {
      Selection.chunkSliding(Seq((1L, "a b c")).toDF("doc_id", "text"),
        "doc_id", "text", chunkSize = 2, stride = 3)
    }
  }

  test("property: mixtureResample output size is exactly sum of per-row reps") {
    val cfg = for {
      ids <- idsGen
      w <- Gen.chooseNum(0, 3000).map(_ / 1000.0) // 0.000 .. 3.000
    } yield (ids, w)
    forSeeds(cfg) { case (ids, w) =>
      val df = ids.map(i => (i, "d")).toDF("doc_id", "dom")
      val out = Selection.mixtureResample(df, "doc_id", "dom",
        Map.empty, defaultWeight = w)
      val n = out.count()
      val base = math.floor(w).toLong * ids.length
      // fractional copies are hash-gated: bounded by the corpus size
      assert(n >= base && n <= base + ids.length)
      // every id appears floor(w) or floor(w)+1 times
      val counts = out.groupBy("doc_id").count()
        .collect().map(_.getLong(1)).toSet
      assert(counts.subsetOf(Set(math.floor(w).toLong, math.floor(w).toLong + 1)))
    }
  }

  test("property: repetitionRatio stays in [0,1]; redactPii is idempotent (placeholders never re-match)") {
    val textGen = Gen.listOfN(30,
      Gen.oneOf("a", "b", "spark", "the", "12", "x@y.io", "1.2.3.4"))
      .map(_.mkString(" "))
    forSeeds(textGen) { text =>
      val r = Seq(text).toDF("text")
        .select(TextOps.repetitionRatio($"text"),
          TextOps.redactPii($"text"),
          TextOps.redactPii(TextOps.redactPii($"text"))).collect().head
      val ratio = r.getDouble(0)
      assert(ratio >= 0.0 && ratio <= 1.0)
      // a second pass changes nothing: placeholders contain no digits
      // or @, so no pattern can match redacted output again
      assert(r.getString(1) == r.getString(2) && r.getString(1).nonEmpty)
    }
  }
}
