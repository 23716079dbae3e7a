package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property sweep of the sketch KERNELS on random streams — the query
  * specs pin the fixtures; this sweeps cardinalities, duplication
  * profiles, and saturation levels the fixtures don't reach. Pure
  * kernel tests (no Spark session): the aggregates delegate to exactly
  * these code paths (update/merge/serialize round-trips), so the
  * invariants proven here are the ones the distributed plans rely on.
  */
class SketchPropertySpec extends AnyFunSuite {

  /** Deterministic, replayable forAll over fixed seeds (raw ScalaCheck,
    * no scalatest bridge in the offline dep set). */
  private def forSeeds[T](gen: Gen[T], n: Int = 10)(body: T => Unit): Unit =
    (1 to n).foreach { seed =>
      body(gen.pureApply(Gen.Parameters.default, Seed(seed.toLong)))
    }

  private val streamGen: Gen[List[Long]] = for {
    nKeys <- Gen.chooseNum(1, 2000)
    n <- Gen.chooseNum(1, 5000)
    keys <- Gen.listOfN(n, Gen.chooseNum(0L, nKeys.toLong))
  } yield keys

  test("property: theta sketches are exact below 2^lgK, sharded or not") {
    forSeeds(streamGen) { keys =>
      val lgK = 12 // nominal 4096 >= every generated cardinality
      val whole = ThetaKernel.newUnion(lgK)
      keys.foreach(whole.update)
      // split into 3 shards, serialize each, union the bytes (the
      // shuffle path the aggregate's serialize/merge takes)
      val shards = keys.grouped(math.max(1, keys.size / 3)).map { g =>
        val u = ThetaKernel.newUnion(lgK)
        g.foreach(u.update)
        u.getResult.toByteArray
      }
      val merged = ThetaKernel.newUnion(lgK)
      shards.foreach(b => merged.union(
        org.apache.datasketches.memory.Memory.wrap(b)))
      val exact = keys.distinct.size
      assert(Math.round(whole.getResult.getEstimate) == exact)
      assert(Math.round(merged.getResult.getEstimate) == exact)
    }
  }

  test("property: theta intersection/difference exact on random set pairs") {
    val pairGen = for {
      a <- streamGen
      b <- streamGen
    } yield (a, b)
    forSeeds(pairGen) { case (a, b) =>
      def sk(xs: List[Long]): Array[Byte] = {
        val u = ThetaKernel.newUnion(12)
        xs.foreach(u.update)
        u.getResult.toByteArray
      }
      val (sa, sb) = (a.toSet, b.toSet)
      assert(ThetaKernel.intersectEstimate(sk(a), sk(b)) == (sa & sb).size)
      assert(ThetaKernel.aNotBEstimate(sk(a), sk(b)) == (sa -- sb).size)
    }
  }

  test("property: frequent-items bounds contain every true count at any saturation") {
    val gen = for {
      keys <- streamGen
      mapSize <- Gen.oneOf(8, 64, 512) // from heavily-purging to roomy
    } yield (keys, mapSize)
    forSeeds(gen) { case (keys, mapSize) =>
      val sk = FreqKernel.newSketch(mapSize)
      keys.foreach(sk.update)
      val bytes = sk.toByteArray
      val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      truth.foreach { case (k, n) =>
        val lb = FreqKernel.lowerBound(bytes, k)
        val ub = FreqKernel.upperBound(bytes, k)
        assert(lb <= n && n <= ub,
          s"bounds [$lb,$ub] miss $n for key $k at mapSize=$mapSize")
      }
      // and the serialize → merge path preserves the guarantee
      val half = keys.splitAt(keys.size / 2)
      val m = FreqKernel.newSketch(mapSize)
      Seq(half._1, half._2).foreach { g =>
        val s = FreqKernel.newSketch(mapSize)
        g.foreach(s.update)
        m.merge(FreqKernel.wrap(s.toByteArray))
      }
      val mb = m.toByteArray
      truth.foreach { case (k, n) =>
        assert(FreqKernel.lowerBound(mb, k) <= n &&
          n <= FreqKernel.upperBound(mb, k))
      }
    }
  }

  test("property: KLL quantile ranks stay inside the published envelope") {
    val gen = for {
      n <- Gen.chooseNum(100, 5000)
      vals <- Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6))
      rank <- Gen.oneOf(0.1, 0.25, 0.5, 0.9)
    } yield (vals, rank)
    forSeeds(gen) { case (vals, rank) =>
      val sk = KllKernel.newSketch(200)
      vals.foreach(sk.update)
      val v = sk.getQuantile(rank)
      // a duplicated value occupies a rank INTERVAL [#{x<v}, #{x<=v}]/n
      // (ScalaCheck's biased double gen piles mass on ±1e6, exactly the
      // case a count(<=v)-only check gets wrong); the guarantee is that
      // this interval comes within ±eps of the requested rank
      val lo = vals.count(_ < v).toDouble / vals.size
      val hi = vals.count(_ <= v).toDouble / vals.size
      // k=200 ⇒ ~1.65% normalized rank error; 5% = 3× slack
      assert(lo - 0.05 <= rank && rank <= hi + 0.05,
        s"rank interval [$lo,$hi] of $v misses $rank over n=${vals.size}")
    }
  }
}
