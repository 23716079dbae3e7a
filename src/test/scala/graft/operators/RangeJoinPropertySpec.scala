package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based check of the bucketed range join against a plain
  * Scala brute force on RANDOM points/intervals — fixture tests pin
  * the known boundary cases; this sweeps alignments the fixtures
  * don't think of (intervals shorter/longer than the bucket, zero-
  * length intervals, points exactly on bucket edges, widths of 1 s vs
  * a day). The invariant under test is the operator's whole contract:
  * exact pair set of `start <= p < end`, one output row per pair.
  */
class RangeJoinPropertySpec extends SparkSpec {

  /** forAll replacement over fixed seeds (raw ScalaCheck, no scalatest
    * bridge in the offline dep set): deterministic, replayable. */
  private def forSeeds[T](gen: Gen[T], n: Int = 8)(body: T => Unit): Unit =
    (1 to n).foreach { seed =>
      body(gen.pureApply(Gen.Parameters.default, Seed(seed.toLong)))
    }
  import spark.implicits._

  // one day of microseconds around a fixed epoch, second granularity
  private val t0 = 1704067200000000L // 2024-01-01 00:00:00 UTC
  private val secGen = Gen.chooseNum(0L, 86400L)

  private val caseGen = for {
    nPoints <- Gen.chooseNum(5, 60)
    nIvals <- Gen.chooseNum(3, 30)
    points <- Gen.listOfN(nPoints, secGen)
    starts <- Gen.listOfN(nIvals, secGen)
    lens <- Gen.listOfN(nIvals, Gen.chooseNum(0L, 7200L)) // incl. zero-length
    bucket <- Gen.oneOf(1L, 7L, 600L, 3600L, 86400L)
  } yield (points, starts.zip(lens), bucket)

  test("property: bucketed join == brute force on random points/intervals, any bucket width") {
    forSeeds(caseGen) { case (pointSecs, ivals, bucketSeconds) =>
      val points = pointSecs.zipWithIndex
        .map { case (s, i) => (i.toLong, new java.sql.Timestamp((t0 + s * 1000000L) / 1000L)) }
      val intervals = ivals.zipWithIndex.map { case ((s, len), i) =>
        (i.toLong,
          new java.sql.Timestamp((t0 + s * 1000000L) / 1000L),
          new java.sql.Timestamp((t0 + (s + len) * 1000000L) / 1000L))
      }
      val pDf = points.toDF("p_id", "p_ts")
      val iDf = intervals.toDF("iv_id", "w_start", "w_end")
      val got = RangeJoin.pointInInterval(pDf, iDf,
          "p_ts", "w_start", "w_end", bucketSeconds)
        .select("p_id", "iv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // brute force in plain Scala over the second offsets
      val expected = for {
        (p, pi) <- pointSecs.zipWithIndex
        ((s, len), ii) <- ivals.zipWithIndex
        if p >= s && p < s + len
      } yield (pi.toLong, ii.toLong)
      assert(got.length == got.distinct.length,
        s"duplicate pairs at bucket=$bucketSeconds")
      assert(got.toSet == expected.toSet,
        s"pair-set mismatch at bucket=$bucketSeconds")
    }
  }

  test("property: TIMESTAMP_NTZ inputs produce the identical pair set") {
    forSeeds(caseGen, n = 4) { case (pointSecs, ivals, bucketSeconds) =>
      val pDf = pointSecs.zipWithIndex
        .map { case (s, i) => (i.toLong, new java.sql.Timestamp((t0 + s * 1000000L) / 1000L)) }
        .toDF("p_id", "p_ts")
      val iDf = ivals.zipWithIndex.map { case ((s, len), i) =>
        (i.toLong,
          new java.sql.Timestamp((t0 + s * 1000000L) / 1000L),
          new java.sql.Timestamp((t0 + (s + len) * 1000000L) / 1000L))
      }.toDF("iv_id", "w_start", "w_end")
      val utc = RangeJoin.pointInInterval(pDf, iDf,
          "p_ts", "w_start", "w_end", bucketSeconds)
        .select("p_id", "iv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val ntz = RangeJoin.pointInInterval(
          pDf.withColumn("p_ts", $"p_ts".cast("timestamp_ntz")),
          iDf.withColumn("w_start", $"w_start".cast("timestamp_ntz"))
            .withColumn("w_end", $"w_end".cast("timestamp_ntz")),
          "p_ts", "w_start", "w_end", bucketSeconds)
        .select("p_id", "iv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(ntz == utc, s"NTZ/UTC divergence at bucket=$bucketSeconds")
    }
  }
}
