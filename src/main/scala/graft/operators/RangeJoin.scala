package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Bucketed range join — the scale path for time-predicate joins with
  * NO equi-key, where Spark's only native plan is a broadcast
  * nested-loop (O(points × intervals), a cliff past broadcast size).
  *
  * Shape: quantize time into `bucketSeconds` buckets. Each interval
  * explodes to the buckets it covers (≈ len/bucket + 1 rows); each
  * point maps to exactly ONE bucket. The join becomes a plain shuffle
  * equi-join on the bucket id with the precise range predicate as a
  * residual filter — work scales with genuine temporal overlap, never
  * with the cross product. Because a point owns a single bucket, a
  * (point, interval) pair can meet at most once: no dedup pass.
  *
  * Tuning at scale: pick `bucketSeconds` near the typical interval
  * length (shorter → more interval replicas; longer → more residual
  * comparisons per bucket). Hot buckets (skewed event bursts) are
  * ordinary join skew — AQE skew-join handles them, or salt the bucket
  * key. Equi-keys that DO exist (tenant, user) belong in
  * `extraEquiKeys`: they multiply bucket selectivity for free.
  */
object RangeJoin {

  /** Inner-join `points` rows to the `intervals` rows whose
    * `[startCol, endCol)` half-open window contains `pointTs`.
    * Column names of the two sides must be disjoint (pre-rename —
    * the result carries both sides' columns). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointTs: String, startCol: String, endCol: String,
      bucketSeconds: Long = 600L,
      extraEquiKeys: Seq[String] = Nil): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet) -- extraEquiKeys
    require(overlap.isEmpty,
      s"point/interval column names must be disjoint, both have: $overlap")
    require(!points.columns.contains("_rj_bucket") &&
        !intervals.columns.contains("_rj_bucket"),
      "_rj_bucket is reserved by RangeJoin; rename that column first " +
        "(it would be silently overwritten and dropped)")

    val bucketMicros = lit(bucketSeconds * 1000000L)
    // cast-to-timestamp first: a no-op on TimestampType, and the UTC
    // session pin makes it exact on TIMESTAMP_NTZ and DATE inputs —
    // unix_micros alone rejects NTZ (the round-7 testdata re-encoding)
    def bucketOf(ts: Column): Column =
      floor(unix_micros(ts.cast(TimestampType)) / bucketMicros).cast(LongType)

    val p = points.withColumn("_rj_bucket", bucketOf(col(pointTs)))
    // end is exclusive, but a point in end's bucket can still precede
    // end — cover through floor(end); the residual predicate trims
    val i = intervals.withColumn("_rj_bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))

    val keys = "_rj_bucket" +: extraEquiKeys
    p.join(i, keys,  "inner")
      .filter(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("_rj_bucket")
  }
}
