package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{KllFunctions, KllKernel, ThetaFunctions, ThetaKernel}

/** Sketch-backed data skipping over the date-partitioned events layout
  * ([[Tables.buildPartitionedEvents]]): per-partition summary stats —
  * exact `value` min/max, a KLL sketch of `value`, a theta sketch of
  * `user_id`, and the row count — materialized as ONE ROW PER
  * PARTITION next to the layout, so predicates on VALUE COLUMNS can
  * prune partitions before any data file is listed, composing with
  * the layout's own date-key pruning.
  *
  * Soundness rules (a skipped partition must be PROVABLY empty for
  * the predicate — estimates never skip):
  *  - `value >= t`: skip when the partition's exact `value_max < t`
  *    (and dually for `<=`). The KLL sketch is the ESTIMATION side —
  *    [[estimateMatchingRows]] prices the scan from rank estimates —
  *    and is never used to skip (a rank estimate of 0 is not a
  *    proof).
  *  - `user_id = k`: skip when [[ThetaKernel.mayContain]] disproves
  *    membership. A theta sketch retains EVERY hash below its θ, so a
  *    probe key hashing below θ and absent from the retained set is
  *    provably absent; a key hashing at/above θ is outside the
  *    sampled region and the partition is conservatively kept. Below
  *    nominal entries θ = 1 (exact mode) and the check is exact
  *    membership.
  *
  * Scale posture: the stats table is partition-count-sized (365 rows
  * per year of days — metadata, not data), built in one distributed
  * pass over the layout; the skip decision collects ONLY stats rows.
  * This is the engine-level analog of parquet footer min/max pruning,
  * lifted to whole partitions and enriched with sketch semantics
  * min/max cannot express (membership, rank). Probe artifact:
  * tools.PartitionProbe (files_read with value/user skipping vs the
  * full layout).
  */
object DataSkipping {

  /** One distributed pass over the layout → one stats row per `dt`
    * partition, coalesced to a single small file (the table is
    * metadata-sized by construction). */
  def buildEventStats(s: SparkSession, layoutDir: String,
      statsDir: String): Unit =
    Tables.eventsPartitioned(s, layoutDir)
      .groupBy("dt")
      .agg(count(lit(1)).as("n_rows"),
        min(col("value")).as("value_min"),
        max(col("value")).as("value_max"),
        KllFunctions.kllSketch(col("value")).as("value_kll"),
        ThetaFunctions.thetaSketch(col("user_id")).as("user_theta"))
      .coalesce(1)
      .write.mode("overwrite").parquet(statsDir)

  /** The stats rows — one per partition, collected for driver-side
    * skip decisions (bounded by partition count, never row data). */
  private def stats(s: SparkSession, statsDir: String): Array[Row] =
    s.read.parquet(statsDir).collect()

  private def prunedRead(s: SparkSession, layoutDir: String,
      keep: Seq[java.sql.Date]): DataFrame =
    Tables.eventsPartitioned(s, layoutDir)
      .filter(col("dt").isInCollection(keep))

  /** Events with `value >= threshold`, reading only partitions whose
    * exact max clears the bar. NaN discipline: Spark orders NaN above
    * every double, so a partition holding a NaN row has
    * `value_max = NaN` AND its NaN rows satisfy `value >= t` under
    * Spark's comparison — while Java's `NaN >= t` is false. The keep
    * predicate therefore treats a NaN max as "cannot prove empty"
    * (kept), preserving the provably-empty skip contract. */
  def eventsWithValueAtLeast(s: SparkSession, layoutDir: String,
      statsDir: String, threshold: Double): DataFrame = {
    val keep = stats(s, statsDir)
      .filter { r =>
        val m = r.getAs[Double]("value_max")
        m.isNaN || m >= threshold
      }
      .map(_.getAs[java.sql.Date]("dt")).toSeq
    prunedRead(s, layoutDir, keep).filter(col("value") >= threshold)
  }

  /** Events of one user, reading only partitions whose theta sketch
    * cannot disprove the user's presence. */
  def eventsForUser(s: SparkSession, layoutDir: String,
      statsDir: String, userId: Long): DataFrame = {
    val keep = stats(s, statsDir)
      .filter(r => ThetaKernel.mayContain(
        r.getAs[Array[Byte]]("user_theta"), userId))
      .map(_.getAs[java.sql.Date]("dt")).toSeq
    prunedRead(s, layoutDir, keep).filter(col("user_id") === userId)
  }

  /** Estimated rows matching `value >= threshold`, from the KLL rank
    * estimates — the pricing side of the stats (e.g. choosing between
    * a pruned scan and an index), never a skip proof. */
  def estimateMatchingRows(s: SparkSession, statsDir: String,
      threshold: Double): Long =
    stats(s, statsDir).map { r =>
      val rank = Option(KllKernel.rank(
        r.getAs[Array[Byte]]("value_kll"), threshold))
        .map(_.doubleValue).getOrElse(1.0)
      (r.getAs[Long]("n_rows") * (1.0 - rank)).round
    }.sum
}
