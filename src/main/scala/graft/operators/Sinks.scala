package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Sinks (SURVEY.md O15–O18).
  *
  * The reference's load is a TVP + stored procedure doing
  * `DELETE FROM t; INSERT ... GETDATE()` in one transaction
  * (MD-SQL:98-181) — full-refresh snapshot semantics with a
  * batch-constant load timestamp. Spark-first: `SaveMode.Overwrite`
  * parquet with `lit(loadTime)` stamped on the driver (one value per
  * batch, matching "same GETDATE() for all rows of the statement";
  * a per-row `current_timestamp()` would drift across tasks).
  */
object Sinks {

  /** O15/O16 — full-refresh snapshot: overwrite + batch-constant
    * timeGenerated. */
  def snapshot(df: DataFrame, path: String, loadTime: Timestamp): Unit =
    df.withColumn("timeGenerated", lit(loadTime))
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** O17 — retention mode (the reference's commented alternative,
    * MD-SQL:107-111): append this batch, then age out rows older than
    * `maxAgeDays` relative to `loadTime`. The rewrite reads back the
    * whole table; at scale this becomes a partitioned table
    * (partition by date(timeGenerated)) where aging out is a partition
    * drop, not a rewrite. */
  def retentionAppend(spark: SparkSession, df: DataFrame, path: String,
      loadTime: Timestamp, maxAgeDays: Int = 40): Unit = {
    df.withColumn("timeGenerated", lit(loadTime))
      .write.mode(SaveMode.Append).parquet(path)
    val aged = spark.read.parquet(path)
      .filter(datediff(lit(loadTime).cast("date"),
        col("timeGenerated").cast("date")) <= maxAgeDays)
    val tmp = path + "_compact"
    aged.write.mode(SaveMode.Overwrite).parquet(tmp)
    // atomic-ish swap; a table format (Delta/Iceberg) would make this a
    // real transaction. The FS is resolved from the path's own URI (not
    // the default FS) and both steps are checked — an unreported failed
    // rename after a successful delete would silently lose the table.
    val dst = new org.apache.hadoop.fs.Path(path)
    val src = new org.apache.hadoop.fs.Path(tmp)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.delete(dst, true) && fs.exists(dst))
      throw new java.io.IOException(s"retention swap: failed to delete $dst")
    if (!fs.rename(src, dst))
      throw new java.io.IOException(
        s"retention swap: failed to rename $src -> $dst; retained data is at $src")
  }

  /** O15 variant — JDBC snapshot: truncate-overwrite into a relational
    * store, the closest analog of the reference's TVP+sproc load when
    * the target stays a SQL database. Same trait shape as the parquet
    * sink; untested here (no database in the build environment). */
  def jdbcSnapshot(df: DataFrame, url: String, table: String,
      props: java.util.Properties, loadTime: Timestamp): Unit =
    df.withColumn("timeGenerated", lit(loadTime))
      .write.mode(SaveMode.Overwrite)
      .option("truncate", "true")   // preserve DDL, delete+insert semantics
      .jdbc(url, table, props)

  /** O18 — surrogate key. `monotonically_increasing_id` is the
    * scale-correct choice (no shuffle, no driver bottleneck);
    * `contiguous=true` reproduces the reference's IDENTITY(1,1)
    * contiguity via a global row_number — a single-partition sort,
    * acceptable only for dimension-sized outputs. */
  def withSurrogateKey(df: DataFrame, keyCol: String = "ClusterID",
      orderBy: String = "id", contiguous: Boolean = false): DataFrame =
    if (contiguous)
      df.withColumn(keyCol,
        row_number().over(Window.orderBy(col(orderBy))).cast("long"))
    else df.withColumn(keyCol, monotonically_increasing_id())
}
