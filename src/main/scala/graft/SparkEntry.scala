package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CapabilityQueries, ParityQueries, TrainingQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2) to DataFrame builders;
  * `oracleSql` carries the DuckDB-equivalent SQL for the hash-match
  * correctness gate. Column names and row order are engineered to agree
  * between the two (see CapabilityQueries determinism rules).
  */
object SparkEntry {

  private def all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    CapabilityQueries.entries ++ ParityQueries.entries ++
      TrainingQueries.entries

  /** Flagship: SURVEY §7's minimum end-to-end slice — the
    * ManagedDevices pipeline (paginated extract, Windows filter,
    * struct/array transforms, schema conform, batch timestamp) feeding
    * an analytic query: devices not synced in 7+ days per manufacturer.
    * Driver smoke-checks rows>0 (fixtures contain 2 stale devices). */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    ParityQueries.managedDevicesPipeline(spark, ParityQueries.ts2)
      .filter(datediff(col("timeGenerated"), col("lastSyncDateTime")) > 7)
      .groupBy("manufacturer")
      .agg(count(lit(1)).as("stale_devices"))
      .orderBy("manufacturer")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, f, _) => n -> f }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
