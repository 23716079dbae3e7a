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

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Join-chain + aggregation — exercises scan, broadcast join, hash agg. */
  def entry(spark: SparkSession): DataFrame =
    CapabilityQueries.q03JoinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, f, _) => n -> f }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
