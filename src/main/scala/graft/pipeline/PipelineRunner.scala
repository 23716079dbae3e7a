package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.core.SchemaConform
import graft.sources.ODataPageReader
import scala.collection.mutable

/** O19/O9/O20 — config-driven multi-entity dispatch.
  *
  * Mirrors the reference's ordered endpoint registry + per-entity
  * switch (MD-PS:15-28, W365-PS:15-40): one EndpointConfig per entity,
  * walked in order, with per-entity error isolation (a failing entity
  * is logged and skipped, never partially loaded — MD-PS:151-199's
  * all-or-nothing policy) and per-stage timing/row-count metrics
  * (MD-PS:200,239,328).
  */
final case class EndpointConfig(
    name: String,
    firstPage: String,                 // fixture path (live: endpoint URL)
    sourceSchema: StructType,          // $select projection (O2)
    filter: Option[String] = None,     // engine-side $filter (O3)
    transform: DataFrame => DataFrame = identity,
    sinkSchema: StructType)

/** Per-entity timings with honest attribution for a lazy engine:
  * `planSec` covers the driver-side cursor walk + plan construction;
  * `execSec` covers the one materialization (extract, transform, and
  * conform all execute together — Spark cannot time them separately
  * without forcing extra passes). */
final case class StageMetrics(entity: String, rows: Long, planSec: Double,
    execSec: Double)

final class PipelineRunner(spark: SparkSession) {

  val metrics: mutable.Buffer[StageMetrics] = mutable.Buffer.empty
  private val cached = mutable.Buffer.empty[DataFrame]

  /** Release the cached entity outputs of every prior run() — call
    * after the sinks have consumed them; the frames remain usable
    * (recomputed on access) but no longer pin executor storage. */
  def release(): Unit = {
    cached.foreach(_.unpersist())
    cached.clear()
  }

  /** Run every endpoint; failed entities are skipped (error policy O9)
    * and reported in the second element. */
  def run(configs: Seq[EndpointConfig])
      : (Map[String, DataFrame], Seq[(String, Throwable)]) = {
    val ok = mutable.LinkedHashMap.empty[String, DataFrame]
    val failed = mutable.Buffer.empty[(String, Throwable)]
    configs.foreach { cfg =>
      try {
        val t0 = System.nanoTime()
        val raw = ODataPageReader.readPages(spark, cfg.firstPage, cfg.sourceSchema)
        val filtered = cfg.filter.fold(raw)(raw.filter)
        val out = SchemaConform.conform(cfg.transform(filtered), cfg.sinkSchema)
          .cache() // materialize once: metrics count + caller reads share it
        cached += out // released via release()
        val planSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val n = out.count()
        metrics += StageMetrics(cfg.name, n, planSec,
          (System.nanoTime() - t1) / 1e9)
        ok += cfg.name -> out
      } catch {
        // NonFatal only: an OOM/thread-interrupt means the JVM is no
        // longer trustworthy — propagate instead of reporting the
        // entity as skipped and running on
        case scala.util.control.NonFatal(e) => failed += cfg.name -> e
      }
    }
    (ok.toMap, failed.toSeq)
  }
}
