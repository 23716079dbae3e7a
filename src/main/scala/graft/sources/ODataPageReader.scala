package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, explode}
import org.apache.spark.sql.types._

/** O5/O6 — paginated OData scan over local JSON page fixtures.
  *
  * A page is one JSON object `{"value": [...], "@odata.nextLink": "..."}`
  * (MD-PS:164-194). The reference accumulates all pages into one
  * driver-side list; here only the *link chain* is walked on the driver
  * — a plain Jackson read per page for the cursor (PageCursor, shared
  * with the V2 connector; no Spark job, no value parsing) — and row
  * data stays distributed: the per-page DataFrames are combined with
  * a balanced `unionByName`. Against a live service this becomes the
  * DataSource V2 connector (graft.sources.v2) emitting one
  * InputPartition per page so executors process pages in parallel;
  * this reader keeps the same page semantics as a simple fixture path.
  */
object ODataPageReader {

  val nextLinkField = "@odata.nextLink"

  /** Walk the nextLink chain: page paths in order, plus the final
    * page's body (for cursors that live only on the last page, e.g.
    * deltaLink). Throws if the chain exceeds `maxPages` rather than
    * truncating — a silently shortened walk is indistinguishable from
    * a complete one downstream, which merely shortens a full refresh
    * but CORRUPTS an incremental sync. Each page is fetched once. */
  private def walkChain(firstPagePath: String, maxPages: Int)
      : (Seq[String], String) = {
    val fetcher = new graft.sources.v2.LocalPageFetcher
    val paths = scala.collection.mutable.ArrayBuffer(firstPagePath)
    var body = fetcher.fetch(firstPagePath)
    var next = graft.sources.v2.PageCursor.nextLink(body, firstPagePath)
    while (next.isDefined) {
      if (paths.size >= maxPages)
        throw new IllegalStateException(
          s"page chain exceeds maxPages=$maxPages at ${paths.last}; " +
            "raise maxPages — a truncated read would be silently incomplete")
      paths += next.get
      body = fetcher.fetch(next.get)
      next = graft.sources.v2.PageCursor.nextLink(body, next.get)
    }
    (paths.toSeq, body)
  }

  /** Balanced union: a left-nested reduce builds an O(pages)-deep plan
    * that strains the analyzer on long chains. */
  private def union(dfs: Seq[DataFrame]): DataFrame =
    if (dfs.size == 1) dfs.head
    else union(dfs.grouped(2).map {
      case Seq(a, b) => a.unionByName(b)
      case Seq(a) => a
    }.toSeq)

  /** Follow the nextLink chain starting at `firstPagePath`, returning
    * one DataFrame of all pages' `value[]` rows with `valueSchema`.
    * Relative nextLinks resolve against the current page's directory
    * (or the cwd for a bare filename). */
  def readPages(spark: SparkSession, firstPagePath: String,
      valueSchema: StructType, maxPages: Int = 10000): DataFrame = {
    val pageSchema = StructType(Seq(
      StructField("value", ArrayType(valueSchema)),
      StructField(nextLinkField, StringType)))
    val (pages, _) = walkChain(firstPagePath, maxPages)
    union(pages.map(p =>
      spark.read.schema(pageSchema).option("multiLine", "true").json(p)
        .select(explode(col("value")).as("v")).select(col("v.*"))))
  }

  val removedField = "@removed"

  /** Shape of the tombstone marker object — THE definition; the V2
    * connector and the streaming delta reader reference it so a
    * change to the wire shape lands in one place. */
  val removedMarkerSchema: StructType =
    StructType(Seq(StructField("reason", StringType)))

  /** Incremental (delta) sync read — the extension the reference's
    * full-refresh runbooks stop short of: OData delta queries return
    * only entities changed since the last sync, with deletions as
    * tombstones (`{"id": ..., "@removed": {"reason": ...}}`) and a
    * final-page `@odata.deltaLink` to persist as the next run's
    * cursor.
    *
    * Returns the change set — `valueSchema`'s columns plus a boolean
    * `removed` (tombstones carry only the id; their other columns are
    * NULL) — and the deltaLink. Page walking matches [[readPages]]:
    * the driver touches only the link chain, row data stays
    * distributed. Apply with `Sinks.applyDelta`. */
  def readDeltaPages(spark: SparkSession, firstPagePath: String,
      valueSchema: StructType, maxPages: Int = 10000)
      : (DataFrame, Option[String]) = {
    val deltaValueSchema = valueSchema.add(
      StructField(removedField, removedMarkerSchema))
    val pageSchema = StructType(Seq(
      StructField("value", ArrayType(deltaValueSchema)),
      StructField(nextLinkField, StringType)))
    val (pages, lastBody) = walkChain(firstPagePath, maxPages)
    val link = graft.sources.v2.PageCursor.deltaLink(lastBody)
    val changes = union(pages.map(p =>
      spark.read.schema(pageSchema).option("multiLine", "true").json(p)
        .select(explode(col("value")).as("v")).select(col("v.*"))))
      .withColumn("removed", col(removedField).isNotNull)
      .drop(removedField)
    (changes, link)
  }
}
