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

  /** One walked page: its path, and — for URL pages only — the body
    * fetched during the walk (a remote page can't be re-read by
    * `spark.read.json(path)`; a local file can, and re-reading keeps
    * its row data off the driver). */
  private case class Page(path: String, body: Option[String])

  /** Walk the nextLink chain: pages in order, plus the final page's
    * body (for cursors that live only on the last page, e.g.
    * deltaLink). Throws if the chain exceeds `maxPages` rather than
    * truncating — a silently shortened walk is indistinguishable from
    * a complete one downstream, which merely shortens a full refresh
    * but CORRUPTS an incremental sync. Each page is fetched once,
    * through the caller's transport (wrap in RetryingPageFetcher for
    * live 429 handling).
    *
    * URL bodies are RETAINED (they cannot be re-read by a distributed
    * scan) and later ride the plan as local relations, so the driver
    * pays O(retained bytes); `urlBodyBudget` fails the walk before
    * that becomes an OOM — a full live scan past the budget belongs on
    * the DSv2 connector, whose executors fetch their own pages. */
  private def walkChain(firstPagePath: String, maxPages: Int,
      fetcher: graft.sources.v2.PageFetcher,
      urlBodyBudget: Long)
      : (Seq[Page], String) = {
    import graft.sources.v2.PageCursor
    var retained = 0L
    def page(path: String, body: String): Page =
      if (!PageCursor.isUrl(path)) Page(path, None)
      else {
        retained += PageCursor.utf8Length(body)
        if (retained > urlBodyBudget)
          throw new IllegalStateException(
            s"URL page bodies exceed urlBodyBudgetBytes=$urlBodyBudget " +
              s"at $path; this driver-loop reader holds remote bodies " +
              "on the driver — read large live chains through the " +
              "graft-odata DSv2 connector instead (executors fetch " +
              "their own pages)")
        Page(path, Some(body))
      }
    var body = fetcher.fetch(firstPagePath)
    val pages = scala.collection.mutable.ArrayBuffer(
      page(firstPagePath, body))
    var next = PageCursor.nextLink(body, firstPagePath)
    while (next.isDefined) {
      if (pages.size >= maxPages)
        throw new IllegalStateException(
          s"page chain exceeds maxPages=$maxPages at ${pages.last.path}; " +
            "raise maxPages — a truncated read would be silently incomplete")
      body = fetcher.fetch(next.get)
      pages += page(next.get, body)
      next = PageCursor.nextLink(body, next.get)
    }
    (pages.toSeq, body)
  }

  /** Parse one page's `value[]` rows. File pages re-read distributed
    * (row data never sits on the driver); URL pages parse the body the
    * chain walk already fetched — acceptable for delta rounds, whose
    * volume is O(changes); the DSv2 connector is the scale path for
    * full live scans (executors fetch pages in parallel there). */
  private def pageDf(spark: SparkSession, pageSchema: StructType,
      p: Page): DataFrame = {
    import spark.implicits._
    val raw = p.body match {
      case Some(b) =>
        spark.read.schema(pageSchema).json(spark.createDataset(Seq(b)))
      case None =>
        spark.read.schema(pageSchema).option("multiLine", "true").json(p.path)
    }
    raw.select(explode(col("value")).as("v")).select(col("v.*"))
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
    * (or the cwd for a bare filename). Pass a retry-wrapped
    * [[graft.sources.v2.HttpPageFetcher]] to read a live chain. */
  def readPages(spark: SparkSession, firstPagePath: String,
      valueSchema: StructType, maxPages: Int = 10000,
      fetcher: graft.sources.v2.PageFetcher =
        new graft.sources.v2.LocalPageFetcher,
      urlBodyBudgetBytes: Long = 256L << 20): DataFrame = {
    val pageSchema = StructType(Seq(
      StructField("value", ArrayType(valueSchema)),
      StructField(nextLinkField, StringType)))
    val (pages, _) =
      walkChain(firstPagePath, maxPages, fetcher, urlBodyBudgetBytes)
    union(pages.map(pageDf(spark, pageSchema, _)))
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
      valueSchema: StructType, maxPages: Int = 10000,
      fetcher: graft.sources.v2.PageFetcher =
        new graft.sources.v2.LocalPageFetcher,
      urlBodyBudgetBytes: Long = 256L << 20)
      : (DataFrame, Option[String]) = {
    val deltaValueSchema = valueSchema.add(
      StructField(removedField, removedMarkerSchema))
    val pageSchema = StructType(Seq(
      StructField("value", ArrayType(deltaValueSchema)),
      StructField(nextLinkField, StringType)))
    val (pages, lastBody) =
      walkChain(firstPagePath, maxPages, fetcher, urlBodyBudgetBytes)
    val link =
      graft.sources.v2.PageCursor.deltaLink(lastBody, pages.last.path)
    val changes = union(pages.map(pageDf(spark, pageSchema, _)))
      .withColumn("removed", col(removedField).isNotNull)
      .drop(removedField)
    (changes, link)
  }
}
