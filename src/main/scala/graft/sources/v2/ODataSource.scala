package graft.sources.v2

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.unsafe.types.UTF8String
import java.util
import scala.collection.JavaConverters._

/** DataSource V2 connector for paginated OData page documents
  * (`{"value":[...], "@odata.nextLink": ...}`) — the Spark-native
  * re-expression of the reference's Get-GraphData + pagination loop
  * (MD-PS:53-85,164-194).
  *
  * - The driver walks only the nextLink cursor chain (tiny reads) and
  *   plans ONE InputPartition PER PAGE, so executors parse/fetch pages
  *   in parallel — the reference's serial accumulate-all-pages list
  *   (O5) becomes a distributed scan.
  * - `$select` (O2): SupportsPushDownRequiredColumns — only requested
  *   fields are parsed (and, live, would join the URL's $select).
  * - `$filter` (O3): SupportsPushDownFilters — top-level string
  *   equality becomes an OData `field eq 'value'` filter evaluated at
  *   the source, mirroring the only predicate form Graph supports in
  *   the reference (MD-PS:24).
  * - 429 retry (O7): page loads go through [[PageFetcher]] with
  *   bounded fixed-backoff retries.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft-odata").schema(entitySchema)
  *     .option("firstPage", path).load()
  * }}}
  */
class ODataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-odata"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-odata requires an explicit schema (the entity catalog is " +
        "the source of truth; inference is never used in the prod path)")

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ODataTable(schema, properties.get("firstPage"),
      Option(properties.get("maxRetries")).map(_.toInt).getOrElse(5),
      Option(properties.get("retrySleepMs")).map(_.toLong).getOrElse(0L))
}

class ODataTable(entitySchema: StructType, firstPage: String, maxRetries: Int,
    retrySleepMs: Long) extends Table with SupportsRead {
  require(firstPage != null, "option 'firstPage' is required")
  override def name(): String = s"odata:$firstPage"
  override def schema(): StructType = entitySchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ODataScanBuilder(entitySchema, firstPage, maxRetries, retrySleepMs)
}

class ODataScanBuilder(fullSchema: StructType, firstPage: String,
    maxRetries: Int, retrySleepMs: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept only what OData's $filter can express in the reference:
    * top-level string equality. Everything else stays in Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo(attr, _: String) =>
        fullSchema.fieldNames.contains(attr) &&
          fullSchema(attr).dataType == StringType
      case _ => false
    }
    pushed = accepted
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new ODataScan(required, firstPage, pushed, maxRetries, retrySleepMs)
}

class ODataScan(required: StructType, firstPage: String,
    pushed: Array[Filter], maxRetries: Int, retrySleepMs: Long)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String = {
    val sel = required.fieldNames.mkString(",")
    val fil = pushed.collect { case EqualTo(a, v) => s"$a eq '$v'" }
      .mkString(" and ")
    s"ODataScan($$select=$sel${if (fil.nonEmpty) s", $$filter=$fil" else ""})"
  }

  /** Driver-side cursor walk: read each page only for its nextLink,
    * emit one partition per page. */
  override def planInputPartitions(): Array[InputPartition] = {
    val fetcher = new RetryingPageFetcher(new LocalPageFetcher, maxRetries,
      retrySleepMs)
    Iterator.iterate(Option(firstPage)) {
      case Some(p) => PageCursor.nextLink(fetcher.fetch(p), p)
      case None => None
    }.takeWhile(_.isDefined).take(100000).flatten
      .map(p => ODataInputPartition(p, maxRetries, retrySleepMs): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ODataReaderFactory(required, pushed, maxRetries, retrySleepMs)
}

case class ODataInputPartition(pagePath: String, maxRetries: Int,
    retrySleepMs: Long) extends InputPartition

class ODataReaderFactory(required: StructType, pushed: Array[Filter],
    maxRetries: Int, retrySleepMs: Long) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ODataPartitionReader(
      partition.asInstanceOf[ODataInputPartition], required, pushed)
}

/** Executor-side page reader: fetch + parse one page, emit the pruned
  * rows with pushed filters applied at the source. */
class ODataPartitionReader(partition: ODataInputPartition,
    required: StructType, pushed: Array[Filter])
    extends PartitionReader[InternalRow] {

  private val rows: Iterator[InternalRow] = {
    val fetcher = new RetryingPageFetcher(new LocalPageFetcher,
      partition.maxRetries, partition.retrySleepMs)
    val body = fetcher.fetch(partition.pagePath)
    val pageSchema = StructType(Seq(StructField("value", ArrayType(required))))
    val parser = new JacksonParser(pageSchema,
      new JSONOptions(Map("multiLine" -> "true"), "UTC"), false, Seq.empty)
    val parsed = parser.parse[String](body, CreateJacksonParser.string,
      UTF8String.fromString)
    val filterEval = sourceFilter _
    parsed.iterator.flatMap { page =>
      if (page.isNullAt(0)) Iterator.empty
      else {
        val arr = page.getArray(0)
        (0 until arr.numElements()).iterator
          .map(i => arr.getStruct(i, required.length).copy())
          .filter(filterEval)
      }
    }
  }

  /** Source-side evaluation of the pushed OData $filter (the "server"
    * in fixture mode). */
  private def sourceFilter(row: InternalRow): Boolean =
    pushed.forall {
      case EqualTo(attr, v: String) =>
        val ord = required.fieldIndex(attr)
        !row.isNullAt(ord) && row.getUTF8String(ord).toString == v
      case _ => true
    }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Page transport. Live mode would be an HTTP client with auth (O8);
  * fixture mode reads local files. */
trait PageFetcher extends Serializable {
  /** @return raw page body; throw to signal a retryable failure. */
  def fetch(path: String): String
}

class LocalPageFetcher extends PageFetcher {
  override def fetch(path: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
}

/** O7 — bounded fixed-backoff retry (the reference's 429 loop:
  * ≤5 tries, fixed sleep; MD-PS:138-148). */
class RetryingPageFetcher(inner: PageFetcher, maxRetries: Int,
    sleepMs: Long) extends PageFetcher {
  override def fetch(path: String): String = {
    var attempt = 0
    while (true) {
      try return inner.fetch(path)
      catch {
        case e: Exception =>
          attempt += 1
          if (attempt > maxRetries) throw e
          if (sleepMs > 0) Thread.sleep(sleepMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

object PageCursor {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Extract @odata.nextLink from a page body; relative links resolve
    * against the current page's directory. */
  def nextLink(body: String, currentPath: String): Option[String] = {
    val node = mapper.readTree(body).get("@odata.nextLink")
    Option(node).filter(!_.isNull).map(_.asText()).map { l =>
      val p = java.nio.file.Paths.get(l)
      if (p.isAbsolute) l
      else java.nio.file.Paths.get(currentPath).getParent.resolve(l).toString
    }
  }
}
