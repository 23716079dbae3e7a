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
      properties: util.Map[String, String]): Table = {
    // DSv2 option names are conventionally case-insensitive
    val opts = new CaseInsensitiveStringMap(properties)
    new ODataTable(schema, opts.get("firstPage"),
      Option(opts.get("maxRetries")).map(_.toInt).getOrElse(5),
      Option(opts.get("retrySleepMs")).map(_.toLong).getOrElse(0L))
  }
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

  /** Driver-side cursor walk, one partition per page. Cursor chains
    * are inherently sequential, so the driver must touch every page
    * once to discover the next link — the fetched body is carried into
    * the partition rather than re-fetched by the executor (halves the
    * request count against a rate-limited live API; bodies are held
    * only until task dispatch). Sources whose cursors are computable
    * (e.g. $skiptoken arithmetic) can skip the bodies entirely. */
  override def planInputPartitions(): Array[InputPartition] = {
    val fetcher = new RetryingPageFetcher(new LocalPageFetcher, maxRetries,
      retrySleepMs)
    Iterator.iterate(Option(firstPage).map(p => (p, fetcher.fetch(p)))) {
      case Some((path, body)) =>
        PageCursor.nextLink(body, path).map(p => (p, fetcher.fetch(p)))
      case None => None
    }.takeWhile(_.isDefined).take(100000).flatten
      .map { case (p, body) => ODataInputPartition(p, body): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ODataReaderFactory(required, pushed)
}

case class ODataInputPartition(pagePath: String, body: String)
    extends InputPartition

class ODataReaderFactory(required: StructType, pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ODataPartitionReader(
      partition.asInstanceOf[ODataInputPartition], required, pushed)
}

/** Executor-side page reader: parse one already-fetched page, emit the
  * pruned rows with pushed filters applied at the source. */
class ODataPartitionReader(partition: ODataInputPartition,
    required: StructType, pushed: Array[Filter])
    extends PartitionReader[InternalRow] {

  private val rows: Iterator[InternalRow] = {
    val body = partition.body
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
          .filterNot(arr.isNullAt) // a null entity in value[] is not a row
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

/** Thrown by a PageFetcher for failures worth retrying (HTTP 429/503,
  * transient transport errors). Anything else propagates immediately —
  * the reference retries only on 429 (MD-PS:138-148); a 404/401 must
  * fail fast so the per-entity skip policy (O9) can engage. */
class RetryableFetchException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

/** Page transport. Live mode would be an HTTP client with auth (O8);
  * fixture mode reads local files. */
trait PageFetcher extends Serializable {
  /** @return raw page body; throw [[RetryableFetchException]] for
    * transient failures, any other exception for permanent ones. */
  def fetch(path: String): String
}

class LocalPageFetcher extends PageFetcher {
  override def fetch(path: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
}

/** O7 — bounded fixed-backoff retry (the reference's 429 loop:
  * ≤5 tries, fixed sleep; MD-PS:138-148). Retries ONLY retryable
  * failures; permanent errors surface on the first attempt. */
class RetryingPageFetcher(inner: PageFetcher, maxRetries: Int,
    sleepMs: Long) extends PageFetcher {
  override def fetch(path: String): String = {
    var attempt = 0
    while (true) {
      try return inner.fetch(path)
      catch {
        case e: RetryableFetchException =>
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
      else {
        // a bare filename has no parent — resolve against the cwd
        val dir = Option(java.nio.file.Paths.get(currentPath).getParent)
          .getOrElse(java.nio.file.Paths.get("."))
        dir.resolve(l).toString
      }
    }
  }
}
