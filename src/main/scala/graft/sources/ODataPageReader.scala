package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, explode}
import org.apache.spark.sql.types._
import java.nio.file.Paths

/** O5/O6 — paginated OData scan over local JSON page fixtures.
  *
  * A page is one JSON object `{"value": [...], "@odata.nextLink": "..."}`
  * (MD-PS:164-194). The reference accumulates all pages into one
  * driver-side list; here only the *link chain* is walked on the driver
  * (one tiny read per page to fetch the cursor) — row data stays
  * distributed, and the per-page DataFrames are combined with
  * `unionByName`, Spark's union-all. Against a live service this
  * becomes a DataSource V2 connector emitting one InputPartition per
  * page so executors fetch pages in parallel; the fixture reader keeps
  * the same page semantics for tests.
  */
object ODataPageReader {

  val nextLinkField = "@odata.nextLink"

  /** Follow the nextLink chain starting at `firstPagePath`, returning
    * one DataFrame of all pages' `value[]` rows with `valueSchema`.
    * Relative nextLinks resolve against the first page's directory. */
  def readPages(spark: SparkSession, firstPagePath: String,
      valueSchema: StructType, maxPages: Int = 10000): DataFrame = {
    val dir = Paths.get(firstPagePath).getParent
    val pageSchema = StructType(Seq(
      StructField("value", ArrayType(valueSchema)),
      StructField(nextLinkField, StringType)))

    def pageDf(path: String): DataFrame =
      spark.read.schema(pageSchema).option("multiLine", "true").json(path)

    def nextLink(path: String): Option[String] = {
      // cursor fetch only — single row, no value data collected
      // backticks: the field name itself contains a dot
      val links = pageDf(path).select(col(s"`$nextLinkField`")).limit(1).collect()
      Option(links.headOption.map(_.getString(0)).orNull)
        .map(l => if (Paths.get(l).isAbsolute) l else dir.resolve(l).toString)
    }

    val pages = Iterator.iterate(Option(firstPagePath)) {
      case Some(p) => nextLink(p)
      case None => None
    }.takeWhile(_.isDefined).take(maxPages).flatten.toSeq

    pages.map(p => pageDf(p).select(explode(col("value")).as("v"))
        .select(col("v.*")))
      .reduce(_.unionByName(_))
  }
}
