package graft.sources

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.SaveMode
import java.nio.file.Files

/** Multi-format source/sink round-trips (SURVEY §2.2's engine source
  * list: parquet, JSON, CSV reads; overwrite/append writes). Always
  * explicit schemas — inference never in the prod path. */
class SourcesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("csv round-trip with explicit schema preserves data") {
    val nation = Tables.nation(spark, sf)
    val path = Files.createTempDirectory("graft_csv").resolve("nation").toString
    nation.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
    val back = spark.read.schema(nation.schema).option("header", "true").csv(path)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("json round-trip with explicit schema preserves data") {
    val region = Tables.region(spark, sf)
    val path = Files.createTempDirectory("graft_json").resolve("region").toString
    region.write.mode(SaveMode.Overwrite).json(path)
    val back = spark.read.schema(region.schema).json(path)
    assert(back.orderBy("r_regionkey").collect().toSeq ==
      region.orderBy("r_regionkey").collect().toSeq)
  }

  test("parquet append mode accumulates batches") {
    val path = Files.createTempDirectory("graft_app").resolve("t").toString
    val r = Tables.region(spark, sf)
    r.write.mode(SaveMode.Overwrite).parquet(path)
    r.write.mode(SaveMode.Append).parquet(path)
    assert(spark.read.parquet(path).count() == 2 * r.count())
  }
}
