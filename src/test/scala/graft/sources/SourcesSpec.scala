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

  test("orc round-trip preserves data") {
    val customer = Tables.customer(spark, sf)
    val path = Files.createTempDirectory("graft_orc").resolve("customer").toString
    customer.write.mode(SaveMode.Overwrite).orc(path)
    val back = spark.read.schema(customer.schema).orc(path)
    assert(back.orderBy("c_custkey").collect().toSeq ==
      customer.orderBy("c_custkey").collect().toSeq)
  }

  test("long nextLink chains read correctly through both readers (7 pages)") {
    import graft.core.EntitySchemas
    val dir = Files.createTempDirectory("graft_pages")
    val n = 7
    (1 to n).foreach { i =>
      val next = if (i < n) s""","@odata.nextLink": "page${i + 1}.json"""" else ""
      val rows = (1 to 3).map(j =>
        s"""{"id": "p$i-r$j", "displayName": "CPC-$i-$j"}""").mkString(",")
      Files.writeString(dir.resolve(s"page$i.json"),
        s"""{"value": [$rows]$next}""")
    }
    val first = dir.resolve("page1.json").toString
    val loop = ODataPageReader.readPages(spark, first,
      EntitySchemas.cloudPcSource)
    assert(loop.count() == n * 3)
    val v2 = spark.read.format("graft-odata")
      .schema(EntitySchemas.cloudPcSource)
      .option("firstPage", first).load()
    assert(v2.count() == n * 3)
    assert(v2.rdd.getNumPartitions == n) // one partition per page
    assert(v2.orderBy("id").collect().toSeq ==
      loop.orderBy("id").collect().toSeq)
  }

  test("delta sync: tombstones flagged, deltaLink surfaced, applyDelta merges update/insert/delete") {
    import graft.core.EntitySchemas
    import graft.operators.Sinks
    import graft.queries.ParityQueries.fixtureRoot
    val snap = ODataPageReader.readPages(spark,
      s"$fixtureRoot/managedDevices/page1.json",
      EntitySchemas.managedDeviceSource)
    val (changes, link) = ODataPageReader.readDeltaPages(spark,
      s"$fixtureRoot/managedDevicesDelta/page1.json",
      EntitySchemas.managedDeviceSource)
    // the final page's cursor comes back for the caller to persist
    assert(link.exists(_.contains("$deltatoken=abc123")))
    val rows = changes.select("id", "deviceName", "removed").collect()
      .map(r => r.getString(0).take(8) -> (r.getString(1), r.getBoolean(2)))
      .toMap
    assert(rows.keySet == Set("11111111", "33333333", "77777777"))
    assert(rows("33333333") == (null, true))        // tombstone: id only
    assert(rows("11111111") == ("DESKTOP-ALPHA-R2", false))
    val merged = Sinks.applyDelta(snap, changes, "id")
    val byId = merged.select("id", "deviceName").collect()
      .map(r => r.getString(0).take(8) -> r.getString(1)).toMap
    assert(merged.count() == snap.count())          // -1 delete +1 insert
    assert(!byId.contains("33333333"))              // deleted
    assert(byId("11111111") == "DESKTOP-ALPHA-R2")  // updated in place
    assert(byId("77777777") == "DESKTOP-ETA")       // inserted
    assert(byId("22222222") == snap
      .filter(org.apache.spark.sql.functions.col("id").startsWith("22222222"))
      .select("deviceName").collect().head.getString(0)) // untouched survives
  }

  test("record-level error policy: PERMISSIVE quarantines, DROPMALFORMED skips, FAILFAST throws") {
    // the record-level analog of the reference's entity-level skip
    // policy (O9, MD-PS:151-162): one bad record must not abandon the
    // batch unless the caller asked for exactly that
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("badrec").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/rows.json"),
      """{"id": 1, "name": "ok"}
        |{"id": "NOT_A_NUMBER", "name": "bad"}
        |{"id": 3, "name": "also ok"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("_corrupt_record", StringType)))

    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").json(dir).cache()
    try {
      assert(permissive.count() == 3)
      val bad = permissive.filter(permissive("_corrupt_record").isNotNull)
      assert(bad.count() == 1)
      // the malformed row keeps its raw text for quarantine/replay and
      // its typed columns are null
      val r = bad.collect().head
      assert(r.getAs[String]("_corrupt_record").contains("NOT_A_NUMBER"))
      assert(r.isNullAt(r.fieldIndex("id")))
    } finally permissive.unpersist()

    val dropped = spark.read
      .schema(StructType(schema.fields.filter(_.name != "_corrupt_record")))
      .option("mode", "DROPMALFORMED").json(dir)
    assert(dropped.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))

    val failfast = spark.read
      .schema(StructType(schema.fields.filter(_.name != "_corrupt_record")))
      .option("mode", "FAILFAST").json(dir)
    intercept[org.apache.spark.SparkException] { failfast.collect() }
  }

  test("parquet append mode accumulates batches") {
    val path = Files.createTempDirectory("graft_app").resolve("t").toString
    val r = Tables.region(spark, sf)
    r.write.mode(SaveMode.Overwrite).parquet(path)
    r.write.mode(SaveMode.Append).parquet(path)
    assert(spark.read.parquet(path).count() == 2 * r.count())
  }
}
