package graft.sources.v2

import graft.SparkSpec
import graft.core.EntitySchemas
import graft.queries.ParityQueries
import graft.sources.ODataPageReader
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger

class ODataSourceSpec extends SparkSpec {

  private def mdFirstPage =
    s"${ParityQueries.fixtureRoot}/managedDevices/page1.json"

  private def readMd: DataFrame =
    spark.read.format("graft-odata")
      .schema(EntitySchemas.managedDeviceSource)
      .option("firstPage", mdFirstPage)
      .load()

  test("connector reads all pages and matches the driver-loop reader") {
    val v2 = readMd.orderBy("id").collect()
    val loop = ODataPageReader.readPages(spark, mdFirstPage,
      EntitySchemas.managedDeviceSource).orderBy("id").collect()
    assert(v2.length == 6)
    assert(v2.toSeq == loop.toSeq)
  }

  test("one input partition per page (parallel page scan)") {
    assert(readMd.rdd.getNumPartitions == 2)
  }

  test("string-equality filter is pushed into the scan ($filter eq)") {
    val q = readMd.filter(col("operatingSystem") === "Windows")
    val scan = q.queryExecution.executedPlan.toString
    assert(q.count() == 4)
    // the scan's description advertises the translated OData filter
    val desc = q.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan.description()
    }.mkString
    assert(desc.contains("$filter=operatingSystem eq 'Windows'"))
  }

  test("column pruning reaches the scan ($select)") {
    val q = readMd.select("id", "deviceName")
    val desc = q.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan.description()
    }.mkString
    assert(desc.contains("$select=id,deviceName"))
    assert(!desc.contains("osVersion"))
    assert(q.collect().length == 6)
  }

  test("non-translatable predicates stay in Spark (numeric, non-equality)") {
    val q = readMd.filter(col("azureADRegistered") === true)
    assert(q.count() == 5) // still correct, evaluated post-scan
    val desc = q.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan.description()
    }.mkString
    assert(!desc.contains("azureADRegistered eq"))
  }

  test("nested struct and array fields parse with null semantics intact") {
    val rows = readMd.select("id", "configurationManagerClientHealthState.state",
        "usersLoggedOn")
      .collect().map(r => r.getString(0).take(1) -> r).toMap
    assert(rows("1").getString(1) == "healthy")
    assert(rows("2").isNullAt(1))
    assert(rows("1").getSeq[Any](2).size == 3)
  }

  test("retrying fetcher recovers from transient failures (429 loop)") {
    val failures = new AtomicInteger(2)
    val flaky = new PageFetcher {
      private val real = new LocalPageFetcher
      override def fetch(path: String): String = {
        if (failures.getAndDecrement() > 0)
          throw new RetryableFetchException("429 Too Many Requests")
        real.fetch(path)
      }
    }
    val body = new RetryingPageFetcher(flaky, maxRetries = 5, sleepMs = 0)
      .fetch(mdFirstPage)
    assert(body.contains("DESKTOP-ALPHA"))
  }

  test("retry budget exhausts after maxRetries (error policy)") {
    val alwaysFail = new PageFetcher {
      override def fetch(path: String): String =
        throw new RetryableFetchException("429")
    }
    val r = new RetryingPageFetcher(alwaysFail, maxRetries = 2, sleepMs = 0)
    assertThrows[RetryableFetchException](r.fetch(mdFirstPage))
  }

  test("permanent failures are NOT retried (fail fast for skip policy)") {
    val calls = new AtomicInteger(0)
    val notFound = new PageFetcher {
      override def fetch(path: String): String = {
        calls.incrementAndGet()
        throw new IllegalArgumentException("404 Not Found")
      }
    }
    val r = new RetryingPageFetcher(notFound, maxRetries = 5, sleepMs = 0)
    assertThrows[IllegalArgumentException](r.fetch(mdFirstPage))
    assert(calls.get() == 1) // no retry burned on a permanent error
  }
}
