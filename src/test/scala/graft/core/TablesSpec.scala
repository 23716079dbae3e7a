package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Pins [[Tables.normalizeTs]] against every ts encoding the testdata
  * has shipped — the round-7 incident (events.parquet silently
  * re-encoded nanos→NTZ under a frozen tree, collapsing every
  * timestamp 1000× and flipping two queries to wrong answers) is the
  * regression this spec exists to catch: whatever the writer emits,
  * the engine must read the SAME instants. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // three known UTC instants, microsecond precision
  private val micros = Seq(
    1704067200000000L, // 2024-01-01 00:00:00
    1704070800123456L, // 2024-01-01 01:00:00.123456
    1735689599999999L) // 2024-12-31 23:59:59.999999

  private def writeAndNormalize(encode: String): Seq[Long] = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_enc_$encode")
    val path = dir.resolve("t.parquet").toString
    val base = micros.toDF("us")
    val df = encode match {
      // the legacy-flag presentation of TIMESTAMP(NANOS): raw int64
      // epoch nanos under the column name
      case "nanos_long" => base.select(($"us" * 1000L).as("ts"))
      // pandas/polars/DuckDB default: TIMESTAMP_MICROS isAdjustedToUTC=0
      case "ntz"        => base.select(timestamp_micros($"us").cast(TimestampNTZType).as("ts"))
      // isAdjustedToUTC=1 instant semantics
      case "utc"        => base.select(timestamp_micros($"us").as("ts"))
    }
    df.coalesce(1).write.mode("overwrite").parquet(path)
    val normalized = Tables.normalizeTs(spark.read.parquet(path))
    assert(normalized.schema("ts").dataType == TimestampType,
      s"$encode: normalizeTs must yield TimestampType")
    normalized.select(unix_micros($"ts")).collect().map(_.getLong(0))
      .toSeq.sorted
  }

  test("normalizeTs reads identical instants from nanos-long, TIMESTAMP_NTZ, and UTC encodings") {
    val expected = micros.sorted
    assert(writeAndNormalize("nanos_long") == expected)
    assert(writeAndNormalize("ntz") == expected)
    assert(writeAndNormalize("utc") == expected)
  }

  test("normalizeTs refuses a raw INT64 column whose magnitude is not epoch-nanos") {
    // raw epoch MICROS (and millis) written as plain INT64 land in the
    // same LongType arm as legacy nanos; dividing them by 1000 would
    // silently collapse every instant 1000× — the guard must throw
    // loudly instead of guessing the unit
    val dir = java.nio.file.Files.createTempDirectory("graft_enc_micros")
    val path = dir.resolve("t.parquet").toString
    micros.toDF("ts").coalesce(1).write.mode("overwrite").parquet(path)
    val e = intercept[IllegalArgumentException] {
      Tables.normalizeTs(spark.read.parquet(path)).collect()
    }
    assert(e.getMessage.contains("epoch-NANOS"))
  }

  test("normalizeTs leaves non-ts columns and other frames untouched") {
    val df = Seq((1L, "a")).toDF("id", "v")
    // no ts column at all → schema lookup would throw; the events
    // loader only calls it on frames that HAVE ts, so pin that contract
    intercept[IllegalArgumentException] { Tables.normalizeTs(df) }
    val withTs = Seq((1L, java.sql.Timestamp.valueOf("2024-06-01 12:00:00")))
      .toDF("id", "ts")
    assert(Tables.normalizeTs(withTs).collect() === withTs.collect())
  }

  test("orders/lineitem loaders normalize their ts columns; embeddings restores array<float>") {
    val sf = "/root/testdata/sf0.001"
    assert(Tables.orders(spark, sf).schema("o_orderdate").dataType == TimestampType)
    assert(Tables.lineitem(spark, sf).schema("l_shipdate").dataType == TimestampType)
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    assert(Tables.embeddings(spark, sf).schema("embedding").dataType ==
      ArrayType(FloatType))
    // a double-encoded regeneration comes back as the declared float
    // contract (the drift shape pandas/polars produce)
    val dir = java.nio.file.Files.createTempDirectory("graft_embdrift")
    val asDouble = Tables.embeddings(spark, sf)
      .withColumn("embedding", $"embedding".cast(ArrayType(DoubleType)))
    asDouble.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val restored = Tables.embeddings(spark, dir.toString)
    assert(restored.schema("embedding").dataType == ArrayType(FloatType))
    assert(restored.count() == asDouble.count())
  }

  test("registerAll views use the normalizing accessors (SQL and DataFrame paths agree)") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    assert(spark.table("events").schema("ts").dataType == TimestampType)
    assert(spark.table("orders").schema("o_orderdate").dataType == TimestampType)
    assert(spark.table("lineitem").schema("l_shipdate").dataType == TimestampType)
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    assert(spark.table("embeddings").schema("embedding").dataType ==
      ArrayType(FloatType))
  }

  test("events loader yields TimestampType on the CURRENT testdata encoding") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == TimestampType)
    // sanity: the corpus lives in 2024, not 1970 (the 1000×-collapse
    // failure mode put everything at 1970-01-20)
    val yr = ev.select(min(year($"ts")), max(year($"ts"))).head()
    assert(yr.getInt(0) >= 2020 && yr.getInt(1) <= 2030,
      s"suspicious event-time range: $yr")
  }
}
