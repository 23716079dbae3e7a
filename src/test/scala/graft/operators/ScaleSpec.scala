package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bucketed co-located join plans without a shuffle exchange") {
    Scale.writeBucketed(Tables.orders(spark, sf), "orders_b", "o_orderkey", 8)
    Scale.writeBucketed(
      Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", "o_orderkey", 8)
    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"), "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"))
    // and it is still correct
    val expected = Tables.orders(spark, sf).join(
      Tables.lineitem(spark, sf)
        .withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey").count()
    assert(joined.count() == expected)
  }

  test("date-partitioned layout prunes partitions under a time predicate") {
    val path = java.nio.file.Files.createTempDirectory("graft_part")
      .resolve("events").toString
    Scale.writePartitionedByDay(Tables.events(spark, sf), "ts", path)
    val q = spark.read.parquet(path)
      .filter(col("event_date") === "2024-01-02")
    val scan = q.queryExecution.executedPlan.toString
    // the predicate lands in PartitionFilters (directory pruning), not
    // in post-scan Filter or data filters
    assert(scan.contains("PartitionFilters: [isnotnull(event_date"))
    assert(scan.contains("event_date#") && scan.contains("= 2024-01-02"))
    val expected = Tables.events(spark, sf)
      .filter(to_date(col("ts")) === "2024-01-02").count()
    assert(q.count() == expected && expected > 0)
  }

  test("salted join equals the unsalted equi-join") {
    val fact = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val dim = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("k"), col("o_orderstatus"))
    val salted = Scale.saltedJoin(fact, dim, "k", salts = 4)
    val plain = fact.join(dim, Seq("k"))
    assert(salted.count() == plain.count())
    val a = salted.groupBy("k").count().orderBy("k").collect().toSeq
    val b = plain.groupBy("k").count().orderBy("k").collect().toSeq
    assert(a == b)
  }

  test("compactFiles merges a fragmented table, preserves data, leaves no swap debris") {
    import java.nio.file.{Files, Paths}
    val work = Files.createTempDirectory("graft_compact")
    val path = work.resolve("events").toString
    val ev = Tables.events(spark, sf)
    ev.repartition(64).write.parquet(path) // the incremental-load fragmentation shape
    def dataFiles = Paths.get(path).toFile.listFiles
      .count(f => f.getName.endsWith(".parquet"))
    assert(dataFiles == 64)
    val before = spark.read.parquet(path).orderBy("event_id").collect().toSeq
    val requested = Scale.compactFiles(spark, path, targetBytes = 512L << 10)
    assert(dataFiles == requested && requested < 64 && requested >= 1)
    val after = spark.read.parquet(path).orderBy("event_id").collect().toSeq
    assert(after == before)
    assert(!Files.exists(Paths.get(path + "_next")))
    assert(!Files.exists(Paths.get(path + "_old")))
  }

  test("salted aggregation equals direct aggregation") {
    val df = Tables.lineitem(spark, sf)
    val salted = Scale.saltedAgg(df, "l_returnflag", salts = 8,
        partial = Seq(sum("l_quantity").as("s"), count(lit(1)).as("c")),
        finalAgg = Seq(sum("s").as("total_qty"), sum("c").as("n")))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val direct = df.groupBy(col("l_returnflag"))
      .agg(sum("l_quantity").as("total_qty"), count(lit(1)).as("n"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(salted.map(t => (t._1, math.round(t._2 * 100), t._3)) ==
      direct.map(t => (t._1, math.round(t._2 * 100), t._3)))
  }
}
