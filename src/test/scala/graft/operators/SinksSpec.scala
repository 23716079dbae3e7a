package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import java.nio.file.Files

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory("graft_sink").resolve(name).toString

  test("snapshot overwrite fully replaces prior batch, batch-constant ts") {
    val path = tmp("snap")
    Sinks.snapshot(Seq(("a", 1), ("b", 2)).toDF("id", "v"), path,
      Timestamp.valueOf("2024-09-01 00:00:00"))
    Sinks.snapshot(Seq(("c", 3)).toDF("id", "v"), path,
      Timestamp.valueOf("2024-11-08 00:00:00"))
    val rows = spark.read.parquet(path).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("id") == "c")
    assert(rows.head.getAs[Timestamp]("timeGenerated") ==
      Timestamp.valueOf("2024-11-08 00:00:00"))
  }

  test("retention append keeps rows within maxAgeDays, ages out the rest") {
    val path = tmp("ret")
    Sinks.retentionAppend(spark, Seq(("old", 1)).toDF("id", "v"), path,
      Timestamp.valueOf("2024-09-01 00:00:00"), maxAgeDays = 40)
    Sinks.retentionAppend(spark, Seq(("new", 2)).toDF("id", "v"), path,
      Timestamp.valueOf("2024-11-08 00:00:00"), maxAgeDays = 40)
    val ids = spark.read.parquet(path).select("id").as[String].collect().toSet
    assert(ids == Set("new")) // 68 days > 40 aged out
  }

  test("retention keeps multiple batches inside the window") {
    val path = tmp("ret2")
    Sinks.retentionAppend(spark, Seq(("b1", 1)).toDF("id", "v"), path,
      Timestamp.valueOf("2024-10-20 00:00:00"), maxAgeDays = 40)
    Sinks.retentionAppend(spark, Seq(("b2", 2)).toDF("id", "v"), path,
      Timestamp.valueOf("2024-11-08 00:00:00"), maxAgeDays = 40)
    val ids = spark.read.parquet(path).select("id").as[String].collect().toSet
    assert(ids == Set("b1", "b2")) // 19 days <= 40 retained
  }

  test("surrogate keys are unique; contiguous mode matches IDENTITY(1,1)") {
    val df = Seq("b", "a", "c").toDF("id")
    val m = Sinks.withSurrogateKey(df)
    assert(m.select("ClusterID").distinct().count() == 3)
    val c = Sinks.withSurrogateKey(df, contiguous = true)
      .orderBy("ClusterID").collect()
    assert(c.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    assert(c.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
  }
}
