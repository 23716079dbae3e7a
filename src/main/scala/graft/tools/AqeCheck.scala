package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: is ADAPTIVE execution live for the batch queries a
  * foreachBatch body runs? Prints the session clone's conf and the
  * executed-plan head for (a) a plain aggregation, (b) a CACHED frame
  * scan, from inside a foreachBatch body — the two shapes the streamed
  * ingests execute per micro-batch. */
object AqeCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_aqecheck")
    val src = dir.resolve("in")
    java.nio.file.Files.createDirectories(src)
    (1 to 500).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
      .coalesce(1).write.parquet(dir.resolve("stage").toString)
    val part = new java.io.File(dir.resolve("stage").toString)
      .listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, src.resolve("r0.parquet"))
    val q = spark.readStream
      .schema("id LONG, text STRING")
      .parquet(src.toString)
      .writeStream
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.streaming.DedupStream.restoreAqe(batch)
        val s = batch.sparkSession
        println(s"[aqecheck] clone adaptive.enabled=" +
          s.conf.get("spark.sql.adaptive.enabled"))
        println(s"[aqecheck] clone canChangeCached=" + s.conf.get(
          "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"))
        val agg = batch.groupBy($"id" % 7).count()
        println("[aqecheck] agg plan head: " +
          agg.queryExecution.executedPlan.getClass.getSimpleName)
        agg.count()
        val cached = batch.select($"id", $"text").cache()
        try {
          val cagg = cached.groupBy($"id" % 5).count()
          cagg.count()
          println("[aqecheck] cached-agg plan: " +
            cagg.queryExecution.executedPlan.getClass.getSimpleName)
          println(cagg.queryExecution.executedPlan.toString.linesIterator
            .take(12).map("[aqecheck]   " + _).mkString("\n"))
        } finally cached.unpersist()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.stop()
    graft.core.TempDirs.deleteRecursively(dir.toFile)
  }
}
