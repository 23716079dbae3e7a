package graft.tools

import graft.streaming.EventsStream

/** Dev probe: stream-stream join wall time vs state partition count.
  * Stateful operators create per-partition state stores whose setup +
  * per-batch checkpointing is fixed overhead — this measures how much
  * of the streaming twins' time is that, not data. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    for (p <- Seq(32, 32, 8, 4, 2)) {
      val t0 = System.nanoTime()
      val out = EventsStream.runToCompletion(spark,
        sess => EventsStream.errorPurchasePairs(EventsStream.readEvents(sess, d)),
        s"probe_j_$p${System.nanoTime()}", outputMode = "append",
        statePartitions = p)
      val n = out.count()
      println(f"[probe] join partitions=$p rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    for (p <- Seq(32, 8, 4)) {
      val t0 = System.nanoTime()
      val out = EventsStream.runToCompletion(spark,
        sess => EventsStream.tumblingHourly(EventsStream.readEvents(sess, d)),
        s"probe_t_$p${System.nanoTime()}", statePartitions = p)
      val n = out.count()
      println(f"[probe] agg partitions=$p rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
