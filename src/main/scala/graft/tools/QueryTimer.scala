package graft.tools

/** Dev harness: time named SparkEntry queries against one SF dir.
  * `QueryTimer <sfDir> <query>...` — one warm-up pass at sf0.001,
  * then each query timed (cache cleared between). Prints seconds per
  * query; min over repeated invocations is the stable read on a
  * shared box (see SCALE10_r05.json methodology).
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryTimer <sfDir> <query>...")
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.head
    val names = args.tail.toSeq
    names.foreach { q =>
      try { graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count() }
      catch { case scala.util.control.NonFatal(_) => () }
      spark.catalog.clearCache()
    }
    names.foreach { q =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      println(f"[timer] $q%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s   ($n rows)")
    }
    spark.stop()
  }
}
