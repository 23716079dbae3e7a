package graft.tools

import graft.SparkEntry

/** Plan inspector: prints the formatted physical plan and wall time of
  * named SparkEntry queries. Usage:
  *   runMain graft.tools.Explain <sfDir> <query> [query...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.GraftSession.local(32)
    args.drop(1).foreach { name =>
      // time construction + count, exactly as Bench does — effectful
      // queries (streaming twins, trained models) do their real work
      // during construction
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val n = df.count()
      val tTotal = (System.nanoTime() - t0) / 1e9
      println(s"===== $name =====")
      df.explain("formatted")
      println(f"[$name] rows=$n build=$tBuild%.2fs total=$tTotal%.2fs")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
