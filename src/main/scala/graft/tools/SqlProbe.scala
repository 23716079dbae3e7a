package graft.tools

/** Ad-hoc SQL feature probe: run one SQL string against the registered
  * testdata views and print the result (or the failure). Usage:
  *   runMain graft.tools.SqlProbe <sfDir> <sql>
  */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Tables.registerAll(spark, args(0))
    args.drop(1).foreach { sql =>
      println(s"----- $sql")
      try spark.sql(sql).show(10, truncate = false)
      catch { case e: Throwable =>
        println(s"FAILED: ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).linesIterator.take(4).mkString(" | "))
      }
    }
    spark.stop()
  }
}
