package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.dedup.Dedup

/** Dev probe: d11 candidate volume and wall time vs length-band width. */
object EditDistProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val part = Tables.part(spark, d)
    for (band <- Seq(8, 8, 4, 2)) {
      val t0 = System.nanoTime()
      val n = Dedup.editDistancePairs(part, "p_partkey", "p_name",
        Seq("p_brand", "p_size"), maxDist = 2, lenBand = band).count()
      println(f"[ed] band=$band pairs=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
