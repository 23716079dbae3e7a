package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q52 derives variance/stddev/corr from exact decimal moment sums so
  * both engines hash-match; this spec pins that the derived values
  * agree with Spark's native streaming aggregates (var_samp/corr) —
  * the moment form is a reformulation, not a different statistic. */
class StatsBatterySpec extends SparkSpec {

  test("moment-derived mean/var/corr agree with the builtin aggregates") {
    val d = "/root/testdata/sf0.001"
    val derived = CapabilityQueries.q52StatsBattery(spark, d)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(5)))).toMap
    val builtin = graft.core.Tables.lineitem(spark, d)
      .groupBy("l_returnflag")
      .agg(avg("l_quantity").as("m"),
        var_samp("l_quantity").as("v"),
        corr("l_quantity", "l_discount").as("c"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(derived.keySet == builtin.keySet && derived.nonEmpty)
    builtin.foreach { case (k, (m, v, c)) =>
      val (dm, dv, dc) = derived(k)
      assert(math.abs(dm - m) <= 1e-9 * math.abs(m), s"mean $k")
      assert(math.abs(dv - v) <= 1e-6 * math.abs(v), s"var $k")
      assert(math.abs(dc - c) <= 1e-6, s"corr $k")
    }
  }
}
