package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** The 100 TB posture for the stateful streaming family (q57 session
  * windows, q63 sketch maintenance) is state LARGER than executor
  * heap — which means the RocksDB state store, not the default
  * HDFS-backed in-memory map. This spec runs both twins under BOTH
  * providers and pins (a) identical answers — the provider is a
  * storage engine, never a semantics change — and (b) via the
  * queries' own state-operator metrics, that RocksDB actually held
  * the state (rocksdb* custom metrics present, state rows > 0), so a
  * conf typo can't silently fall back to the default provider.
  */
class StateStoreProviderSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Progress events can trail with empty batches; the state assertion
    * reads the LAST progress carrying state operators. */
  private def stateOps(q: org.apache.spark.sql.streaming.StreamingQuery) =
    q.recentProgress.reverse.map(_.stateOperators)
      .find(_.nonEmpty).getOrElse(Array.empty)

  test("q57 session windows: identical under HDFS and RocksDB state stores; RocksDB metrics prove it engaged") {
    def sessions(name: String, confs: Map[String, String],
        inspect: org.apache.spark.sql.streaming.StreamingQuery => Unit) =
      EventsStream.runToCompletion(spark,
          sess => EventsStream.userSessions(EventsStream.readEvents(sess, sf)),
          name, extraConfs = confs, inspect = inspect)
        .orderBy("user_id", "session_start_us")
        .collect().toSeq
    val hdfs = sessions("ss_hdfs_sessions", Map.empty, _ => ())
    var sawRocks = false
    val rocks = sessions("ss_rocks_sessions", Map(providerKey -> rocksDb),
      q => {
        val ops = stateOps(q)
        assert(ops.nonEmpty, "no state operator in any progress event")
        assert(ops.head.numRowsTotal > 0, "no session state rows recorded")
        assert(ops.head.customMetrics.keySet.asScala
          .exists(_.startsWith("rocksdb")),
          s"no rocksdb metrics: ${ops.head.customMetrics.keySet}")
        sawRocks = true
      })
    assert(sawRocks)
    assert(rocks.nonEmpty && rocks == hdfs)
  }

  test("q63 sketch maintenance: theta agg state round-trips RocksDB integer-exact") {
    import graft.functions.ThetaFunctions._
    def sketches(name: String, confs: Map[String, String],
        inspect: org.apache.spark.sql.streaming.StreamingQuery => Unit) =
      EventsStream.runToCompletion(spark,
          sess => EventsStream.readEvents(sess, sf)
            .groupBy(date_trunc("day", col("ts")).as("day"))
            .agg(thetaSketch(col("user_id")).as("sk")),
          name, extraConfs = confs, inspect = inspect)
        .select(col("day"), thetaEstimate(col("sk")).as("est"))
        .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val hdfs = sketches("ss_hdfs_sketch", Map.empty, _ => ())
    var sawRocks = false
    val rocks = sketches("ss_rocks_sketch", Map(providerKey -> rocksDb),
      q => {
        val ops = stateOps(q)
        assert(ops.nonEmpty && ops.head.customMetrics.keySet.asScala
          .exists(_.startsWith("rocksdb")))
        sawRocks = true
      })
    assert(sawRocks)
    assert(rocks.nonEmpty && rocks == hdfs)
    // and both equal the exact batch answer (theta exact mode below
    // nominal entries: the estimate IS the distinct count)
    val exact = graft.core.Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(rocks == exact)
  }
}
