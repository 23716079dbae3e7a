package graft.streaming

import graft.SparkSpec
import graft.queries.CapabilityQueries

class EventsStreamSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streaming tumbling-window agg equals the batch twin") {
    val batch = CapabilityQueries.q15EventWindow(spark, sf).collect().toSeq
    val streamed = EventsStream.runToCompletion(spark,
      EventsStream.tumblingHourly(EventsStream.readEvents(spark, sf)),
      "spec_tumbling")
      .orderBy("hour_start", "event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("streaming session windows equal the batch session_window result") {
    val batch = CapabilityQueries.q19SessionWindow(spark, sf).collect().toSeq
    val streamed = EventsStream.runToCompletion(spark,
      EventsStream.userSessions(EventsStream.readEvents(spark, sf)),
      "spec_sessions")
      .orderBy("user_id", "session_start_us").collect().toSeq
    assert(streamed == batch)
  }
}
