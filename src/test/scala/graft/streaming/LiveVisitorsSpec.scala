package graft.streaming

import graft.SparkSpec
import graft.logs.{Enrich, LogView}

class LiveVisitorsSpec extends SparkSpec {

  test("stateful streaming visitor tracking equals the batch operator") {
    val streamed = LiveVisitors.trackVisitorsStream(spark, sf)
      .select("event_id", "visitor_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val batch = Enrich.trackVisitors(LogView(spark, sf))
      .select("event_id", "visitor_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed.size == batch.size)
    assert(streamed == batch)
  }
}
