package graft.streaming

import graft.SparkSpec
import graft.logs.LogView
import org.apache.spark.sql.functions._

class FollowSpec extends SparkSpec {

  test("follow (streaming tail) equals the batch query over the same input") {
    val since = 1704326400000000L // 2024-01-04T00:00:00Z
    val streamed = Follow.followTail(spark, sf, since)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val batch = LogView(spark, sf).filter(col("timestamp") >= since)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
