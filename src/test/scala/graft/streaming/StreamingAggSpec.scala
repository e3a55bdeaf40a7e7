package graft.streaming

import graft.{SparkSpec, Tables}
import graft.logs.LogView
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingAggSpec extends SparkSpec {

  test("watermarked windowed aggregation over the streamed log") {
    // pond's `--follow` with per-minute stats: readStream → LogView →
    // event-time window + watermark → complete-to-memory. The
    // watermark bounds state at scale (late data beyond 1h dropped).
    val schema = Tables.events(spark, sf).schema
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf)
    val perHour = LogView.fromEvents(stream)
      .withColumn("event_time", timestamp_micros(col("timestamp")))
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "1 hour"), col("site"))
      .agg(count(lit(1)).as("n"))
    val q = perHour.writeStream
      .format("memory")
      .queryName("graft_follow_stats")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("graft_follow_stats")
    val streamedTotal = got.agg(sum("n")).head().getLong(0)
    val batchTotal = LogView(spark, sf).count()
    assert(streamedTotal == batchTotal)
    assert(got.select("site").distinct().count() == 10)
  }

  test("stats_stream equals batch stats exactly") {
    val streamed = StreamOps.statsStream(spark, sf).head()
    val batch = graft.logs.Shaping.stats(LogView(spark, sf)).head()
    assert(streamed == batch)
  }
}
