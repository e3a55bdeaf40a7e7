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

  test("watermark drops events later than the threshold (bounded state)") {
    // the 100 TB claim behind every watermarked agg here: state can't
    // grow without bound because sufficiently-late data is DISCARDED.
    // Run 1 establishes watermark = base (max base+1h − 1h). Run 2
    // (checkpoint-resumed, parquet sink — memory can't recover) adds
    // an event 2 h BEFORE the watermark and one 10 h after base; the
    // far-future event pushes the watermark to base+9h, finalizing
    // every window below it. If the late event had been accepted, its
    // window [base−2h, base−1h) would finalize and emit too — so the
    // emitted set proves the drop, not just row counting.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wmtest").toString
    val ckpt = java.nio.file.Files.createTempDirectory("wmckpt").toString
    val out = java.nio.file.Files.createTempDirectory("wmout").toString
    val hourUs = 3600000000L
    val base = 1704844800000000L
    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("id LONG, us LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(dir)
        .select(col("id"), timestamp_micros(col("us")).as("t"))
        .withWatermark("t", "1 hour")
        .groupBy(window(col("t"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(expr("unix_micros(w.start)").as("start_us"), col("n"))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Seq((1L, base), (2L, base + hourUs)).toDF("id", "us")
      .coalesce(1).write.mode("append").parquet(dir)
    runOnce()
    Seq((3L, base - 2 * hourUs), (4L, base + 10 * hourUs))
      .toDF("id", "us").coalesce(1).write.mode("append").parquet(dir)
    runOnce()
    val emitted = spark.read.parquet(out)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // finalized: [base] and [base+1h], one event each; the late id 3
    // must NOT have produced a finalized [base-2h] window
    assert(emitted.get(base).contains(1L), emitted)
    assert(emitted.get(base + hourUs).contains(1L), emitted)
    assert(!emitted.contains(base - 2 * hourUs),
      s"late event leaked into a finalized window: $emitted")
  }

  test("stats_stream equals batch stats exactly") {
    val streamed = StreamOps.statsStream(spark, sf).head()
    val batch = graft.logs.Shaping.stats(LogView(spark, sf)).head()
    assert(streamed == batch)
  }

  test("ann_stream equals the batch indexed search row for row") {
    val streamed = StreamOps.annStream(spark, sf01).collect()
    val batch = graft.pipeline.Ann.ivfTopKIndexed(spark, sf01).collect()
    assert(streamed.nonEmpty && streamed.length == batch.length,
      s"stream=${streamed.length} batch=${batch.length}")
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("quality_gopher_stream equals the batch rule verdicts row for row") {
    val streamed = StreamOps.gopherRulesStream(spark, sf).collect()
    val batch = graft.pipeline.TextAnalysis.gopherRules(spark, sf).collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("text_normalize_stream equals the batch chain row for row") {
    val streamed = StreamOps.textNormalizeStream(spark, sf).collect()
    val batch = graft.pipeline.TextAnalysis.textNormalize(spark, sf).collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("pii_scrub_stream equals the batch scrub row for row") {
    val streamed = StreamOps.piiScrubStream(spark, sf).collect()
    val batch = graft.pipeline.Curation.piiScrub(spark, sf).collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("stream source handles directory-layout tables, not just single files") {
    // regression guard for the sf1 bench bug: the old pathGlobFilter
    // matched only a FILE named events.parquet, so a real table laid
    // out as events.parquet/part-*.parquet silently drained an EMPTY
    // stream (every streaming query "passed" on zero rows)
    val dirSf = java.nio.file.Files
      .createTempDirectory("graft_dirlayout").toString
    val batch = Tables.events(spark, sf)
    batch.write.mode("overwrite").parquet(s"$dirSf/events.parquet")
    val drained = StreamOps.statsStream(spark, dirSf).head()
    val expected = graft.logs.Shaping.stats(LogView(spark, dirSf)).head()
    assert(drained.getLong(0) == batch.count(), "stream must see every row")
    assert(drained == expected)
  }
}
