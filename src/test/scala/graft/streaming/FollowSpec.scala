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

  test("CONTINUE: stop, append, resume from checkpoint — no dups, no gaps") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("continue")
    val (src, ckpt, out) =
      (s"$base/src", s"$base/ckpt", s"$base/out")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    // the file stream source lists FLAT files: write each batch to a
    // scratch dir and drop the single part file into src
    def appendEvents(ids: Range, name: String): Unit = {
      val scratch = java.nio.file.Files.createTempDirectory("evt")
      ids.map { i =>
        (i.toLong, 1704067200000000000L + i * 1000000000L, i.toLong % 7,
          "view", s"""{"k": $i}""", i * 1.5)
      }.toDF("event_id", "ts", "user_id", "event_type", "props", "value")
        .coalesce(1).write.mode("overwrite").parquet(scratch.toString)
      val part = scratch.toFile.listFiles
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(src, name))
    }
    // dump phase: first batch of records
    appendEvents(0 until 50, "part1.parquet")
    Follow.followContinue(spark, src, ckpt, out)
    val afterDump = spark.read.parquet(out)
      .select("event_id").collect().map(_.getLong(0)).toSeq
    assert(afterDump.sorted == (0L until 50L))
    // the server keeps receiving while we are away
    appendEvents(50 until 80, "part2.parquet")
    // CONTINUE: resume from the checkpoint cursor
    Follow.followContinue(spark, src, ckpt, out)
    val afterResume = spark.read.parquet(out)
      .select("event_id").collect().map(_.getLong(0)).toSeq
    assert(afterResume.size == 80, s"expected 80 rows, got ${afterResume.size}")
    assert(afterResume.sorted == (0L until 80L), "gap or duplicate after resume")
  }
}
