package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the session-boundary rule [[StreamOps.sessionizeStream]]
  * depends on: Spark's `session_window(t, g)` MERGES events exactly
  * `g` apart, so a window gap of `gapUs − 1` µs reproduces the batch
  * rule `gap >= gapUs ⇒ new session` for µs-integral times. If a
  * Spark upgrade changes the inclusivity, this fails before the gate
  * does.
  */
class SessionWindowBoundarySpec extends SparkSpec {

  test("gapUs-1 window gap reproduces the batch gap>=gapUs split rule") {
    import spark.implicits._
    val gapUs = 1800000000L
    // user 1: exactly gapUs apart → batch rule says TWO sessions
    // user 2: gapUs-1 apart → ONE session
    val df = Seq((1L, 0L), (1L, gapUs), (2L, 0L), (2L, gapUs - 1))
      .toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("t"))
    val got = df
      .groupBy(col("user_id"),
        session_window(col("t"), s"${gapUs - 1} microseconds").as("w"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L), got)
    // and the raw (un-adjusted) gap would MERGE the exact-gap pair —
    // the behavior the −1 adjustment exists to correct
    val raw = df.filter(col("user_id") === 1L)
      .groupBy(session_window(col("t"), s"$gapUs microseconds"))
      .count().count()
    assert(raw == 1L, s"session_window inclusivity changed: $raw")
  }
}
