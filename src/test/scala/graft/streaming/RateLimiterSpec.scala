package graft.streaming

import graft.SparkSpec
import graft.logs.LogView

class RateLimiterSpec extends SparkSpec {

  test("streaming token bucket equals the reference rule per site") {
    // ~1 msg/hour with burst 2: per-site traffic (~3.3/day but bursty)
    // gets thinned, so both accept and reject paths are exercised
    val rate = 1.0 / 3600
    val burst = Some(2.0)
    val got = RateLimiter.rateLimitStream(spark, sf, rate, burst)
      .collect().map(r => (r.getString(2), r.getLong(0))).toSet
    val bySite = LogView(spark, sf)
      .select("site", "event_id", "timestamp")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val want = bySite.toSeq.flatMap { case (site, rows) =>
      RateLimiter.referenceAccept(
        rows.map(r => (r._2, r._3)).toSeq, rate, burst.get)
        .map(site -> _)
    }.toSet
    assert(want.nonEmpty)
    val onlyGot = got -- want
    val onlyWant = want -- got
    assert(onlyGot.isEmpty && onlyWant.isEmpty,
      s"sizes got=${got.size} want=${want.size} " +
        s"onlyGot=${onlyGot.take(5)} onlyWant=${onlyWant.take(5)}")
    // the limiter must actually drop something at this rate
    assert(want.size < LogView(spark, sf).count())
  }

  test("burst allows an initial spike of up to 10*rate") {
    // crafted: 20 records in the same second, rate=1/s, burst=10
    val rows = (1L to 20L).map(i => (i, 1704067200000000L + i * 1000))
    val accepted = RateLimiter.referenceAccept(rows, rate = 1.0, burst = 10.0)
    assert(accepted.size >= 10 && accepted.size <= 11)
    assert(accepted.take(10) == (1L to 10L))
  }
}
