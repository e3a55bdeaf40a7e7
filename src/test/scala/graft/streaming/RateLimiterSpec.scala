package graft.streaming

import graft.SparkSpec
import graft.logs.LogView

class RateLimiterSpec extends SparkSpec {

  test("streaming token bucket equals the reference rule per site") {
    // near-zero refill with burst 2: each site's http_error messages
    // are thinned to ~the burst, so both accept and reject paths are
    // exercised (non-message records all pass through untouched)
    val rate = 1e-7
    val burst = Some(2.0)
    val got = RateLimiter.rateLimitStream(spark, sf, rate, burst)
      .collect().map(r => (r.getString(2), r.getLong(0))).toSet
    // mirror the IsMessage guard: bucket the http_error records per
    // site, pass everything else through untouched
    val all = LogView(spark, sf)
      .select("site", "event_id", "timestamp", "type")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val (messages, rest) = all.partition(r => r._4 == "http_error" && r._1 != null)
    val want = (messages.groupBy(_._1).toSeq.flatMap { case (site, rows) =>
      RateLimiter.referenceAccept(
        rows.map(r => (r._2, r._3)).toSeq, rate, burst.get)
        .map(site -> _)
    } ++ rest.map(r => r._1 -> r._2)).toSet
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
