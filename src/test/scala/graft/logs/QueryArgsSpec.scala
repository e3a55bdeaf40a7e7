package graft.logs

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QueryArgsSpec extends SparkSpec {

  private val now = 1706745600000000L // 2024-02-01T00:00:00Z

  test("pond query strings parse into the equivalent LogFilter") {
    val p = QueryArgs.parse(Seq(
      "type=http_error", "site=site_1", "site=site_2",
      "since=2024-01-10", "until=2024-01-20T00:00:00Z",
      "status=500:600", "duration_longer=500ms",
      "method=GET,POST", "uri-prefix=/error/"), now)
    assert(p.filter == LogFilter(
      sites = Set("site_1", "site_2"),
      tpe = Some("http_error"),
      sinceUs = Some(1704844800000000L),
      // until carries the input's precision width (Main.cxx:172-174):
      // a to-the-second timestamp spans that whole second
      untilUs = Some(1705708800000000L + 1000000L),
      statusBegin = 500, statusEnd = 600,
      durationLongerUs = Some(500000L),
      uriPrefix = Some("/error/"),
      methods = Set("GET", "POST")))
  }

  test("single status means the one-code range [s, s+1)") {
    val p = QueryArgs.parse(Seq("status=404"), now)
    assert(p.filter.statusBegin == 404 && p.filter.statusEnd == 405)
  }

  test("date= covers the whole civil day, next-midnight inclusive") {
    // reference Main.cxx:179-182: until = date + 24h with a closed
    // compare — a record stamped exactly at the next midnight matches
    val p = QueryArgs.parse(Seq("date=2024-01-05"), now)
    assert(p.filter.sinceUs.contains(1704412800000000L))
    assert(p.filter.untilUs.contains(1704412800000000L + 86400000000L))
  }

  test("until= with date precision spans the whole day; time= spans its width") {
    val u = QueryArgs.parse(Seq("until=2024-01-10"), now)
    assert(u.filter.untilUs.contains(1704844800000000L + 86400000000L))
    val t = QueryArgs.parse(Seq("time=2024-01-10T12"), now)
    assert(t.filter.sinceUs.contains(1704888000000000L))
    assert(t.filter.untilUs.contains(1704888000000000L + 3600000000L))
  }

  test("duplicates and site/group_site conflicts throw like the client") {
    intercept[IllegalArgumentException] {
      QueryArgs.parse(Seq("site=a", "site=a"), now) // Duplicate site name
    }
    intercept[IllegalArgumentException] {
      QueryArgs.parse(Seq("host=h", "host=h"), now) // Duplicate host name
    }
    intercept[IllegalArgumentException] {
      QueryArgs.parse(Seq("site=a", "group_site=5"), now) // mutually exclusive
    }
    intercept[IllegalArgumentException] {
      QueryArgs.parse(Seq("window=5", "window=6"), now) // Duplicate window
    }
  }

  test("window=COUNT@SKIP shapes the result") {
    val p = QueryArgs.parse(Seq("type=http_access", "window=10@5"), now)
    assert(p.window.contains((10, 5)))
    val df = p(LogView(spark, sf))
    assert(df.count() == 10)
  }

  test("end-to-end: query string equals hand-built filter") {
    val viaArgs = QueryArgs.parse(
      Seq("site=site_3", "status=200:300", "unsafe_method"), now)(
      LogView(spark, sf))
    val manual = LogView(spark, sf).filter(LogFilter(
      sites = Set("site_3"), statusBegin = 200, statusEnd = 300,
      unsafeMethod = true).predicate)
    assert(viaArgs.count() == manual.count())
  }

  test("bad arguments are rejected") {
    intercept[IllegalArgumentException] {
      QueryArgs.parse(Seq("frobnicate=1"), now)
    }
    intercept[IllegalArgumentException] {
      QueryArgs.parse(Seq("duration_longer=fast"), now)
    }
  }
}
