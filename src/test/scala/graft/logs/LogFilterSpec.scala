package graft.logs

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class LogFilterSpec extends SparkSpec {

  private def log: DataFrame = LogView(spark, sf).cache()

  test("status range is half-open [begin, end) — Filter.hxx:70-73") {
    val in = log.filter(LogFilter(statusBegin = 200, statusEnd = 404).predicate)
      .select("status").distinct().collect().map(_.getInt(0)).toSet
    assert(in.contains(200))
    assert(!in.contains(404)) // end is exclusive
  }

  test("since/until is a closed interval — Filter.hxx:42-46") {
    val ts = log.orderBy("timestamp").select("timestamp")
      .limit(10).collect().map(_.getLong(0))
    val (lo, hi) = (ts(2), ts(7))
    val got = log.filter(LogFilter(sinceUs = Some(lo), untilUs = Some(hi)).predicate)
      .agg(min("timestamp"), max("timestamp")).head()
    assert(got.getLong(0) == lo) // since itself matches
    assert(got.getLong(1) == hi) // until itself matches
  }

  test("unsafe method excludes exactly the RFC 9110 safe set") {
    val methods = log.filter(LogFilter(unsafeMethod = true).predicate)
      .select("method").distinct().collect().map(_.getString(0)).toSet
    assert(methods.intersect(LogFilter.safeMethods).isEmpty)
    assert(methods.nonEmpty)
  }

  test("empty site name matches records with NO site — doc/index.rst site=") {
    import spark.implicits._
    val rows = Seq(
      (1L, "site_a"), (2L, null.asInstanceOf[String]), (3L, "site_b"))
      .toDF("event_id", "site")
    def ids(f: LogFilter) = rows.filter(f.predicate)
      .collect().map(_.getLong(0)).toSet
    assert(ids(LogFilter(sites = Set(""))) == Set(2L)) // only the null-site record
    assert(ids(LogFilter(sites = Set("", "site_a"))) == Set(1L, 2L))
    assert(ids(LogFilter(sites = Set("site_a"))) == Set(1L))
  }

  test("empty filter passes everything — MatchFilter on empty set") {
    assert(log.filter(LogFilter().predicate).count() == log.count())
  }

  test("uri prefix matches starts-with, not substring") {
    val rows = log.filter(LogFilter(uriPrefix = Some("/view/")).predicate)
      .select("uri").distinct().collect().map(_.getString(0))
    assert(rows.nonEmpty)
    assert(rows.forall(_.startsWith("/view/")))
    // "item" occurs inside every uri but is not a prefix of any
    assert(log.filter(LogFilter(uriPrefix = Some("item")).predicate).count() == 0)
  }

  test("combined filter is the conjunction — Filter::operator()") {
    val f = LogFilter(sites = Set("site_1"), statusBegin = 200, statusEnd = 300)
    val n = log.filter(f.predicate).count()
    val manual = log.filter(col("site") === "site_1" &&
      col("status") >= 200 && col("status") < 300).count()
    assert(n == manual)
  }
}
