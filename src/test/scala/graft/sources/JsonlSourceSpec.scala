package graft.sources

import graft.SparkSpec
import graft.logs.LogView
import org.apache.spark.sql.functions._

class JsonlSourceSpec extends SparkSpec {

  test("jsonl round trip is lossless for every wire-format field") {
    val back = JsonlSource.roundTrip(spark, sf)
    val key = Seq("timestamp", "remote_host", "uri")
    val orig = LogView(spark, sf).select(
      back.columns.map(col).toIndexedSeq: _*)
    assert(back.count() == orig.count())
    // full-row multiset equality, both directions
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
    // null-member omission round-trips as NULL (not "null" strings)
    val nulls = back.filter(col("analytics_id").isNull).count()
    val origNulls = orig.filter(col("analytics_id").isNull).count()
    assert(nulls == origNulls && nulls > 0)
    assert(key.forall(back.columns.contains))
  }

  test("corrupt jsonl lines are quarantined, good lines parse fully") {
    val row = JsonlSource.corruptAccounting(spark, sf).head()
    val (nRows, nCorrupt, nGood, tsSum) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val log = LogView(spark, sf)
    assert(nRows == log.count())
    // exactly the mangled subset is flagged
    assert(nCorrupt == log.filter(pmod(col("event_id"), lit(10L)) === 3L).count())
    assert(nGood == nRows - nCorrupt && nCorrupt > 0 && nGood > 0)
    // every surviving line parsed its timestamp to the microsecond
    val expect = log.filter(pmod(col("event_id"), lit(10L)) =!= 3L)
      .select(sum(pmod(col("timestamp"), lit(86400000000L))))
      .head().getLong(0)
    assert(tsSum == expect)
  }

  test("csv round trip is lossless on the full schema, nulls stay null") {
    val back = CsvSource.roundTrip(spark, sf)
    val orig = LogView(spark, sf)
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
    // the \N sentinel came back as NULL, not as a literal string
    assert(back.filter(col("forwarded_to") === "\\N").count() == 0)
    assert(back.filter(col("forwarded_to").isNull).count() ==
      orig.filter(col("forwarded_to").isNull).count())
  }

  test("csv survives embedded newlines and quotes in string fields") {
    import spark.implicits._
    val tricky = Seq(
      (1L, "line1\nline2", "plain"),
      (2L, "has \"quotes\" and, commas", null),
      (3L, null, "x"))
      .toDF("id", "message", "extra")
    val dir = java.nio.file.Files.createTempDirectory("csvnl").toString
    CsvSource.write(tricky, dir)
    val back = CsvSource.read(spark, dir, tricky.schema)
    assert(back.count() == 3)
    assert(back.exceptAll(tricky).isEmpty && tricky.exceptAll(back).isEmpty)
  }

  test("date layout: partition dirs exist and rollup preserves totals") {
    val rollup = DateLayout.writeRollup(spark, sf)
    val total = rollup.agg(sum("n")).head().getLong(0)
    assert(total == LogView(spark, sf).count())
  }

  test("orc round trip is lossless on the full schema; filters push to the scan") {
    val back = OrcSource.roundTrip(spark, sf)
    val orig = LogView(spark, sf)
    // names + types must survive exactly (ORC reads back everything
    // as nullable, so nullability flags are excluded)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      orig.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"${back.schema} vs ${orig.schema}")
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
    // native columnar path: a base-column predicate reaches the ORC
    // reader as a pushed filter (stripe/row-group stats prune I/O)
    val filtered = back.filter(col("user_id") === 7)
    val formatted = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("PushedFilters: [") &&
      formatted.replaceAll("\\s", "").contains("user_id,7"),
      formatted)
  }
}
