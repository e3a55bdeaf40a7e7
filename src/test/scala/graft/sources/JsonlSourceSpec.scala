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
}
