package graft.logs

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class LogViewSpec extends SparkSpec {

  test("LogView exposes the pond record schema") {
    val df = LogView(spark, sf)
    assert(df.columns.toSeq == LogView.columns)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("timestamp") == LongType) // epoch µs, pond resolution
    assert(types("status") == IntegerType)
    assert(types("duration_us") == LongType)
    assert(types("site") == StringType)
  }

  test("timestamps are epoch microseconds within the testdata range") {
    val r = LogView(spark, sf)
      .agg(min("timestamp"), max("timestamp")).head()
    val lo = r.getLong(0)
    val hi = r.getLong(1)
    // 2024-01-01 .. 2024-02-01 in µs
    assert(lo >= 1704067200000000L && hi < 1706745600000000L)
  }

  test("derivation is deterministic") {
    val a = LogView(spark, sf).orderBy("event_id").limit(5).collect()
    val b = LogView(spark, sf).orderBy("event_id").limit(5).collect()
    assert(a.sameElements(b))
  }
}
