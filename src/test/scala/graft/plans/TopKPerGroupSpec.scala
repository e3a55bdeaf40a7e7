package graft.plans

import graft.{SparkSpec, Tables}
import graft.logs.{LogView, Shaping}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerGroupSpec extends SparkSpec {

  test("row_number filter pattern plans as TopKPerGroupExec") {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val df = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroup"), p)
    assert(!p.contains("Window "), p) // the WindowExec sort is gone
  }

  test("TopK result equals the sort-based reference, rn included") {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val got = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("user_id", "event_id", "rn")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    // reference computed driver-side
    val want = Tables.events(spark, sf)
      .select("user_id", "event_id", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .toSeq
      .flatMap { case (uid, rows) =>
        rows.sortBy(r => (r._3, r._2)).take(3).zipWithIndex
          .map { case (r, i) => (uid, r._2, i + 1) }
      }.toSet
    assert(got == want)
  }

  test("rate_limit and ann ranking hit the TopK operator automatically") {
    val rl = Shaping.rateLimit(LogView(spark, sf), n = 2, bucketUs = 3600000000L)
    rl.collect()
    assert(rl.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    val ann = graft.pipeline.Ann.bruteTopK(spark, sf, nQueries = 2, k = 5)
    ann.collect()
    assert(ann.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
  }

  test("partial-phase emit-and-evict: more groups than MaxPartialGroups " +
       "in one input partition still yields the exact top-k") {
    import spark.implicits._
    // one input partition carrying ~1.5x the cap in distinct groups,
    // 3 rows each, unordered - the partial map MUST evict; the final
    // phase must still reduce to the exact per-group minimum pair
    val nGroups = TopKPerGroupExec.MaxPartialGroups * 3 / 2
    val rows = (0 until nGroups).flatMap { g =>
      Seq((g.toLong, (g % 7).toLong + 10L), (g.toLong, (g % 5).toLong),
        (g.toLong, (g % 3).toLong + 100L))
    }
    val df = rows.toDF("g", "v").repartition(1)
    val w = Window.partitionBy("g").orderBy(col("v"))
    val got = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    got.collect()
    assert(got.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    val vals = got.select("g", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(vals.size == nGroups)
    (0 until nGroups).foreach { g =>
      assert(vals(g.toLong) == (g % 5).toLong, s"group $g")
    }
  }

  test("rn = 1 (argmax-per-group) also matches") {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc)
    val df = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    assert(df.count() ==
      Tables.events(spark, sf).select("user_id").distinct().count())
  }
}
