package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.logs.LogView

class StorageStatsSpec extends SparkSpec {

  test("storage_stats reports footer-true rows, the bucketed file count, and sane byte ordering") {
    val rep = StorageStats.storageStats(spark, sf).collect()
    assert(rep.nonEmpty)
    // per-date rows must equal the logical rollup cardinality (one
    // row per (date, site) present in the log)
    val expected = LogView(spark, sf)
      .withColumn("date", expr("date(timestamp_micros(timestamp))"))
      .groupBy(col("date").cast("string").as("date"))
      .agg(countDistinct("site").as("n"),
        // the layout hash-splits sites two ways before the
        // partitioned write — files per date = site parities present
        countDistinct(pmod(xxhash64(col("site")), lit(2L))).as("nb"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rep.foreach { r =>
      val date = r.getString(0)
      assert(r.getAs[Long]("n_rows") == expected(date)._1, s"rows @ $date")
      assert(r.getAs[Long]("n_files") == expected(date)._2, s"files @ $date")
      // snappy parquet: compressed strictly accounted, never above raw
      assert(r.getAs[Long]("compressed_bytes") > 0)
      assert(r.getAs[Long]("compressed_bytes") <=
        r.getAs[Long]("uncompressed_bytes"), s"bytes @ $date")
    }
    assert(rep.map(_.getString(0)).toSet == expected.keySet)
  }

  test("report is metadata-only — its plan holds no file scan") {
    // the report half reads listings + footers on the driver and
    // surfaces a LocalRelation: no data page of the layout is ever
    // scanned by a Spark job
    StorageStats.storageStats(spark, sf).collect() // ensure layout exists
    val rep = StorageStats.report(spark, StorageStats.GatePath, "date")
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val leaves = rep.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.nonEmpty && leaves.forall(_.isInstanceOf[LocalRelation]),
      s"expected LocalRelation leaves, got $leaves")
    assert(rep.collect().nonEmpty)
  }
}
