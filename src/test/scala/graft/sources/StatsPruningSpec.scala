package graft.sources

import graft.SparkSpec
import graft.logs.LogView
import org.apache.spark.sql.functions._

class StatsPruningSpec extends SparkSpec {

  private lazy val dir = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_statsprune_test").toString
    StatsPruning.layoutByTime(spark, sf, d, nFiles = 8)
    d
  }

  test("layout yields disjoint per-file time ranges") {
    val m = StatsPruning.manifest(spark, dir)
    assert(m.length == 8)
    val byMin = m.sortBy(_.minTs)
    byMin.sliding(2).foreach { case Array(a, b) =>
      assert(a.maxTs <= b.minTs, s"overlapping files: $a / $b")
    }
  }

  test("pruned read never opens files outside the window, loses no rows") {
    val m = StatsPruning.manifest(spark, dir)
    // a window covering roughly the middle file only
    val mid = m.sortBy(_.minTs).apply(4)
    val (lo, hi) = (mid.minTs + 1, mid.maxTs - 1)
    val live = StatsPruning.liveFiles(m, lo, hi).toSet
    assert(live.size < m.length, "window must exclude some files")
    val pruned = StatsPruning.prunedRead(spark, dir, m, lo, hi)
    // THE assertion: the scan's file list is exactly the manifest
    // selection — out-of-range files are never read
    assert(pruned.inputFiles.toSet == live)
    // completeness: identical rows to the unpruned full-scan filter
    val full = spark.read.parquet(dir)
      .filter(col("timestamp") >= lo && col("timestamp") <= hi)
    assert(pruned.count() == full.count() && full.count() > 0)
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
    // and the exact predicate still pushes into the pruned scan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(timestamp"), plan.take(2000))
  }

  test("manifest() answers from the persisted stats, not a data rescan") {
    // layoutByTime persisted _graft_stats; doctor it (widen one file's
    // max by a known delta) — manifest() must return the doctored
    // value, proving no recount happened; manifestRecomputed() must
    // still return the truth
    val statsDir = new java.io.File(dir, "_graft_stats")
    assert(statsDir.isDirectory, "layout must persist its stats manifest")
    val truth = StatsPruning.manifestRecomputed(spark, dir)
    val doctored = spark.read.parquet(statsDir.toString)
      .withColumn("max_ts", col("max_ts") + lit(777L))
    val tmp = java.nio.file.Files.createTempDirectory("graft_doctored_stats").toString
    doctored.coalesce(1).write.mode("overwrite").parquet(tmp)
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete()
    }
    rmrf(statsDir)
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp), statsDir.toPath)
    try {
      val got = StatsPruning.manifest(spark, dir)
      assert(got.map(_.maxTs).sorted.toSeq ==
        truth.map(_.maxTs + 777L).sorted.toSeq,
        "manifest must come from the persisted rows")
    } finally {
      // restore the true manifest for any later test using `dir`
      import spark.implicits._
      rmrf(statsDir)
      truth.toSeq.toDF("path", "min_ts", "max_ts")
        .coalesce(1).write.mode("overwrite").parquet(statsDir.toString)
    }
  }

  test("a window beyond the data prunes every file") {
    val m = StatsPruning.manifest(spark, dir)
    val maxTs = m.map(_.maxTs).max
    val empty = StatsPruning.prunedRead(spark, dir, m, maxTs + 1, maxTs + 2)
    assert(empty.count() == 0)
    assert(StatsPruning.liveFiles(m, maxTs + 1, maxTs + 2).isEmpty)
    // schema survives for downstream composition
    assert(empty.columns.toSeq == LogView.columns)
  }
}
