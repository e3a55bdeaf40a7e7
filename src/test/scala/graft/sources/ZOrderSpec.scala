package graft.sources

import graft.SparkSpec
import graft.logs.LogView
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  private val lo = 1704844800000000L // 2024-01-10
  private val hi = 1705708800000000L // 2024-01-20

  test("morton interleave: bit i of a at 2i, bit i of b at 2i+1, clamped") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
      (0x1fffffL, 0x1fffffL), (1L << 40, 2L)) // beyond 21 bits clamps
      .toDF("a", "b")
      .select(ZOrder.interleave(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    def ref(a: Long, b: Long): Long = {
      val cap = (1L << 21) - 1
      val (x, y) = (math.min(a, cap), math.min(b, cap))
      (0 until 21).foldLeft(0L)((acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
    }
    val want = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
      (0x1fffffL, 0x1fffffL), (1L << 40, 2L)).map((ref _).tupled)
    assert(rows.toSeq == want, s"${rows.toSeq} vs $want")
  }

  test("z-order prunes on BOTH site and time; time-only layout can't") {
    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val tDir = java.nio.file.Files.createTempDirectory("graft_torder").toString
    ZOrder.layoutZ(spark, sf01, zDir, nFiles = 16)
    StatsPruning.layoutByTime(spark, sf01, tDir, nFiles = 16)
    val m = ZOrder.manifest(spark, zDir)
    assert(m.length == 16)
    val pruned = ZOrder.prunedRead(spark, zDir, m, "site_3", lo, hi)
    // completeness: exactly the full-scan two-predicate filter
    val full = LogView(spark, sf01)
      .filter(col("site") === "site_3" &&
        col("timestamp") >= lo && col("timestamp") <= hi)
    assert(pruned.count() == full.count() && full.count() > 0)
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
    // the point: the z layout opens fewer files for the 2D predicate
    // than the time-sorted layout (where every in-window file holds
    // every site, so only the time axis prunes)
    val tm = StatsPruning.manifest(spark, tDir)
    val tFiles = StatsPruning.liveFiles(tm, lo, hi).length
    val zFiles = pruned.inputFiles.length
    assert(zFiles < tFiles,
      s"z-order must beat time-only pruning: z=$zFiles time=$tFiles")
    // and never opens a file whose rectangle misses the probe
    val liveSet = ZOrder.liveFiles(m,
      ZOrder.probeBucket(spark, "site_3"), lo, hi).toSet
    assert(pruned.inputFiles.toSet == liveSet)
  }

  test("probeBucket matches the column expression and submits no job") {
    // value equality with the cluster-side expression, per site
    val sites = (0 until 8).map(i => s"site_$i")
    import spark.implicits._
    val clusterSide = sites.toDF("s").repartition(2)
      .select(col("s"), ZOrder.siteBucket(col("s")).as("sb"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // count jobs across the probe computations: hashing one literal is
    // driver-side planning work, not a cluster round-trip
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val probed = sites.map(s => s -> ZOrder.probeBucket(spark, s)).toMap
      // listener delivery is async; give the bus a beat to drain
      Thread.sleep(500)
      assert(probed == clusterSide)
      assert(jobs.get() == 0, s"probeBucket submitted ${jobs.get()} jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("persisted 2D manifest answers probes without opening data files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zman").toString
    ZOrder.layoutZ(spark, sf01, dir, nFiles = 8)
    val persisted = ZOrder.manifest(spark, dir)
    assert(persisted.toSeq == ZOrder.manifestRecomputed(spark, dir).toSeq)
    // move every data file away: only the _graft_stats2d metadata
    // remains, so a successful manifest() read PROVES the probe path
    // never scans the table
    val root = new java.io.File(dir)
    val moved = root.listFiles().filter(f =>
      f.isFile && f.getName.endsWith(".parquet"))
    assert(moved.nonEmpty)
    moved.foreach(f => assert(f.renameTo(
      new java.io.File(f.getParentFile, f.getName + ".bak"))))
    assert(ZOrder.manifest(spark, dir).toSeq == persisted.toSeq)
  }
}
