package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.logs.LogView

/** Z-order (Morton-curve) file layout — multi-dimensional stats
  * pruning, the second axis [[StatsPruning]]'s time-only layout can't
  * give. pond's layout is per-day AND per-site files (reference
  * doc/index.rst: `.../sitename/2024-01-05.gz`), so a (site, window)
  * query opens only that site's files in that window; a time-sorted
  * parquet lake loses the site axis — every file in the window
  * contains every site, and site predicates prune nothing at the
  * file level.
  *
  * Z-ordering restores it: sort by the bit-interleave of
  * (site bucket, time bucket) and each output file covers a small
  * RECTANGLE in (site, time) space, so per-file min/max on BOTH
  * columns — the same manifest rows parquet footers already hold —
  * prune on both predicates. This is the standard lakehouse
  * technique (Delta/Iceberg `OPTIMIZE ZORDER BY`), re-derived here:
  * the interleave is a pure codegen'd expression, the layout one
  * range-partitioned write, pruning a manifest filter.
  *
  * The curve interleaves `bits` bits of each dimension; buckets
  * beyond 2^bits clamp into the top cell (coarser locality, never
  * wrong — pruning uses the TRUE per-file min/max, not the curve).
  */
object ZOrder {

  /** Bit-interleave two non-negative bucket columns into the Morton
    * code: bit i of `a` lands at 2i, bit i of `b` at 2i+1. One
    * `aggregate` over the bit positions — stays in whole-stage
    * codegen, no UDF.
    */
  def interleave(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, "bits must fit both lanes in int64")
    val cap = (1L << bits) - 1
    val az = least(a.cast("long"), lit(cap))
    val bz = least(b.cast("long"), lit(cap))
    // the shift amount is a lambda variable, so the shifts go through
    // call_function (the Scala shiftleft/shiftrightunsigned helpers
    // only accept literal amounts)
    def bit(v: Column, i: Column): Column =
      call_function("shiftrightunsigned", v, i).bitwiseAND(lit(1L))
    aggregate(
      sequence(lit(0), lit(bits - 1)),
      lit(0L),
      (acc, i) => acc
        + call_function("shiftleft", bit(az, i), lit(2) * i)
        + call_function("shiftleft", bit(bz, i), lit(2) * i + lit(1)))
  }

  /** The two pruning dimensions over the log: a stable site bucket
    * (xxhash64 — works for arbitrary site cardinality; equality
    * predicates prune on the bucket) and the timestamp's hour bucket.
    */
  def siteBucket(site: Column, buckets: Int = 1024): Column =
    pmod(xxhash64(site), lit(buckets.toLong))

  private def hourBucket(ts: Column): Column = ts.cast("long") / 3600000000L

  /** One file's rectangle in (site bucket, time) space. */
  case class FileRect(path: String, minSb: Long, maxSb: Long,
                      minTs: Long, maxTs: Long)

  /** Write the log z-ordered into `nFiles` files. `repartitionByRange`
    * on the Morton code gives each file a contiguous curve segment (≈ a
    * rectangle stack in (site, time) space); the within-partition sort
    * additionally tightens parquet's own row-group stats on both
    * dimensions.
    */
  def layoutZ(spark: SparkSession, sfDir: String, outDir: String,
              nFiles: Int = 16): Unit = {
    val z = interleave(siteBucket(col("site")), hourBucket(col("timestamp")))
    LogView(spark, sfDir)
      .withColumn("zval", z)
      .repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions("zval")
      .drop("zval")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Per-file 2D min/max manifest — the same one-aggregate pass as
    * [[StatsPruning.manifestRecomputed]], over both dimensions (on a
    * deployment these rows come from parquet footers).
    */
  def manifest(spark: SparkSession, dir: String): Array[FileRect] =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("path"))
      .agg(
        min(siteBucket(col("site"))).as("min_sb"),
        max(siteBucket(col("site"))).as("max_sb"),
        min("timestamp").as("min_ts"), max("timestamp").as("max_ts"))
      .collect()
      .map(r => FileRect(r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(_.path)

  /** Files whose rectangle intersects (site bucket `sb`, time window
    * `[loUs, hiUs]`) — the 2D analogue of [[StatsPruning.liveFiles]].
    */
  def liveFiles(m: Array[FileRect], sb: Long,
                loUs: Long, hiUs: Long): Array[String] =
    m.filter(f => f.maxSb >= sb && f.minSb <= sb &&
      f.maxTs >= loUs && f.minTs <= hiUs).map(_.path)

  /** Read ONLY the rectangle-selected files, exact predicates on top
    * (both push into the pruned scan).
    */
  def prunedRead(spark: SparkSession, dir: String, m: Array[FileRect],
                 site: String, loUs: Long, hiUs: Long): DataFrame = {
    val sb = {
      // the driver-side twin of siteBucket, for probe-time planning
      val row = spark.range(1)
        .select(siteBucket(lit(site)).as("sb")).head()
      row.getLong(0)
    }
    val live = liveFiles(m, sb, loUs, hiUs)
    if (live.isEmpty) spark.read.parquet(dir).filter(lit(false))
    else spark.read.parquet(live.toIndexedSeq: _*)
      .filter(col("site") === site &&
        col("timestamp") >= loUs && col("timestamp") <= hiUs)
  }

  /** The gate query: z-order the log, prune on BOTH dimensions, read —
    * must return exactly the full-scan (site AND window) filter. The
    * fewer-files-than-time-only-layout half is ZOrderSpec's assertion.
    */
  def siteWindow(spark: SparkSession, sfDir: String, site: String,
                 loUs: Long, hiUs: Long): DataFrame = {
    val dir = TmpDir.scoped("zorder",
      spark.sparkContext.applicationId, sfDir)
    layoutZ(spark, sfDir, dir)
    prunedRead(spark, dir, manifest(spark, dir), site, loUs, hiUs)
      .orderBy("timestamp", "event_id")
  }
}
