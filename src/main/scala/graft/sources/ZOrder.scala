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

  /** Driver-side twin of [[siteBucket]] for probe-time planning: the
    * SAME Column definition, evaluated over a one-row LocalRelation.
    * `ConvertToLocalRelation` folds the deterministic projection at
    * optimization time and `LocalTableScanExec` answers `head()`
    * without submitting a job — a probe must not pay a cluster
    * round-trip to hash one string (no-job asserted via listener in
    * ZOrderSpec, value equality with the column expression too).
    */
  def probeBucket(spark: SparkSession, site: String,
                  buckets: Int = 1024): Long = {
    import spark.implicits._
    Seq(site).toDF("s")
      .select(siteBucket(col("s"), buckets).as("sb"))
      .head().getLong(0)
  }

  // integer division (`div`, IntegralDivide): Column `/` is DOUBLE
  // division in Spark, whose rounding near an hour boundary could
  // shift a bucket by one (harmless for pruning correctness — that
  // uses true per-file min/max — but an accidental float path where
  // integers were intended)
  private def hourBucket(ts: Column): Column =
    call_function("div", ts.cast("long"), lit(3600000000L))

  /** One file's rectangle in (site bucket, time) space. */
  case class FileRect(path: String, minSb: Long, maxSb: Long,
                      minTs: Long, maxTs: Long)

  /** Manifest subdirectory under a z layout — `_`-prefixed so data
    * readers' hidden-path filters never treat it as data (same
    * discipline as [[StatsPruning]]'s `_graft_stats`).
    */
  private val StatsDir = "_graft_stats2d"

  /** Write the log z-ordered into `nFiles` files. `repartitionByRange`
    * on the Morton code gives each file a contiguous curve segment (≈ a
    * rectangle stack in (site, time) space); the within-partition sort
    * additionally tightens parquet's own row-group stats on both
    * dimensions. The per-file 2D min/max manifest is PERSISTED at
    * layout time (`_graft_stats2d/`): recomputing it per probe would
    * re-scan the table — at 100 TB the very cost the manifest exists
    * to avoid.
    */
  def layoutZ(spark: SparkSession, sfDir: String, outDir: String,
              nFiles: Int = 16): Array[FileRect] = {
    val z = interleave(siteBucket(col("site")), hourBucket(col("timestamp")))
    LogView(spark, sfDir)
      .withColumn("zval", z)
      .repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions("zval")
      .drop("zval")
      .write.mode("overwrite").parquet(outDir)
    // one aggregation pass over the just-written layout (a writer
    // integrated with the sink would fold these rows from its own
    // buffers, or read them back from parquet footers — same rows);
    // returned so the gate's drift check can compare the PERSISTED
    // manifest against this recount without a second data pass
    import spark.implicits._
    val recount = manifestRecomputed(spark, outDir)
    recount.toSeq
      .toDF("path", "min_sb", "max_sb", "min_ts", "max_ts")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/$StatsDir")
    recount
  }

  /** Per-file 2D min/max manifest of a z layout: the persisted
    * `_graft_stats2d/` rows when present (a KB-sized metadata read —
    * data files never opened, asserted in ZOrderSpec), recomputed from
    * data only for layouts written before the manifest existed.
    */
  def manifest(spark: SparkSession, dir: String): Array[FileRect] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$StatsDir")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) manifestRecomputed(spark, dir)
    else spark.read.parquet(p.toString).collect()
      .map(r => FileRect(r.getAs[String]("path"),
        r.getAs[Long]("min_sb"), r.getAs[Long]("max_sb"),
        r.getAs[Long]("min_ts"), r.getAs[Long]("max_ts")))
      .sortBy(_.path)
  }

  /** The full-scan recount behind [[manifest]] — layout-time input,
    * gate-time verification ([[siteWindow]] requires persisted ==
    * recomputed), and the fallback for pre-manifest layouts. Same
    * one-aggregate pass as [[StatsPruning.manifestRecomputed]], over
    * both dimensions.
    */
  def manifestRecomputed(spark: SparkSession, dir: String): Array[FileRect] =
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
    val live = liveFiles(m, probeBucket(spark, site), loUs, hiUs)
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
    val recount = layoutZ(spark, sfDir, dir)
    val m = manifest(spark, dir)
    // gate: the persisted manifest must equal the layout's
    // data-derived recount. Deliberately ONE data pass: the recount is
    // computed FROM the written data (layoutZ's own aggregation), so
    // this require verifies the manifest's write/read round-trip
    // against a data-derived truth — not a second, independent
    // re-derivation. The independent end-to-end check is the HASH
    // GATE: prunedRead(manifest) must byte-equal the oracle's
    // full-scan filter, so any row-affecting manifest drift still
    // fails the round.
    require(m.toSeq == recount.toSeq,
      "persisted z-order manifest drifted from the layout")
    prunedRead(spark, dir, m, site, loUs, hiUs)
      .orderBy("timestamp", "event_id")
  }
}
