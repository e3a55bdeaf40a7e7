package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.logs.LogView

/** File-level min/max statistics pruning — the Spark mapping of
  * pond's per-file time index (the reference keeps one file per day
  * per site and consults the time range before opening a file; see
  * reference doc/index.rst on the per-day layout and
  * src/Filter.cxx's since/until handling).
  *
  * Parquet row-group stats give Spark this pruning WITHIN a file for
  * free once the filter is pushed down; what pond adds is never
  * LISTING-then-opening cold files at all. The same discipline here:
  *
  *  - [[layoutByTime]]: range-partition the log by `timestamp` so
  *    each output file covers a disjoint time slice (what a log sink
  *    naturally produces — time-ordered arrival);
  *  - [[manifest]]: one `(file, min_ts, max_ts)` row per file. Here
  *    it is computed with a grouped min/max aggregate; on a real
  *    deployment the identical rows come from parquet footers or are
  *    persisted by the writer — the shape downstream is the same;
  *  - [[prunedRead]]: files whose `[min,max]` intersects the query
  *    window are the ONLY paths handed to the reader, then the exact
  *    predicate runs on top (and still pushes down into the pruned
  *    scan). Files outside the window are never opened — asserted in
  *    StatsPruningSpec via `inputFiles`.
  *
  * At 100 TB this is the difference between touching one day's files
  * and touching three years' worth: listing cost scales with the
  * manifest (KB), scan cost with the window, not the table.
  */
object StatsPruning {

  /** One file's time-range row in the manifest. */
  case class FileStat(path: String, minTs: Long, maxTs: Long)

  /** Manifest subdirectory under a layout — `_`-prefixed so data
    * readers' hidden-path filters never treat it as data.
    */
  private val StatsDir = "_graft_stats"

  /** Write the log view as `nFiles` range-partitioned parquet files:
    * `repartitionByRange` on timestamp gives disjoint per-file ranges
    * (the property the manifest exploits), `sortWithinPartitions`
    * additionally tightens parquet's own row-group stats. The
    * per-file min/max manifest is PERSISTED at layout time
    * (`_graft_stats/`), so later readers consult a KB-sized parquet
    * instead of re-aggregating the data — at 100 TB the difference
    * between opening every file to plan a query and opening none.
    */
  def layoutByTime(spark: SparkSession, sfDir: String, outDir: String,
                   nFiles: Int = 8): Array[FileStat] = {
    LogView(spark, sfDir)
      .repartitionByRange(nFiles, col("timestamp"))
      .sortWithinPartitions("timestamp")
      .write.mode("overwrite").parquet(outDir)
    // one aggregation pass over the just-written layout (a writer
    // integrated with the sink would emit these rows from its own
    // buffers, or read them back from parquet footers — same rows);
    // returned so the gate's drift check compares the persisted
    // manifest against this recount without a second data pass
    import spark.implicits._
    val recount = manifestRecomputed(spark, outDir)
    recount.toSeq
      .toDF("path", "min_ts", "max_ts")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/$StatsDir")
    recount
  }

  /** Per-file min/max manifest of a layout directory: the persisted
    * `_graft_stats/` rows when present (a KB-sized metadata read —
    * the data files are never opened), recomputed from data only for
    * layouts written before the manifest existed. Collected to the
    * driver like any commit manifest.
    */
  def manifest(spark: SparkSession, dir: String): Array[FileStat] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$StatsDir")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) manifestRecomputed(spark, dir)
    else spark.read.parquet(p.toString).collect()
      .map(r => FileStat(r.getAs[String]("path"),
        r.getAs[Long]("min_ts"), r.getAs[Long]("max_ts")))
      .sortBy(_.path)
  }

  /** The full-scan recount behind [[manifest]] — layout-time input,
    * gate-time verification ([[timeWindow]] requires persisted ==
    * recomputed), and the fallback for pre-manifest layouts.
    */
  def manifestRecomputed(spark: SparkSession, dir: String): Array[FileStat] =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("path"))
      .agg(min("timestamp").as("min_ts"), max("timestamp").as("max_ts"))
      .collect()
      .map(r => FileStat(r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_.path)

  /** Paths whose `[min,max]` intersects `[loUs, hiUs]` (inclusive —
    * filter_since_until semantics).
    */
  def liveFiles(m: Array[FileStat], loUs: Long, hiUs: Long): Array[String] =
    m.filter(f => f.maxTs >= loUs && f.minTs <= hiUs).map(_.path)

  /** Read ONLY the manifest-selected files, with the exact predicate
    * on top (pushed down into the pruned scan).
    */
  def prunedRead(spark: SparkSession, dir: String, m: Array[FileStat],
                 loUs: Long, hiUs: Long): DataFrame = {
    val live = liveFiles(m, loUs, hiUs)
    if (live.isEmpty) // schema-only: list nothing beyond one footer
      spark.read.parquet(dir).filter(lit(false))
    else spark.read.parquet(live.toIndexedSeq: _*)
      .filter(col("timestamp") >= loUs && col("timestamp") <= hiUs)
  }

  /** The gate query: lay out, build the manifest, prune, read — must
    * return exactly what the full-scan time filter returns (the
    * completeness half of pruning; the files-never-opened half is
    * StatsPruningSpec's assertion).
    */
  def timeWindow(spark: SparkSession, sfDir: String,
                 loUs: Long, hiUs: Long): DataFrame = {
    val dir = TmpDir.scoped("statsprune",
      spark.sparkContext.applicationId, sfDir)
    val recount = layoutByTime(spark, sfDir, dir)
    val m = manifest(spark, dir)
    // gate: the persisted manifest must equal the layout's
    // data-derived recount. Deliberately ONE data pass: the recount is
    // itself computed FROM the written data (manifestRecomputed's
    // groupBy over the files), so this require verifies the
    // manifest's write/read round-trip against a data-derived truth —
    // what it no longer does is re-derive that truth a second,
    // independent time. The independent end-to-end check is the HASH
    // GATE itself: prunedRead(manifest) must byte-equal the oracle's
    // full-scan filter, so a manifest that drifted from the data in
    // any row-affecting way still fails the round.
    require(m.toSeq == recount.toSeq,
      "persisted stats manifest drifted from the layout")
    prunedRead(spark, dir, m, loUs, hiUs)
      .orderBy("timestamp", "event_id")
  }
}
