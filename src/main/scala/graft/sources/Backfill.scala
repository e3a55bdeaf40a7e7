package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Server-to-server backfill — the Spark-native `clone` (reference
  * doc/index.rst:385-400, src/Clone.cxx; `auto_clone`
  * doc/index.rst:54,63). pond's clone streams every record from a
  * peer server into the local database, resumable because each day's
  * per-site file is its own unit of transfer. The engine's mapping:
  * partition-aligned parquet→parquet copy where the DAY PARTITION is
  * the unit of work, driven by a manifest diff.
  *
  *  - [[sourceManifest]]/[[destManifest]]: per-day integrity rows
  *    `(day, n_rows, sum_id)` — the count plus an order-independent
  *    id checksum, cheap enough to compute in one scan (at 100 TB the
  *    source side would come from footer/partition stats, same shape).
  *  - [[diff]]: full outer join of the two manifests → the days that
  *    are missing or mismatched in the destination. Empty diff = the
  *    clone is complete and verified.
  *  - [[backfill]]: copies (up to `maxDays` of) the diff days in ONE
  *    distributed job — dynamic partition overwrite repairs exactly
  *    the stale/missing day directories and never touches completed
  *    ones. Interrupted mid-job, the write stages under Spark's
  *    commit protocol and an uncommitted day simply stays in the next
  *    diff; re-running resumes where the kill left off (tested in
  *    BackfillSpec, including a torn-partition repair).
  *
  * Scale: the copy shuffles once (repartition by day so each day
  * directory is written by the tasks owning that day), the manifest
  * scans are partial-aggregated counts, and the diff join is
  * days-sized (KB) — nothing grows faster than the partition count.
  */
object Backfill {

  /** events with its day partition key (UTC; `ts` is nanos — see
    * [[graft.GraftSession]] nanosAsLong).
    */
  private def withDay(df: DataFrame): DataFrame =
    df.withColumn("day",
      date_format(timestamp_micros(expr("ts div 1000")), "yyyy-MM-dd"))

  private def manifestOf(df: DataFrame): DataFrame =
    df.groupBy("day").agg(
      count(lit(1)).as("n_rows"),
      sum("event_id").as("sum_id"))

  def sourceManifest(spark: SparkSession, srcDir: String): DataFrame =
    manifestOf(withDay(Tables.events(spark, srcDir)))

  /** Empty (zero-day) manifest when the destination doesn't exist (or
    * exists but holds no day partitions) — a fresh clone target.
    */
  def destManifest(spark: SparkSession, destDir: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(destDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val hasDays = fs.exists(path) && fs.listStatus(path).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith("day="))
    if (!hasDays)
      spark.range(0).select( // fresh target: zero-day manifest
        col("id").cast("string").as("day"),
        col("id").as("n_rows"),
        col("id").as("sum_id"))
    else
      spark.read.parquet(destDir)
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
        .groupBy("day").agg(
          count(lit(1)).as("n_rows"),
          sum("event_id").as("sum_id"))
  }

  /** Days missing or mismatched in the destination:
    * `(day, src_rows, dest_rows)` with `dest_rows` NULL for missing
    * days. Empty ⇒ backfill complete and content-verified.
    */
  def diff(spark: SparkSession, srcDir: String, destDir: String): DataFrame = {
    val src = sourceManifest(spark, srcDir)
      .select(col("day"), col("n_rows").as("src_rows"), col("sum_id").as("src_sum"))
    val dst = destManifest(spark, destDir)
      .select(col("day"), col("n_rows").as("dest_rows"), col("sum_id").as("dest_sum"))
    src.join(dst, Seq("day"), "left_outer")
      .filter(col("dest_rows").isNull ||
        col("dest_rows") =!= col("src_rows") ||
        col("dest_sum") =!= col("src_sum"))
      .select("day", "src_rows", "dest_rows")
      .orderBy("day")
  }

  /** Copy up to `maxDays` pending days from the diff into `destDir`
    * (day-partitioned parquet). Returns the number of days submitted.
    * Idempotent: a clean rerun is a no-op returning 0.
    */
  def backfill(spark: SparkSession, srcDir: String, destDir: String,
               maxDays: Int = Int.MaxValue): Int = {
    // the pending-day list is partition metadata (≤ one row per day
    // partition) — driver-side by nature, like any commit manifest
    val pending = diff(spark, srcDir, destDir)
      .select("day").collect().map(_.getString(0)).sorted.take(maxDays)
    if (pending.isEmpty) return 0
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      withDay(Tables.events(spark, srcDir))
        .filter(col("day").isin(pending.toIndexedSeq: _*))
        .repartition(col("day"))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(destDir)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    pending.length
  }

  /** The gate query: clone the events table to a scratch target, then
    * require the manifest diff empty and return the DESTINATION's
    * manifest — copied bytes, not the source, are what the oracle's
    * per-day counts are checked against.
    */
  def cloneBackfill(spark: SparkSession, srcDir: String): DataFrame = {
    val dest = TmpDir.scoped("backfill",
      spark.sparkContext.applicationId, srcDir)
    var rounds = 0
    while (backfill(spark, srcDir, dest) > 0) {
      rounds += 1
      require(rounds <= 3, s"backfill did not converge after $rounds rounds")
    }
    require(diff(spark, srcDir, dest).isEmpty,
      "backfill complete but manifest diff non-empty")
    destManifest(spark, dest)
      .select(col("day"),
        col("n_rows").cast("long").as("n_rows"),
        col("sum_id").cast("long").as("sum_id"))
      .orderBy("day")
  }
}
