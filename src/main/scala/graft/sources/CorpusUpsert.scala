package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** MERGE-INTO-style upsert over a partitioned corpus layout — the
  * mutation primitive between append-only ingestion
  * ([[DateLayout]]/[[Backfill]]) and full erasure
  * ([[ComplianceDelete]]): a batch of keyed rows lands, rows whose
  * key already exists are REPLACED (matched rows leave their old
  * partition even when the new version moved partitions), unmatched
  * rows are inserts. This is what a corpus-correction feed (re-crawl,
  * re-annotation, metadata fix) needs from the storage layer.
  *
  * 100 TB shape, same discipline as [[ComplianceDelete.delete]]:
  *
  *  - PLAN, don't sweep: the affected partition set = partitions
  *    holding old versions (one semi-join plan scan against the
  *    broadcast batch keys, collecting file paths — metadata-sized)
  *    ∪ partitions the batch rows land in (from the batch itself).
  *    Untouched partitions are never opened, never rewritten.
  *  - Copy-on-write per partition from a bounded pool; each rewrite
  *    is (live rows minus batch keys) ∪ (batch rows of this
  *    partition) — idempotent, so any crash window replays.
  *  - Commit via the shared [[PartitionSwap]] stage/trash/promote
  *    protocol (atomic dir rename, all crash windows recoverable).
  *    A batch inserting into a partition that does not exist yet
  *    promotes its staged dir directly — the same crash-recovery
  *    window as PartitionSwap's (2)→(3) gap, already handled by
  *    [[PartitionSwap.recover]].
  */
object CorpusUpsert {

  private val StageRoot = "_graft_upsert_stage"
  private val TrashRoot = "_graft_upsert_trash"

  case class UpsertStats(partitions: Seq[String], replaced: Long,
                         inserted: Long)

  /** Apply `batch` (which must carry `keyCol` and `partCol`) to the
    * `partCol`-partitioned table at `dir`. Batch keys are assumed
    * unique (a MERGE batch is deduped upstream; enforced here with a
    * cheap require on the driver-side count).
    */
  def upsert(spark: SparkSession, dir: String, batch: DataFrame,
             keyCol: String, partCol: String): UpsertStats = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    PartitionSwap.recover(fs, root, StageRoot, TrashRoot)
    val b = batch.cache()
    // one aggregate answers both the batch size and the duplicate
    // guard (two separate count jobs before); the distinct count is
    // NULL-inclusive (count_distinct ignores the null group, which
    // would misreport a single-NULL-key batch as "duplicates") —
    // same semantics as the keys.distinct().count() it replaced
    val agg = b.agg(count(lit(1)), count_distinct(col(keyCol)) +
      max(when(col(keyCol).isNull, 1L).otherwise(0L))).head()
    val nBatch = agg.getLong(0)
    val keys = b.select(keyCol)
    require(nBatch == 0 || agg.getLong(1) == nBatch,
      s"upsert batch carries duplicate $keyCol values")
    if (nBatch == 0) return UpsertStats(Nil, 0L, 0L)

    // plan scan: files (→ partitions) holding OLD versions of batch
    // keys. Key-column-pruned read, broadcast semi-join; the result
    // is file paths + match counts — metadata-sized at any table size.
    val planned = spark.read.parquet(dir)
      // bind input_file_name() to the scan BEFORE the join (the
      // expression is single-source)
      .withColumn("f", input_file_name())
      .join(broadcast(keys), Seq(keyCol), "left_semi")
      .groupBy("f")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val replaced = planned.map(_._2).sum
    val rootPath = fs.makeQualified(root).toUri.getPath
    val oldParts = planned.map { case (f, _) =>
      val rel = new Path(f).toUri.getPath
        .stripPrefix(rootPath).stripPrefix("/")
      rel.substring(0, rel.lastIndexOf('/'))
    }.distinct
    // partitions the batch lands in — from the batch rows themselves.
    // Values are escaped with Spark's own partition-path escaping so
    // the names agree with oldParts (parsed from actual file paths,
    // which Spark wrote escaped): a partCol value holding ' ', '%',
    // ':' or '/' must map to the same directory on both sides.
    val newParts = b.select(col(partCol).cast("string")).distinct()
      .collect().map(r => s"$partCol=${escapePart(r.getString(0))}")
    val affected = (oldParts ++ newParts).distinct.sorted.toSeq

    // ONE staged write job covering every affected partition: kept
    // rows (existing partitions minus batch keys — a single anti-join
    // over the union of per-partition scans) plus the incoming batch,
    // routed to its destination dir via a broadcast (value -> dir)
    // map. Then the per-partition swap protocol; partitions that do
    // not exist yet promote directly. One cluster job however many
    // partitions the batch touches (the previous shape submitted one
    // job per partition from a driver pool).
    try {
      val existing = affected.filter(part => fs.exists(new Path(root, part)))
      val sch = existing.headOption.map(part =>
        spark.read.parquet(new Path(root, part).toString).schema)
      val keep = existing.map { part =>
        spark.read.schema(sch.get)
          .parquet(new Path(root, part).toString)
          .withColumn(PartitionSwap.BulkTag, lit(part))
      }.reduceOption(_ unionByName _)
        .map(_.join(broadcast(keys), Seq(keyCol), "left_anti"))
      import spark.implicits._
      val routes = affected
        .map(part => unescapePart(part.substring(part.indexOf('=') + 1)) -> part)
      val routesDf = routes.toDF("__pv", PartitionSwap.BulkTag)
      val incoming = b.join(broadcast(routesDf),
        b(partCol).cast("string") === col("__pv"))
        .drop("__pv").drop(partCol)
      // destination clustering: without it every input task holding
      // rows of k partitions writes k files — the same
      // O(tasks × partitions) small-file tax the SnapshotOps mutation
      // core kills with hint("rebalance", StageTag); AQE coalesces
      // small destinations locally and splits skewed ones at advisory
      // size on a cluster
      val staged = keep.map(_.unionByName(incoming)).getOrElse(incoming)
        .hint("rebalance", PartitionSwap.BulkTag)
      PartitionSwap.stageAllAndSwap(fs, root, affected, staged,
        StageRoot, TrashRoot)
    } finally b.unpersist()
    UpsertStats(affected, replaced, nBatch - replaced)
  }

  /** Spark's own partition-path escaping (the encoding
    * `partitionBy` writes and `input_file_name()` reports), so
    * directory names built from batch values agree byte-for-byte
    * with names parsed from scanned file paths.
    */
  private def escapePart(v: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .escapePathName(v)

  private def unescapePart(v: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .unescapePathName(v)

  /** The gate query: lay events out date-partitioned, apply a
    * deterministic correction batch (re-typed rows for
    * `user_id % 89 = 5`, brand-new rows derived from
    * `user_id % 89 = 7` with offset ids), and roll up the final
    * state per day. The oracle rebuilds the same final state
    * relationally (anti-join + union); the partition-surgery
    * properties (untouched days byte-identical, insert-only new
    * partitions, idempotent replay) are CorpusUpsertSpec's.
    */
  def upsertRollup(spark: SparkSession, dir: String): DataFrame = {
    val tmp = TmpDir.scoped("upsert",
      spark.sparkContext.applicationId, dir)
    val events = Tables.events(spark, dir)
      .withColumn("date", expr("date(timestamp_micros(ts div 1000))"))
    events.repartition(col("date"))
      .write.mode("overwrite").partitionBy("date").parquet(tmp)
    // the batch targets the first week of each month: a real
    // correction feed touches a bounded partition subset, and ONLY a
    // partial batch exercises the untouched-partitions-stay-put
    // property through the gate (an all-partition batch would pass
    // even if the planner swept the whole table)
    val inWindow = dayofmonth(col("date")) <= 7
    val updates = events
      .filter(pmod(col("user_id"), lit(89)) === 5 && inWindow)
      .withColumn("event_type", lit("corrected"))
    val inserts = events
      .filter(pmod(col("user_id"), lit(89)) === 7 && inWindow)
      .withColumn("event_id", col("event_id") + lit(1000000000L))
      .withColumn("event_type", lit("inserted"))
    upsert(spark, tmp, updates.unionByName(inserts), "event_id", "date")
    spark.read.parquet(tmp)
      .groupBy(col("date").cast("string").as("date"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "corrected", 1L).otherwise(0L)).as("n_corrected"),
        sum(when(col("event_type") === "inserted", 1L).otherwise(0L)).as("n_inserted"),
        sum("event_id").as("sum_id"))
      .orderBy("date")
  }
}
