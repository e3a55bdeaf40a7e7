package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Targeted row deletion over a partitioned layout — the
  * right-to-be-forgotten pass (GDPR erasure, takedown requests) every
  * long-lived 100 TB store runs on a schedule. Parquet is immutable,
  * so deletion is copy-on-write: rewrite the partitions that contain
  * matching rows WITHOUT them, byte-identically preserve everything
  * else. pond's answer is ring-buffer expiry (whole-file drop by
  * age, reference doc/index.rst retention); targeted erasure is the
  * obligation that model can't express, and this operator is that
  * step.
  *
  * Discipline:
  *  - **planning is a narrow scan, not a table read**: the affected
  *    file set comes from `input_file_name()` over a scan filtered
  *    by the delete predicate — column-pruned to the key column and
  *    (for an IN-list of subject keys) pushed to the parquet reader,
  *    so row-group stats skip clean files; the result is
  *    metadata-sized (file paths). With a bloom/stats manifest
  *    ([[StatsPruning]]-style) the scan itself becomes prunable —
  *    orthogonal, composable;
  *  - **rewrite only affected partitions**: each one re-written by a
  *    job over only its own rows minus matches, committed by the
  *    [[PartitionSwap]] stage/trash/promote protocol (atomic dir
  *    rename; every crash window recoverable; deletion is idempotent
  *    so re-runs converge). Unaffected partitions are never touched,
  *    byte for byte — asserted in ComplianceDeleteSpec;
  *  - **verifiable**: the gate compares the post-delete table
  *    against the oracle's anti-join — content equality, not just
  *    counts.
  */
object ComplianceDelete {

  private val StageRoot = "_graft_delete_stage"
  private val TrashRoot = "_graft_delete_old"

  /** What a delete run did: partitions rewritten (by partition-dir
    * name) and the number of rows dropped.
    */
  case class DeleteStats(rewritten: Seq[String], rowsDeleted: Long)

  /** Delete every row whose `keyCol` is in `keys` from the
    * partitioned layout at `dir`. Returns which partitions were
    * rewritten and how many rows went.
    */
  def delete(spark: SparkSession, dir: String, keyCol: String,
             keys: Seq[Long]): DeleteStats = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    PartitionSwap.recover(fs, root, StageRoot, TrashRoot)
    if (keys.isEmpty) return DeleteStats(Nil, 0L)
    val pred = col(keyCol).isin(keys: _*)
    // plan: which files hold matching rows. The scan reads ONLY the
    // key column (column pruning) and the IN-list reaches the parquet
    // reader (PushedFilters), so row-group min/max skip clean data;
    // the collected result is file paths — metadata-sized however big
    // the table.
    val affectedFiles = spark.read.parquet(dir)
      .filter(pred)
      .select(input_file_name().as("f"))
      .distinct()
      .collect().map(_.getString(0))
    // affected partitions = the partition directories those files sit
    // in (paths are .../<col>=<value>/part-*.parquet). Compare URI
    // PATH components: input_file_name() renders file:///p while
    // makeQualified renders file:/p — same path, different authority
    // spelling, so string prefix-stripping on the full URI misfires.
    val rootPath = fs.makeQualified(root).toUri.getPath
    val affected = affectedFiles.map { f =>
      val rel = new Path(f).toUri.getPath
        .stripPrefix(rootPath).stripPrefix("/")
      rel.substring(0, rel.lastIndexOf('/'))
    }.distinct.sorted.toSeq
    if (affected.isEmpty) return DeleteStats(Nil, 0L)
    var deleted = 0L
    affected.foreach { part =>
      val live = new Path(root, part)
      val stage = new Path(root, s"$StageRoot/$part")
      // rewrite THIS partition's rows minus matches; reading the
      // partition directory keeps the read set disjoint from the
      // write set (no overwrite-while-reading hazard)
      val before = spark.read.parquet(live.toString)
      val n = before.count()
      val kept = before.filter(!pred)
      kept.write.mode("overwrite").parquet(stage.toString)
      deleted += n - spark.read.parquet(stage.toString).count()
      PartitionSwap.commit(fs, root, part, StageRoot, TrashRoot)
    }
    fs.delete(new Path(root, StageRoot), true)
    fs.delete(new Path(root, TrashRoot), true)
    DeleteStats(affected, deleted)
  }

  /** The gate query: lay events out date-partitioned, erase a
    * deterministic subject set (`user_id % 97 == 3` — the stand-in
    * for a delete-request batch), and return the per-day rollup of
    * what REMAINS — row-level erasure and preservation of everything
    * else is what the oracle's anti-join checks. The partition-
    * surgery properties (untouched days byte-identical, only
    * affected days rewritten, crash recovery) are
    * ComplianceDeleteSpec's assertions — not SQL-visible.
    */
  def deleteRollup(spark: SparkSession, dir: String): DataFrame = {
    val tmp = TmpDir.scoped("compliance",
      spark.sparkContext.applicationId, dir)
    val events = Tables.events(spark, dir)
    events
      .withColumn("date", expr("date(timestamp_micros(ts div 1000))"))
      .repartition(col("date"))
      .write.mode("overwrite").partitionBy("date").parquet(tmp)
    // the delete-request batch: concrete subject ids, as a real
    // erasure request arrives (collected driver-side — a request
    // batch is human-scale, thousands at most)
    val keys = events.select("user_id").distinct()
      .filter(pmod(col("user_id"), lit(97)) === 3)
      .collect().map(_.getLong(0)).sorted.toSeq
    delete(spark, tmp, "user_id", keys)
    spark.read.parquet(tmp)
      .groupBy(col("date").cast("string").as("date"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"),
        sum(col("event_id")).as("sum_id"))
      .orderBy("date")
  }
}
