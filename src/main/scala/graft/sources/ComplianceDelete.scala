package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Bits per per-file Bloom filter in the key manifest (16 int64
    * words): at 1024 bits / k=2, a file of 10k distinct subjects
    * sits at ~1-in-quadrillion... realistically a file holds more
    * rows than that — the filter saturates gracefully into "always
    * a candidate", which only costs planning IO, never correctness.
    */
  val BloomBits = 1024
  private val BloomWords = BloomBits / 64
  private def bloomDir(keyCol: String) = s"_graft_keybloom_$keyCol"

  /** The two probe positions of a key — k=2 double-hashing with
    * Spark's own xxhash64 (seeded two ways), so the WRITE side (an
    * aggregation over the data) and the PROBE side (folded over a
    * LocalRelation, no job — same discipline as ZOrder.probeBucket)
    * can never disagree.
    */
  private def bloomPositions(key: Column): (Column, Column) =
    (pmod(xxhash64(key), lit(BloomBits)),
      pmod(xxhash64(key, lit(1)), lit(BloomBits)))

  /** Persist the per-file key Bloom manifest (`_graft_keybloom_<col>/`,
    * one row per data file: path + 16 bitmap words) — written at
    * layout time, consulted by [[delete]] so planning an erasure
    * batch reads KBs of metadata instead of scanning the key column
    * of the whole table. ONE aggregation; each row contributes two
    * one-hot words that `bit_or` merges map-side.
    */
  /** The per-file bitmap aggregation behind the manifest. Integer
    * `div` for the word index (Column `/` is DOUBLE division — the
    * accidental float path ZOrder's hour bucket once had).
    */
  private def bloomAgg(df: DataFrame, keyCol: String): DataFrame = {
    val (p1, p2) = bloomPositions(col(keyCol))
    def wordIdx(pos: Column): Column =
      call_function("div", pos.cast("long"), lit(64L))
    def oneHot(pos: Column, w: Int): Column =
      when(wordIdx(pos) === w,
        call_function("shiftleft", lit(1L),
          pmod(pos, lit(64)).cast("int"))).otherwise(0L)
    val wordCols = (0 until BloomWords).map { w =>
      bit_or(oneHot(p1, w).bitwiseOR(oneHot(p2, w))).as(s"w$w")
    }
    df.groupBy(input_file_name().as("path"))
      .agg(wordCols.head, wordCols.tail: _*)
  }

  def bloomManifestWrite(spark: SparkSession, dir: String,
                         keyCol: String): Unit =
    bloomAgg(spark.read.parquet(dir), keyCol)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/${bloomDir(keyCol)}")

  /** Planning via the Bloom manifest: the files that MAY hold any of
    * `keys` (both probe bits set for some key), plus every data file
    * the manifest doesn't know (under-claim-never-over-claim: an
    * unlisted file — e.g. written by a rewrite that crashed before
    * the manifest refresh — is always a candidate, so staleness can
    * cost planning IO but never miss a subject). Returns None when no
    * manifest exists — callers fall back to the full planning scan.
    */
  def bloomCandidateFiles(spark: SparkSession, dir: String, keyCol: String,
                          keys: Seq[Long]): Option[Seq[String]] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val mPath = new Path(root, bloomDir(keyCol))
    if (!fs.exists(mPath)) return None
    val manifest = spark.read.parquet(mPath.toString).collect()
      .map(r => new Path(r.getString(0)).toUri.getPath ->
        (0 until BloomWords).map(w => r.getLong(w + 1)).toArray).toMap
    // probe positions fold driver-side over a LocalRelation — no job
    import spark.implicits._
    val (p1, p2) = bloomPositions(col("k"))
    val positions = keys.toDF("k").select(p1.as("p1"), p2.as("p2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def mayContain(words: Array[Long]): Boolean =
      positions.exists { case (a, b) =>
        ((words(a.toInt / 64) >>> (a % 64)) & 1L) == 1L &&
          ((words(b.toInt / 64) >>> (b % 64)) & 1L) == 1L
      }
    // actual data files on disk (partition dirs only, `_` dirs hidden)
    val live = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .flatMap(d => fs.listStatus(d.getPath).toSeq)
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))
      .map(_.getPath)
    Some(live.collect {
      case p if manifest.get(p.toUri.getPath).forall(mayContain) =>
        p.toString
    })
  }

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
    // plan: which files hold matching rows. With a key Bloom manifest
    // the confirming scan opens only the candidate files (KB metadata
    // probe → candidate set); without one it scans the table — but
    // reads ONLY the key column (column pruning) with the IN-list
    // reaching the parquet reader (PushedFilters), so row-group
    // min/max skip clean data. Either way the collected result is
    // file paths — metadata-sized however big the table.
    val planInput = bloomCandidateFiles(spark, dir, keyCol, keys) match {
      case Some(Nil) => return DeleteStats(Nil, 0L)
      case Some(candidates) => spark.read.parquet(candidates: _*)
      case None => spark.read.parquet(dir)
    }
    // one planning aggregate yields BOTH the affected file set and
    // the exact deleted-row count (every matching row is deleted) —
    // no per-partition recount actions later
    val planned = planInput
      .filter(pred)
      .groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val affectedFiles = planned.map(_._1)
    val deleted = planned.map(_._2).sum
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
    // partitions are independent — rewrite from a bounded pool
    // (measured faster than one union-of-branches staged job, whose
    // per-partition AQE stages serialize on the driver; 8 concurrent
    // jobs overlap planning and I/O). Schema resolved ONCE so the
    // pool does not re-read footers per partition.
    val sch = spark.read.parquet(
      new Path(root, affected.head).toString).schema
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, affected.size))
    try {
      val futures = affected.map { part =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            val live = new Path(root, part)
            val stage = new Path(root, s"$StageRoot/$part")
            // rewrite THIS partition's rows minus matches; reading
            // the partition directory keeps the read set disjoint
            // from the write set (no overwrite-while-reading hazard)
            spark.read.schema(sch).parquet(live.toString)
              .filter(!pred)
              .write.mode("overwrite").parquet(stage.toString)
            PartitionSwap.commit(fs, root, part, StageRoot, TrashRoot)
          }
        })
      }
      futures.foreach { f =>
        try f.get()
        catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
      }
    } finally pool.shutdown()
    fs.delete(new Path(root, StageRoot), true)
    fs.delete(new Path(root, TrashRoot), true)
    // refresh the Bloom manifest rows of the rewritten partitions
    // (KB-sized driver merge; the fresh rows come from a scan of ONLY
    // those partitions). A crash before this write leaves the new
    // files unlisted — [[bloomCandidateFiles]] treats unknown files
    // as always-candidates, so staleness costs planning IO, never a
    // missed subject.
    val mPath = new Path(root, bloomDir(keyCol))
    if (fs.exists(mPath)) {
      val mDir = mPath.toString
      val prefixes = affected.map(p => s"$rootPath/$p/")
      val schema = spark.read.parquet(mDir).schema
      val kept = spark.read.parquet(mDir).collect().toSeq
        .filterNot { r =>
          val p = new Path(r.getString(0)).toUri.getPath
          prefixes.exists(p.startsWith)
        }
      val keptDf = spark.createDataFrame(
        spark.sparkContext.parallelize(kept, 1), schema)
      val fresh = bloomAgg(
        spark.read.parquet(affected.map(p => s"$dir/$p"): _*), keyCol)
      fresh.unionByName(keptDf).coalesce(1)
        .write.mode("overwrite").parquet(mDir)
    }
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
    // the production layout step: persist the key Bloom manifest so
    // the delete plans off metadata (the full-scan fallback stays
    // exercised in ComplianceDeleteSpec)
    bloomManifestWrite(spark, tmp, "user_id")
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
