package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.logs.LogView

/** Small-file compaction over a date-partitioned layout — the
  * operational companion to [[DateLayout]] (OPTIMIZE in lakehouse
  * terms). A live ingest (per-minute micro-batches, [[graft.streaming
  * .Follow]]-style tails, speculative retries) fragments day
  * directories into thousands of KB-sized files; at 100 TB that
  * multiplies list/open costs per query and starves the scan of
  * row-group-sized reads. pond never faces this — its per-day per-site
  * file IS the compaction unit (reference doc/index.rst per-day
  * layout); a parquet lake has to re-establish that property
  * explicitly, and this operator is that step.
  *
  * Discipline:
  *  - listing-only planning: a partition is selected for rewrite iff
  *    its file count exceeds what its BYTE SIZE justifies
  *    (`ceil(bytes / targetBytes)`, min 1) — no data is read to
  *    decide;
  *  - each selected partition is rewritten to exactly that many
  *    files via `repartition(n)` under dynamic partition overwrite —
  *    healthy partitions are never touched (their files, and their
  *    parquet footers' stats, stay byte-identical);
  *  - content is provably preserved: the gate compares per-day
  *    counts/id-checksums of the COMPACTED table against the clean
  *    source, and CompactionSpec asserts the file-count contraction
  *    and the untouched-partition property.
  */
object Compaction {

  private val debug = sys.env.get("GRAFT_SNAP_DEBUG").contains("true")
  @inline private def phase[T](name: String)(f: => T): T =
    if (!debug) f
    else {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"[compact] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

  /** One partition's compaction plan: files present vs files its
    * byte size justifies at `targetBytes`.
    */
  case class PartPlan(partition: String, nFiles: Int, bytes: Long,
                      targetFiles: Int) {
    def fragmented: Boolean = nFiles > targetFiles
  }

  /** Listing-only planning pass over `dir`'s first-level partition
    * directories (`<col>=<value>`).
    */
  def plan(spark: SparkSession, dir: String,
           targetBytes: Long = 128L * 1024 * 1024): Seq[PartPlan] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map { d =>
        val files = fs.listStatus(d.getPath).filter { f =>
          val n = f.getPath.getName
          f.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
        val bytes = files.map(_.getLen).sum
        val target = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
        PartPlan(d.getPath.getName, files.length, bytes, target)
      }
      .sortBy(_.partition)
  }

  private val StageRoot = "_graft_compact_stage"
  private val TrashRoot = "_graft_compact_old"

  /** Crash recovery for [[compact]]'s swap protocol, run before every
    * planning pass — the [[PartitionSwap]] protocol (stage → trash →
    * promote → drop, directory rename as the commit primitive) with
    * compaction's stage/trash names.
    */
  private def recover(fs: FileSystem, root: Path): Unit =
    PartitionSwap.recover(fs, root, StageRoot, TrashRoot)

  /** Rewrite every fragmented partition to its target file count.
    * Returns the plans of the partitions rewritten.
    *
    * Each partition is staged by a distributed job over ONLY its own
    * rows (one day's data never shuffles with another's) and
    * committed by the [[recover]] swap protocol. Healthy partitions
    * are never touched, byte for byte. Partitions are independent, so
    * a deployment would submit these jobs concurrently from a pool;
    * sequential here.
    */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024): Seq[PartPlan] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    recover(fs, root)
    val fragmented = plan(spark, dir, targetBytes).filter(_.fragmented)
    if (fragmented.isEmpty) return Nil
    fs.mkdirs(new Path(root, TrashRoot))
    // partitions are independent, so their (small) rewrite jobs run
    // from a bounded pool — measured FASTER here than one union-of-
    // branches staged job (31 independent AQE shuffle stages serialize
    // on the driver; 8 concurrent jobs overlap I/O and planning).
    // Schema is resolved ONCE and passed to every job, so the pool
    // does not re-read footers per partition. A 3-year backlog is
    // ~1000 partitions; concurrent submission keeps the driver from
    // being the bottleneck. FileSystem is thread-safe; each thread
    // touches only its own partition's paths.
    val sch = spark.read.parquet(
      new Path(root, fragmented.head.partition).toString).schema
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, fragmented.size))
    try {
      val futures = fragmented.map { p =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            val live = new Path(root, p.partition)
            val stage = new Path(root, s"$StageRoot/${p.partition}")
            // reading the partition DIRECTORY yields exactly its data
            // columns (the partition value lives in the path, and goes
            // back into the same path) — and keeps the read set
            // disjoint from the write set, so no
            // overwrite-while-reading hazard
            spark.read.schema(sch).parquet(live.toString)
              .repartition(p.targetFiles)
              .write.mode("overwrite").parquet(stage.toString)
            PartitionSwap.commit(fs, root, p.partition, StageRoot, TrashRoot)
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
    fragmented
  }

  /** The gate query: fragment the log into a date-partitioned layout
    * with deliberately tiny files (the post-ingest state), compact,
    * and return the per-day rollup of the COMPACTED table — row
    * preservation across the rewrite is what the oracle checks
    * against the clean source. The file-count contraction itself is
    * CompactionSpec's assertion (file counts aren't SQL-visible).
    */
  def compactRollup(spark: SparkSession, dir: String): DataFrame = {
    val tmp = TmpDir.scoped("compact",
      spark.sparkContext.applicationId, dir)
    phase("fragment-layout")(fragmentedLayout(spark, dir, tmp))
    phase("compact-total")(compact(spark, tmp, targetBytes = 4L * 1024 * 1024))
    spark.read.parquet(tmp)
      .groupBy(col("date").cast("string").as("date"))
      .agg(count(lit(1)).as("n"), sum("event_id").as("sum_id"))
      .orderBy("date")
  }

  /** A deliberately fragmented date layout: many small files per day
    * (what per-minute micro-batch commits leave behind).
    */
  private[sources] def fragmentedLayout(spark: SparkSession, dir: String,
                                        outDir: String): Unit =
    LogView(spark, dir)
      .withColumn("date", expr("date(timestamp_micros(timestamp))"))
      // round-robin WITHIN each day so every day directory gets many
      // small part files — the anti-pattern compact() repairs
      .repartition(32)
      .write.mode("overwrite").partitionBy("date").parquet(outDir)
}
