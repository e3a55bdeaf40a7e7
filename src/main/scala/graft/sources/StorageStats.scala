package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.logs.LogView

/** Storage telemetry over a partitioned parquet layout — the
  * reference server's `stats` verb reports its in-memory ring's
  * `memory_usage` next to the record counters (client/Main.cxx:548-551,
  * doc/index.rst "stats"); the lakehouse analogue is the per-partition
  * parquet footprint: files, rows, compressed and uncompressed bytes.
  * This is the table every retention/compaction/cost decision reads
  * first (which days are fat? is compaction due? what does a
  * partition drop free?).
  *
  * Metadata-only by construction: the report comes from the directory
  * LISTING plus each file's FOOTER (row counts and per-column-chunk
  * byte totals are footer fields — written once by the writer, read
  * without touching a single data page). No Spark job scans data;
  * at 100 TB the listing comes from the table manifest and the
  * footer reads fan out, but the report stays partitions-sized.
  *
  * The gate writes the layout to a FIXED path so the DuckDB oracle
  * can aggregate `parquet_metadata()` over the SAME files — the two
  * engines must agree on every byte count because they read the same
  * thrift fields from the same footers, making even the physical
  * size columns hash-gateable (unique among the write-then-read-back
  * gates, which otherwise verify logical content only).
  */
object StorageStats {

  /** Fixed gate location (NOT TmpDir-scoped: the oracle runs in a
    * separate process after the Spark session exits, so the layout
    * must survive the JVM and sit at a path the oracle SQL can name —
    * the dumped oracle string interpolates this val at dump time, so
    * both processes agree). Scoped per-user under java.io.tmpdir so
    * concurrent graft processes of DIFFERENT users can't race the
    * overwrite+append write pair or tamper with a predictable path;
    * same-user concurrency is out of scope (the driver runs one gate
    * at a time).
    */
  val GatePath: String = new java.io.File(
    sys.props.getOrElse("java.io.tmpdir", "/tmp"),
    "graft_storage_stats_gate_" +
      sys.props.getOrElse("user.name", "anon").replaceAll("[^A-Za-z0-9_.-]", "_")
  ).getPath

  /** Lay out a per-(date, site) rollup of the log date-partitioned —
    * two files per date (sites are hash-split two ways before the
    * partitioned write, so the file-count column exercises real
    * multi-file partitions) — then report per partition from listing
    * + footers only.
    */
  def storageStats(spark: SparkSession, dir: String): DataFrame = {
    // materialized once: the two parity writes below each consume this
    // rollup — without the cut, each write job re-runs the full scan +
    // aggregate lineage
    val rollup = graft.operators.Frames.materialize(LogView(spark, dir)
      .withColumn("date", expr("date(timestamp_micros(timestamp))"))
      .groupBy(col("date"), col("site"))
      .agg(count(lit(1)).as("n"), sum("traffic_sent").as("bytes_sent"))
      .withColumn("b", pmod(xxhash64(col("site")), lit(2L))))
    // one write per site-hash parity, each repartitioned on the
    // partition column (one task per date per pass → exactly one file
    // per date per parity PRESENT): a deterministic multi-file layout,
    // unlike a single repartition(date, b) write where two buckets of
    // a date can hash into one task and merge into one file
    Seq(0L, 1L).zipWithIndex.foreach { case (parity, i) =>
      rollup.filter(col("b") === parity).drop("b")
        .repartition(col("date"))
        .write.mode(if (i == 0) "overwrite" else "append")
        .partitionBy("date").parquet(GatePath)
    }
    report(spark, GatePath, "date")
  }

  /** Row count of a parquet file (or one-level directory of files)
    * from FOOTERS alone — the metadata-sized way to size a plan knob
    * (IVF cell counts, shuffle widths) without running a count() job
    * over the data. At 100 TB the number comes from the table
    * manifest; this is its single-node stand-in with the same
    * no-data-scan contract.
    */
  def parquetRowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    val files =
      if (st.isDirectory)
        fs.listStatus(p).filter(f =>
          f.isFile && f.getPath.getName.endsWith(".parquet"))
      else Array(st)
    files.map { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
      try {
        var n = 0L
        r.getFooter.getBlocks.forEach(b => n += b.getRowCount)
        n
      } finally r.close()
    }.sum
  }

  /** The telemetry scan itself: list `partCol=` directories under
    * `root`, read each parquet footer, aggregate per partition.
    * Driver-side here (the listing and footers are KB-sized); the
    * same loop distributes trivially by mapping footer reads over an
    * executor-side file list when partitions number in the millions.
    */
  def report(spark: SparkSession, root: String, partCol: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    val parts = fs.listStatus(rootPath)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(partCol + "="))
      .sortBy(_.getPath.getName)
    val rows = parts.map { p =>
      val files = fs.listStatus(p.getPath)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      var nRows = 0L
      var comp = 0L
      var uncomp = 0L
      files.foreach { f =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
        try {
          r.getFooter.getBlocks.forEach { b =>
            nRows += b.getRowCount
            b.getColumns.forEach { c =>
              comp += c.getTotalSize
              uncomp += c.getTotalUncompressedSize
            }
          }
        } finally r.close()
      }
      (p.getPath.getName.substring(partCol.length + 1),
        files.length.toLong, nRows, comp, uncomp)
    }
    import spark.implicits._
    rows.toSeq
      .toDF(partCol, "n_files", "n_rows", "compressed_bytes",
        "uncompressed_bytes")
      .orderBy(partCol)
  }
}
