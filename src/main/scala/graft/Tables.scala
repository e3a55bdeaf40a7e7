package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * At 100 TB these would be partitioned-parquet table roots (e.g.
  * `.../events/date=2024-01-01/` with part files below); reading a
  * directory keeps the same code path, so everything downstream is
  * written against a plain DataFrame.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Fact-sized tables whose per-row compute deserves full parallelism.
    * Everything else (including customer/orders, which mostly play the
    * broadcast-dim role here) stays un-spread — repartitioning a table
    * that is about to be broadcast just inserts a wasted shuffle.
    */
  private val factTables: Set[String] =
    Set("events", "lineitem", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = normalize(spark.read.parquet(s"$sfDir/$name.parquet"))
    if (factTables(name)) spread(spark, df, Some(s"$sfDir/$name")) else df
  }

  /** Engine-internal column contract for `events.ts`: BIGINT
    * epoch-nanoseconds. The testdata has shipped it two ways —
    * TIMESTAMP(NANOS) (surfaced as BIGINT nanos via `nanosAsLong`,
    * see [[GraftSession]]) and TIMESTAMP(MICROS) (surfaced as
    * TIMESTAMP_NTZ). Normalise the latter here so every consumer
    * keeps the one representation; with the session timezone pinned
    * to UTC the NTZ→LTZ cast is value-preserving, so both layouts
    * yield identical nanos. (The DuckDB oracle side needs no shim:
    * `epoch_us(ts)` truncates TIMESTAMP_NS and reads TIMESTAMP_US
    * exactly, same values either way.)
    */
  private[graft] def normalize(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts") match {
      case Some(f) if f.dataType != org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.unix_micros(
            org.apache.spark.sql.functions.col("ts").cast("timestamp")) * 1000L)
      case _ => df
    }

  /** The same table as a file-stream source (schema from the batch
    * loader — stream sources must never infer). Handles both testdata
    * layouts: a single FILE `<name>.parquet` (glob-filtered out of the
    * sf directory, so sibling tables don't leak into the stream) and a
    * DIRECTORY `<name>.parquet/part-*.parquet` (any real table; the
    * path itself is the source root).
    */
  def stream(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // schema must be the RAW file schema (the ts shim is a projection,
    // not a storage layout) — normalize() is applied to the stream
    // DataFrame afterwards, same as the batch path.
    val schema = spark.read.parquet(s"$sfDir/$name.parquet").schema
    val path = new org.apache.hadoop.fs.Path(s"$sfDir/$name.parquet")
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val reader = spark.readStream.schema(schema)
    normalize(
      if (fs.getFileStatus(path).isDirectory)
        reader.parquet(path.toString)
      else
        reader.option("pathGlobFilter", s"$name.parquet").parquet(sfDir))
  }

  /** The testdata ships one single-row-group file per table, which
    * Spark cannot split — every downstream operator would run on ONE
    * partition. Repartition up to the core count when (and only when)
    * the scan yields fewer splits than cores. On a real deployment the
    * table is thousands of files, the guard is false, and this is a
    * no-op — no extra shuffle at scale. (`repartition(n)` with an
    * explicit count is exempt from AQE coalescing, so the parallelism
    * actually sticks.)
    */
  def spread(spark: SparkSession, df: DataFrame): DataFrame =
    spread(spark, df, cacheKey = None)

  /** The under-parallel check costs a full physical-planning pass
    * (`df.rdd`), and [[load]] runs it on EVERY fact-table reference of
    * every query invocation — pure repeated driver work for an answer
    * that only changes when the table or core count does. Memoized
    * per (session, table path).
    */
  private val spreadNeeded =
    scala.collection.concurrent.TrieMap.empty[(String, String), Boolean]

  private def spread(spark: SparkSession, df: DataFrame,
                     cacheKey: Option[String]): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    def check = df.rdd.getNumPartitions < target
    val need = cacheKey match {
      case Some(k) =>
        Memo.once(spreadNeeded,
          (spark.sparkContext.applicationId, k), check)
      case None => check
    }
    if (need) df.repartition(target) else df
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
