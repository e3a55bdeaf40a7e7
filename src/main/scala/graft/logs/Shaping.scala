package graft.logs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query-shaping operators — pond's selection/presentation verbs over
  * a log DataFrame (any DataFrame with [[LogView.columns]]).
  *
  * Every function returns a lazily-planned DataFrame; nothing
  * collects to the driver. Scale notes inline per operator.
  */
object Shaping {

  /** Deterministic total order for log output: pond emits records in
    * time order; `event_id` breaks µs ties.
    */
  val timeOrder: Seq[Column] = Seq(col("timestamp"), col("event_id"))

  /** WINDOW max@skip (reference src/Protocol.hxx `PondWindowPayload`):
    * skip `skip` records, then emit at most `max`, in time order.
    *
    * Spark plans `offset+limit` over a sort as a single
    * TakeOrderedAndProject-style bounded collect of `skip+max` rows —
    * no full global sort materialisation. Pond itself streams a
    * bounded window, so the driver-bounded size (`skip+max` rows) is
    * the reference's own contract.
    */
  def window(df: DataFrame, max: Int, skip: Int = 0): DataFrame =
    df.orderBy(timeOrder: _*).offset(skip).limit(max)

  /** LAST (reference src/Protocol.hxx / doc `--last`): only the most
    * recent matching record.
    */
  def last(df: DataFrame): DataFrame =
    df.orderBy(col("timestamp").desc, col("event_id").desc).limit(1)

  /** GROUP_SITE max@skip (reference src/Protocol.hxx
    * `PondGroupSitePayload`): records of the first `max` sites after
    * skipping `skip` sites. Pond iterates its per-site hash table;
    * here site order is lexicographic (deterministic across engines).
    *
    * Scale shape (SURVEY §4): the site list is aggregated FIRST
    * (shuffle on site of pre-aggregated partial counts — tiny), then
    * broadcast back as a semi-join; never a window over the full data.
    */
  def groupSite(df: DataFrame, max: Int, skip: Int = 0): DataFrame = {
    val sites = df.select("site").distinct()
      .orderBy("site").offset(skip).limit(max)
    df.join(broadcast(sites), Seq("site"), "left_semi")
      .orderBy(col("site") +: timeOrder: _*)
  }

  /** `--accumulate=FIELD,top,N` (reference client/ResultWriter.cxx:401
    * `PrintAccumulateTop`): per-value request counts, top N by count.
    * Ties broken by value (the reference's heap order on equal counts
    * is unspecified; lexicographic is the deterministic choice).
    *
    * Plan shape: partial count map-side, then `orderBy.limit` →
    * TakeOrderedAndProject (no global sort) — safe at any cardinality.
    */
  def accumulateTop(df: DataFrame, field: String, n: Int): DataFrame =
    df.filter(col(field).isNotNull)
      .groupBy(col(field).as("value")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("value"))
      .limit(n)

  /** Top pages report: URI normalised to its page (query string and
    * fragment stripped), top `n` by hit count with bytes served — the
    * first report anyone runs over an access log. Normalisation is a
    * codegen'd regexp on the scan; the top-N is
    * TakeOrderedAndProject over the aggregated (page) grain, never a
    * global sort of the log.
    */
  def topPages(df: DataFrame, n: Int = 10): DataFrame =
    df.filter(col("uri").isNotNull)
      // DOTALL, unanchored: Java's `$` matches before a trailing
      // newline while RE2's does not — `(?s).*` strips to end-of-text
      // identically in both engines even for URIs with embedded
      // newlines
      .withColumn("page", regexp_replace(col("uri"), "(?s)[?#].*", ""))
      .groupBy("page")
      .agg(count(lit(1)).as("n_hits"), sum("traffic_sent").as("bytes_sent"))
      .orderBy(col("n_hits").desc, col("page"))
      .limit(n)

  /** Log-scale latency histogram: per-site request counts in
    * power-of-two duration buckets (0–1 µs, 1–2, 2–4, …) — the
    * HDR-histogram shape every latency dashboard draws, mergeable
    * across shards because buckets are fixed. `floor(log2(d))` is
    * computed EXACTLY as `length(bin(d)) − 1` (binary digits minus
    * one) — no float log whose rounding could differ between engines
    * at bucket boundaries. One map + one partial-aggregated shuffle
    * on (site, bucket).
    */
  def durationHistogram(df: DataFrame): DataFrame =
    // non-negative guard: bin() renders a negative long as 64
    // two's-complement digits while the oracle's {:b} renders a sign —
    // a malformed negative duration must be excluded, not disagree
    df.filter(col("duration_us") >= 0)
      .select(col("site"),
        (length(expr("bin(duration_us)")) - 1).cast("long").as("bucket"))
      .groupBy("site", "bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy("site", "bucket")

  /** `--accumulate=FIELD,more,N` (reference client/ResultWriter.cxx:432
    * `PrintAccumulateMore`): values with count >= N.
    */
  def accumulateMore(df: DataFrame, field: String, atLeast: Long): DataFrame =
    df.filter(col(field).isNotNull)
      .groupBy(col(field).as("value")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= atLeast)
      .orderBy(col("value"))

  /** STATS (reference src/Protocol.hxx `PondStatsPayload`): dataset
    * counters. Pond reports server-side record/byte/discard counters;
    * the data-derived equivalents are row count, traffic sums and the
    * covered time range. One-row result, fully map-side partial-agg.
    */
  def stats(df: DataFrame): DataFrame =
    df.agg(
      count(lit(1)).as("record_count"),
      sum("traffic_sent").as("bytes_sent"),
      sum("traffic_received").as("bytes_received"),
      min("timestamp").as("first_us"),
      max("timestamp").as("last_us"))

  /** `--per-site=DIR` manifest (reference client/PerSitePath.hxx): the
    * per-site fan-out as a deterministic manifest (site → row count).
    * The actual writer is [[perSiteWrite]]; the manifest is what the
    * oracle can check.
    */
  def perSiteManifest(df: DataFrame): DataFrame =
    df.groupBy("site").agg(count(lit(1)).as("n_rows")).orderBy("site")

  /** The `--per-site-nested` path split (reference
    * client/PerSitePath.cxx `NestedSiteName::Set`): a site name of
    * length ≥ 7 (and < 64) is split into
    * `prefix/ab/cd/ef` — the last six characters become three 2-char
    * levels — so a million-site directory never puts a million entries
    * in one directory. Shorter (or over-long) names stay flat, exactly
    * like the reference's fallback.
    */
  def nestedSitePath(site: Column): Column = {
    val len = length(site)
    when(len >= 7 && len < 64,
      concat_ws("/",
        site.substr(lit(1), len - 6),
        site.substr(len - 5, lit(2)),
        site.substr(len - 3, lit(2)),
        site.substr(len - 1, lit(2))))
      .otherwise(site)
  }

  /** [[perSiteManifest]] plus the layout paths each variant would
    * write (`--per-site`, `--per-site-nested`,
    * `--per-site-file=NAME`) — the oracle-checkable projection of
    * PerSitePath. */
  def perSiteLayout(df: DataFrame, filename: String = "data.log"): DataFrame =
    perSiteManifest(df)
      .withColumn("flat_path", col("site"))
      .withColumn("nested_path", nestedSitePath(col("site")))
      .withColumn("file_path", concat(col("site"), lit("/"), lit(filename)))
      .orderBy("site")

  /** The real fan-out writer: pond's `--per-site=PATH` family as one
    * distributed `partitionBy` pass (vs the reference's sequential
    * per-site files).
    *
    *  - default: one `site=X/` directory per site;
    *  - `filename=Some(n)`: a per-site directory with a fixed leaf
    *    name under it (`--per-site-file=NAME`);
    *  - `nested=true`: the [[nestedSitePath]] 2-char fan-out levels
    *    (`--per-site-nested`).
    *
    * Deviations, all inherent to a distributed writer and documented:
    * partition segments are hive-style `key=value`, each leaf is a
    * directory of part files rather than a single regular file, and
    * with `nested` the tree has MIXED depth (deep names 4 levels,
    * short names 1 — the reference's flat fallback), so consumers
    * read per leaf directory (pond's consumers are per-site files
    * anyway), not one global scan of the root.
    */
  def perSiteWrite(df: DataFrame, outDir: String,
                   nested: Boolean = false,
                   filename: Option[String] = None): Unit = {
    def withLeaf(base: DataFrame): (DataFrame, Seq[String]) =
      filename match {
        case Some(n) => (base.withColumn("leaf", lit(n)), Seq("leaf"))
        case None => (base, Nil)
      }
    def write(d: DataFrame, cols: Seq[String], mode: String): Unit =
      d.write.mode(mode).partitionBy(cols: _*).parquet(outDir)
    if (!nested && filename.isEmpty)
      df.write.mode("overwrite").partitionBy("site").parquet(outDir)
    else if (!nested) {
      val (d, leaf) = withLeaf(df.withColumn("p1", col("site")))
      write(d, "p1" +: leaf, "overwrite")
    } else {
      // two passes: deep names get the 2/2/2 levels, short/over-long
      // names fall back FLAT (not null partition placeholders)
      val s = col("site")
      val len = length(s)
      val deep = len >= 7 && len < 64
      val (d1, leaf1) = withLeaf(df.filter(deep)
        .withColumn("p1", s.substr(lit(1), len - 6))
        .withColumn("p2", s.substr(len - 5, lit(2)))
        .withColumn("p3", s.substr(len - 3, lit(2)))
        .withColumn("p4", s.substr(len - 1, lit(2))))
      write(d1, Seq("p1", "p2", "p3", "p4") ++ leaf1, "overwrite")
      val (d2, leaf2) = withLeaf(df.filter(!deep).withColumn("p1", s))
      write(d2, "p1" +: leaf2, "append")
    }
  }

  /** JSONL rendering (reference client/FormatJson.cxx:25-97): one JSON
    * object per record with the reference's field names and order.
    * Deviations from the reference, both documented:
    *  - `status` is the numeric code as string (the reference prints
    *    the RFC reason phrase, e.g. "200 OK");
    *  - `duration` is integer microseconds (the reference prints float
    *    seconds; engine-portable float-to-text is not hash-stable).
    */
  def jsonl(df: DataFrame): DataFrame =
    df.select(
      col("event_id"),
      // to_json omits null fields (Spark default) = FormatJson's
      // `if (d.x != nullptr)` members; field order is the
      // reference's emission order (FormatJson.cxx:25-90)
      to_json(struct(
        date_format(timestamp_micros(col("timestamp")),
          "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("time"),
        col("remote_host"),
        col("host"),
        col("site"),
        col("analytics_id"),
        col("generator"),
        col("forwarded_to"),
        col("method"),
        col("uri"),
        col("referer"),
        col("user_agent"),
        col("message"),
        col("status").cast("string").as("status"),
        col("length"),
        col("content_type"),
        col("traffic_received"),
        col("traffic_sent"),
        col("duration_us").as("duration"),
        col("type"))).as("json"))

  /** One-line text rendering — pond's default output format
    * (reference client/ResultWriter.cxx:275 `Net::Log::FormatOneLine`;
    * the formatter itself lives in the vendored libcommon, so this is
    * the conventional access-log line shape: site, client, timestamp,
    * request, status, bytes, referer, agent).
    *
    * Field toggles mirror the client options (reference
    * client/Main.cxx:263-277): `--host` (`showHost`),
    * `--forwarded-to` (`showForwardedTo`), `--no-referer`
    * (`showReferer = false`), `--no-agent` (`showAgent = false`),
    * `--content-type` (`showContentType`), `--iso8601` (`iso8601`;
    * false = the Common-Log-Format `dd/MMM/yyyy:HH:mm:ss +0000`
    * stamp — all timestamps are UTC in this engine, so the offset is
    * literal). Absent optional fields print `-`, the access-log
    * convention.
    */
  def oneLine(df: DataFrame,
              showHost: Boolean = false,
              showForwardedTo: Boolean = false,
              showReferer: Boolean = true,
              showAgent: Boolean = true,
              showContentType: Boolean = false,
              iso8601: Boolean = true): DataFrame = {
    def dash(c: org.apache.spark.sql.Column) = coalesce(c, lit("-"))
    val stamp =
      if (iso8601)
        date_format(timestamp_micros(col("timestamp")), "yyyy-MM-dd'T'HH:mm:ss'Z'")
      else concat(date_format(timestamp_micros(col("timestamp")),
        "dd/MMM/yyyy:HH:mm:ss"), lit(" +0000"))
    val parts = Seq(col("site"), lit(" ")) ++
      (if (showHost) Seq(dash(col("host")), lit(" ")) else Nil) ++
      Seq(col("remote_host"), lit(" ")) ++
      (if (showForwardedTo) Seq(dash(col("forwarded_to")), lit(" ")) else Nil) ++
      Seq(lit("- - ["), stamp, lit("] \""),
        col("method"), lit(" "), col("uri"), lit(" HTTP/1.1\" "),
        col("status").cast("string"), lit(" "),
        col("traffic_sent").cast("string")) ++
      (if (showReferer) Seq(lit(" \""), dash(col("referer")), lit("\"")) else Nil) ++
      (if (showAgent) Seq(lit(" \""), dash(col("user_agent")), lit("\"")) else Nil) ++
      (if (showContentType) Seq(lit(" "), dash(col("content_type"))) else Nil)
    df.select(col("event_id"), concat(parts: _*).as("line"))
  }

  /** `--raw` / `--gzip` output encodings (reference
    * client/Main.cxx:250-252): in a DataFrame engine these are writer
    * codec choices, not operators — the rendered text column
    * ([[oneLine]] / [[jsonl]]) streams to plain text files, or
    * gzip-framed ones (`compression=gzip`, one gzip member per
    * partition file — the distributed analogue of pond's gzipped
    * dump, and splittable-by-file on read-back).
    */
  def textWrite(df: DataFrame, outDir: String, column: String = "line",
                gzip: Boolean = false): Unit = {
    val w = df.select(col(column)).write.mode("overwrite")
    (if (gzip) w.option("compression", "gzip") else w).text(outDir)
  }

  /** `--gzip` end-to-end (reference client/Main.cxx:250-252): render
    * the one-line format, write it gzip-framed via [[textWrite]], read
    * the frames back as text. The gate compares the read-back lines
    * against the oracle rendering the same lines straight from the
    * table — proving the codec round-trips byte-for-byte. Lines sorted
    * by value: gzip partition files carry no global order (the line
    * text is not provably unique, which is safe — the driver sorts
    * full rows before hashing, and duplicate lines are identical rows).
    */
  def rawGzipRoundTrip(spark: org.apache.spark.sql.SparkSession,
                       dir: String): DataFrame = {
    val tmp = graft.sources.TmpDir.scoped("raw_gzip",
      spark.sparkContext.applicationId, dir)
    // records missing a non-optional member (method/uri on non-access
    // types) render NULL — no line to emit, and the text sink rejects
    // nulls; the oracle applies the same IS NOT NULL
    textWrite(oneLine(LogView(spark, dir)).filter(col("line").isNotNull),
      tmp, gzip = true)
    spark.read.text(tmp).select(col("value").as("line")).orderBy("line")
  }

  /** `--age-only` (reference client/ResultWriter.cxx:199-210): emit
    * only each record's age in whole seconds. The reference measures
    * against wallclock; for a deterministic result the engine measures
    * against the newest record (a scalar broadcast, same shape as
    * [[maxAgeRetention]]).
    */
  def ageOnly(df: DataFrame): DataFrame = {
    val now = df.agg(max("timestamp").as("now_us"))
    df.join(broadcast(now))
      .select(col("event_id"),
        expr("(now_us - timestamp) div 1000000").as("age_s"))
  }

  /** Per-site latency percentiles (p50/p95/p99 of request duration) —
    * the interactive latency-analysis query over access logs. Exact
    * `percentile` here (interpolated, matching DuckDB quantile_cont
    * bit-for-bit on the same doubles); the 100 TB path swaps in
    * `approx_percentile` (t-digest sketch, map-side mergeable) —
    * [[durationQuantilesApprox]].
    */
  def durationQuantiles(df: DataFrame): DataFrame =
    df.groupBy("site")
      .agg(
        count(lit(1)).as("n"),
        floor(expr("percentile(duration_us, 0.5)")).cast("long").as("p50_us"),
        floor(expr("percentile(duration_us, 0.95)")).cast("long").as("p95_us"),
        floor(expr("percentile(duration_us, 0.99)")).cast("long").as("p99_us"))
      .orderBy("site")

  /** Sketch-based variant: mergeable t-digest, the shape that scales
    * (rows-only — sketch internals are engine-specific).
    */
  def durationQuantilesApprox(df: DataFrame): DataFrame =
    df.groupBy("site")
      .agg(expr("approx_percentile(duration_us, array(0.5, 0.95, 0.99), 1000)")
        .as("p_us"))
      .select(col("site"), col("p_us")(0).as("p50_us"),
        col("p_us")(1).as("p95_us"), col("p_us")(2).as("p99_us"))
      .orderBy("site")

  /** Time-series rollup: per site per hour bucket, request counts by
    * status class plus traffic — the dashboard query over access
    * logs. Pure partial-aggregatable groupBy on (site, hour).
    */
  def timeseries(df: DataFrame): DataFrame =
    df.groupBy(col("site"), expr("timestamp div 3600000000").as("hour_bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("status") >= 200 && col("status") < 300, 1)
          .otherwise(0)).as("n_2xx"),
        sum(when(col("status") >= 400 && col("status") < 500, 1)
          .otherwise(0)).as("n_4xx"),
        sum(when(col("status") >= 500, 1).otherwise(0)).as("n_5xx"),
        sum("traffic_sent").as("bytes_sent"))
      .orderBy("site", "hour_bucket")

  /** Retention: drop records older than `maxAgeUs` relative to the
    * newest record (reference doc/index.rst `database.max_age`; pond's
    * ring buffer evicts oldest-first). At 100 TB this is a
    * partition-level delete on the date-partitioned table (metadata
    * only); expressed on a DataFrame it is a filter against the max
    * timestamp (scalar subquery — one tiny extra job, no shuffle of
    * the main data).
    */
  def maxAgeRetention(df: DataFrame, maxAgeUs: Long): DataFrame = {
    val cutoff = df.agg(max("timestamp").as("m"))
      .select((col("m") - maxAgeUs).as("cutoff"))
    df.join(broadcast(cutoff)).filter(col("timestamp") >= col("cutoff"))
      .drop("cutoff")
  }

  /** `per_site_message_rate_limit` (reference doc/index.rst:77-79):
    * keep at most `n` records per site per time bucket of
    * `bucketUs` microseconds (pond's limiter is per-second:
    * `bucketUs = 1000000`). First-come-first-served within the
    * bucket, like the server's token bucket; "first" = time order.
    * One shuffle on (site, bucket); window ranks within partition.
    */
  def rateLimit(df: DataFrame, n: Int, bucketUs: Long = 1000000L): DataFrame = {
    val bucket = expr(s"timestamp div ${bucketUs}L")
    df.withColumn("rn", row_number().over(
        Window.partitionBy(col("site"), bucket).orderBy(timeOrder: _*)))
      .filter(col("rn") <= n)
      .drop("rn")
  }
}
