package graft.logs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Client-side enrichment operators (reference src/client).
  */
object Enrich {

  /** `--anonymize` (reference doc/index.rst:213-217, applied in the
    * one-line formatter): zero a trailing portion of the client IP —
    * IPv4 keeps the first 3 octets (/24), IPv6 keeps the first 48
    * bits (the reference zeroes the trailing 80 bits of the binary
    * address).
    *
    * IPv6 `::`-compression is expanded BEFORE slicing (a compressed
    * `2001:db8::1` has its zero-run in the middle — naive hextet
    * splitting would keep the wrong groups). Output is canonicalized
    * as `h1:h2:h3::` (never re-compressed; `::1` → `0:0:0::`).
    *
    * Pure string/array expression → no UDF, stays distributed.
    */
  def anonymizeIpCol(ip: Column): Column = {
    // Expand "a::b" → left groups ++ zeros ++ right groups (8 total).
    val halves = split(ip, "::", 2)
    val lRaw = element_at(halves, 1)
    val rRaw = when(size(halves) < 2, lit("")).otherwise(element_at(halves, 2))
    val emptyArr = array().cast("array<string>")
    val l = when(lRaw === "", emptyArr).otherwise(split(lRaw, ":"))
    val r = when(rRaw === "", emptyArr).otherwise(split(rRaw, ":"))
    val expanded = when(ip.contains("::"),
        concat(l, array_repeat(lit("0"), (lit(8) - size(l) - size(r)).cast("int")), r))
      .otherwise(split(ip, ":"))
    when(ip.isNull, lit(null))
      .when(ip.contains(":"), // IPv6 → first three hextets + "::"
        concat(concat_ws(":", slice(expanded, 1, 3)), lit("::")))
      .otherwise(regexp_replace(ip, "\\.[0-9]+$", ".0"))
  }

  def anonymize(df: DataFrame): DataFrame =
    df.withColumn("remote_host", anonymizeIpCol(col("remote_host")))

  /** Scala-side reference implementation (for tests / driver use).
    * Mirrors [[anonymizeIpCol]] including `::`-expansion.
    */
  def anonymizeIp(ip: String): String =
    if (ip == null) null
    else if (ip.contains(":")) {
      val expanded =
        if (ip.contains("::")) {
          val Array(lRaw, rRaw) =
            (ip.split("::", 2) ++ Array("", "")).take(2)
          val l = if (lRaw.isEmpty) Array.empty[String] else lRaw.split(":")
          val r = if (rRaw.isEmpty) Array.empty[String] else rRaw.split(":")
          l ++ Array.fill(8 - l.length - r.length)("0") ++ r
        } else ip.split(":")
      expanded.take(3).mkString(":") + "::"
    } else ip.replaceAll("\\.[0-9]+$", ".0")

  /** The deterministic node → resolved-host mapping used to stand in
    * for `--resolve-forwarded-to`'s DNS lookups — shared with the
    * DuckDB oracle.
    */
  val resolvedHostCase: String =
    "CASE WHEN forwarded_to IS NULL THEN NULL " +
      "ELSE 'host-' || substr(forwarded_to, 6) || '.internal.example' END"

  /** `--resolve-forwarded-to` (reference client/Main.cxx:266-269):
    * replace the forwarded-to node address with its resolved hostname.
    * The reference resolves via DNS (cached per address,
    * client/CachedAddressResolver.hxx); a deterministic broadcast dim
    * stands in for the resolver here, but the SHAPE is the 100 TB
    * plan: resolution is a broadcast hash join against the (tiny)
    * distinct-address dimension, never a per-row RPC.
    */
  def resolveForwardedTo(spark: SparkSession, df: DataFrame): DataFrame = {
    val dim = spark.range(16).select(
      concat(lit("node-"), col("id").cast("string")).as("forwarded_to"),
      concat(lit("host-"), col("id").cast("string"),
        lit(".internal.example")).as("forwarded_to_resolved"))
    df.join(broadcast(dim), Seq("forwarded_to"), "left")
  }

  val maxIdleUs: Long = 30L * 60 * 1000000 // VisitorTracker.hxx:16-17

  /** `--track-visitors` (reference client/VisitorTracker.hxx:16-27):
    * assign an opaque visitor id per remote_host; a record continues
    * the current visit iff `timestamp < last_seen + 30min`
    * (`CheckTimestamp`), i.e. a gap of EXACTLY 30 minutes starts a new
    * visit. The reference's ids are a random counter; ours are
    * `md5(remote_host:visit_ordinal)` — equally opaque, but
    * deterministic and reproducible by the SQL oracle.
    *
    * Scale: one shuffle on remote_host; the lag/sum windows run within
    * each host partition. Visitor cardinality >> partition count, so
    * distribution is even; a single pathological host is bounded by
    * its own record count, not the dataset.
    */
  def trackVisitors(df: DataFrame): DataFrame = {
    val byHost = Window.partitionBy("remote_host")
      .orderBy(col("timestamp"), col("event_id"))
    val gap = col("timestamp") - lag("timestamp", 1).over(byHost)
    val newVisit = when(gap.isNull || gap >= maxIdleUs, 1).otherwise(0)
    df.withColumn("visit_seq",
        sum(newVisit).over(byHost.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("visitor_id",
        md5(concat(col("remote_host"), lit(":"), col("visit_seq"))))
  }

  /** Per-site visitor statistics derived from [[trackVisitors]]
    * (SURVEY §2C `visitor_stats`): hits, distinct visits, distinct
    * hosts per site.
    */
  def visitorStats(df: DataFrame): DataFrame =
    trackVisitors(df)
      .groupBy("site")
      .agg(
        count(lit(1)).as("n_hits"),
        countDistinct("visitor_id").as("n_visits"),
        countDistinct("remote_host").as("n_hosts"))
      .orderBy("site")

  /** The deterministic country expression used to synthesise the
    * GeoIP lookup table — shared verbatim with the DuckDB oracle.
    */
  val geoCountryCase: String =
    "CASE octet2 % 10 WHEN 0 THEN 'US' WHEN 1 THEN 'DE' WHEN 2 THEN 'FR' " +
      "WHEN 3 THEN 'GB' WHEN 4 THEN 'NL' WHEN 5 THEN 'JP' WHEN 6 THEN 'BR' " +
      "WHEN 7 THEN 'IN' WHEN 8 THEN 'AU' ELSE 'CA' END"

  /** `--geoip` (reference doc/index.rst --geoip, client/ResultWriter
    * GeoIP lookup): append a country-code column per client IP.
    *
    * A real GeoIP database is a table of address RANGES → country.
    * Without one in the image we synthesise 256 ranges
    * [10.x.0.0, 10.x.255.255] whose country is a deterministic
    * function of x — but the LOOKUP is the real thing: an interval
    * join of `ip_int BETWEEN lo AND hi` against a broadcast dim.
    *
    * 100 TB shape: a naive interval join plans as a
    * BroadcastNestedLoopJoin — every log row scans every range. We
    * instead explode each range into the /16 buckets it overlaps and
    * equi-join on `ip_int div 65536` with the BETWEEN as a residual
    * condition — a codegen'd BroadcastHashJoin probing O(1) ranges per
    * row (PlanSpec asserts it). Real GeoIP dbs (~4e5 ranges, most
    * narrower than a /16) explode to a few hundred thousand bucket
    * rows — still trivially broadcastable.
    */
  /** The top 64 bits of an IPv6 address as a signed long — the /64
    * prefix key the v6 range join buckets on. `::`-expansion is the
    * same as [[anonymizeIpCol]]'s; hex hextets go through `conv`.
    * Callers guard with [[isValid6]] so this only sees well-formed
    * addresses (ANSI mode: no silent garbage, no throw on garbage).
    */
  private def ipv6Key64(ip: Column): Column = {
    val halves = split(ip, "::", 2)
    val lRaw = element_at(halves, 1)
    val rRaw = when(size(halves) < 2, lit("")).otherwise(element_at(halves, 2))
    val emptyArr = array().cast("array<string>")
    val l = when(lRaw === "", emptyArr).otherwise(split(lRaw, ":"))
    val r = when(rRaw === "", emptyArr).otherwise(split(rRaw, ":"))
    val expanded = when(ip.contains("::"),
        concat(l, array_repeat(lit("0"), (lit(8) - size(l) - size(r)).cast("int")), r))
      .otherwise(split(ip, ":"))
    (0 until 4).map { i =>
      shiftleft(conv(element_at(expanded, i + 1), 16, 10).cast("long"), 48 - 16 * i)
    }.reduce(_.bitwiseOR(_))
  }

  /** Structurally valid dotted-quad / IPv6 (enough validation that
    * the parse expressions can't throw under ANSI; semantic range
    * checks are the lookup's job — an out-of-table address simply
    * doesn't match and gets `-`).
    */
  private val isValid4: Column =
    col("remote_host").rlike("^([0-9]{1,3}\\.){3}[0-9]{1,3}$")
  private val isValid6: Column =
    col("remote_host").rlike("^[0-9a-fA-F:]{2,39}$") &&
      (col("remote_host").contains("::") ||
        size(split(col("remote_host"), ":")) === 8)

  def geoip(spark: SparkSession, df: DataFrame): DataFrame = {
    // v4: 256 ranges [10.x.0.0, 10.x.255.255]; v6: 256 ranges
    // 2001:db8:x::/48 (the documentation prefix) keyed on the top 64
    // bits — same deterministic country function of x for both, same
    // interval-join-as-BroadcastHashJoin plan. `fam` keeps the two
    // key spaces from ever cross-matching.
    val v4 = spark.range(256).select(
      lit(4).as("fam"),
      (lit(10L * 16777216L) + col("id") * 65536L).as("lo"),
      (lit(10L * 16777216L) + col("id") * 65536L + 65535L).as("hi"),
      expr(geoCountryCase.replace("octet2", "id")).as("country"))
    val v6base = (0x2001L << 48) | (0x0db8L << 32)
    val v6 = spark.range(256).select(
      lit(6).as("fam"),
      (lit(v6base) + col("id") * 65536L).as("lo"),
      (lit(v6base) + col("id") * 65536L + 65535L).as("hi"),
      expr(geoCountryCase.replace("octet2", "id")).as("country"))
    val buckets = v4.union(v6).select(
      col("fam"), col("lo"), col("hi"), col("country"),
      explode(expr("sequence(lo div 65536, hi div 65536)")).as("bucket"))
    val oct = split(col("remote_host"), "\\.")
    val v4Key = element_at(oct, 1).cast("long") * 16777216L +
      element_at(oct, 2).cast("long") * 65536L +
      element_at(oct, 3).cast("long") * 256L +
      element_at(oct, 4).cast("long")
    // CaseWhen branches evaluate lazily, so the v4 parse never sees a
    // colon-bearing address (which would throw under ANSI) and vice
    // versa; anything structurally invalid keys NULL → join miss → '-'
    val withIp = df
      .withColumn("ip_fam",
        when(col("remote_host").contains(":"), 6).otherwise(4))
      .withColumn("ip_int",
        when(col("remote_host").contains(":"),
          when(isValid6, ipv6Key64(col("remote_host"))))
          .otherwise(when(isValid4, v4Key)))
    withIp.join(broadcast(buckets),
        col("ip_fam") === col("fam") &&
          expr("ip_int div 65536") === col("bucket") &&
          col("ip_int").between(col("lo"), col("hi")), "left")
      .withColumn("country", coalesce(col("country"), lit("-")))
      .drop("ip_int", "ip_fam", "fam", "bucket", "lo", "hi")
  }
}
