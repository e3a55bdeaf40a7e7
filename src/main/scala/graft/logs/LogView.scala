package graft.logs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Pond-shaped log records derived from the `events` testdata table.
  *
  * The reference's record is a `Net::Log::Datagram` (see reference
  * client/FormatJson.cxx:25-97 for the full field list: timestamp,
  * remote_host, host, site, generator, method, uri, status, length,
  * traffic, duration, type). The driver testdata has no log table, so
  * we derive one deterministically from `events` — the derivation is
  * plain SQL so the DuckDB oracle can reproduce it bit-for-bit
  * ([[LogView.sqlCte]]).
  *
  * Timestamp representation: pond's `Net::Log::TimePoint` is a
  * microsecond-resolution time_point; we keep `timestamp` as BIGINT
  * epoch-microseconds. The parquet source stores TIMESTAMP(NANOS);
  * Spark (with `nanosAsLong`, see [[graft.GraftSession]]) surfaces
  * BIGINT nanos and `div 1000` truncates toward zero; DuckDB coerces
  * TIMESTAMP_NS → TIMESTAMP (µs) by the same truncation, so the two
  * sides agree exactly (both verified on sub-µs-precision rows).
  *
  * At 100 TB the real input would be a partitioned parquet log table
  * with exactly these columns; every operator downstream takes a
  * DataFrame with this schema, so swapping the source is free.
  */
object LogView {

  val columns: Seq[String] = Seq(
    "event_id", "timestamp", "site", "host", "generator", "analytics_id",
    "forwarded_to", "remote_host", "type", "method", "uri", "referer",
    "user_agent", "status", "length", "content_type", "duration_us",
    "traffic_sent", "traffic_received", "message", "user_id", "value")

  /** Column derivations, Spark-SQL side. Must stay semantically
    * identical to [[sqlCte]] (DuckDB side).
    */
  def apply(spark: SparkSession, sfDir: String): DataFrame =
    fromEvents(Tables.events(spark, sfDir))

  /** Same derivation over any events-shaped DataFrame — batch or
    * streaming ([[graft.streaming.Follow]] passes a readStream here).
    */
  def fromEvents(ev: DataFrame): DataFrame = {
    ev.withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .select(
        col("event_id"),
        expr("ts div 1000").as("timestamp"),
        concat(lit("site_"), (col("user_id") % 10).cast("string")).as("site"),
        concat(lit("h"), (col("user_id") % 5).cast("string"),
          lit(".example.com")).as("host"),
        concat(lit("gen"), (col("event_id") % 3).cast("string")).as("generator"),
        // Net::Log::Datagram optional attribution/routing fields
        // (reference client/FormatJson.cxx:41-49): NULL when absent,
        // like the reference's nullptr members
        expr("CASE WHEN user_id % 5 = 0 THEN NULL " +
          "ELSE concat('aid-', CAST(user_id % 40 AS STRING)) END")
          .as("analytics_id"),
        expr("CASE WHEN event_id % 3 = 0 THEN " +
          "concat('node-', CAST(event_id % 16 AS STRING)) END")
          .as("forwarded_to"),
        concat(lit("10."), (col("user_id") % 200).cast("string"), lit("."),
          (col("event_id") % 250).cast("string"), lit("."),
          ((col("event_id") * 7) % 250).cast("string")).as("remote_host"),
        expr("CASE event_type WHEN 'error' THEN 'http_error' " +
          "WHEN 'signup' THEN 'submission' WHEN 'purchase' THEN 'job' " +
          "ELSE 'http_access' END").as("type"),
        expr("CASE WHEN event_type = 'purchase' THEN 'POST' " +
          "WHEN event_type = 'signup' THEN 'PUT' " +
          "WHEN event_type = 'error' AND k % 2 = 0 THEN 'DELETE' " +
          "ELSE 'GET' END").as("method"),
        concat(lit("/"), col("event_type"), lit("/item"),
          (col("k") % 50).cast("string")).as("uri"),
        // http_referer / user_agent / length / content_type
        // (reference client/FormatJson.cxx:57-62, 70-74)
        expr("CASE WHEN k % 3 = 0 THEN concat('https://ref', " +
          "CAST(k % 20 AS STRING), '.example.org/') END").as("referer"),
        expr("CASE user_id % 5 WHEN 0 THEN 'curl/8.5.0' " +
          "WHEN 1 THEN 'Mozilla/5.0 (X11; Linux x86_64)' " +
          "WHEN 2 THEN 'Googlebot/2.1 (+http://www.google.com/bot.html)' " +
          "WHEN 3 THEN 'python-requests/2.31.0' END").as("user_agent"),
        expr("CAST(CASE WHEN event_type = 'error' THEN 500 + (k % 12) " +
          "WHEN k % 7 = 0 THEN 404 ELSE 200 END AS INT)").as("status"),
        expr("CAST(floor(value * 90) AS BIGINT)").as("length"),
        expr("CASE k % 4 WHEN 0 THEN 'text/html' " +
          "WHEN 1 THEN 'application/json' WHEN 2 THEN 'image/png' END")
          .as("content_type"),
        expr("CAST(floor(value * 1000) AS BIGINT)").as("duration_us"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("traffic_sent"),
        expr("CAST(floor(value * 10) AS BIGINT)").as("traffic_received"),
        col("props").as("message"),
        col("user_id"),
        col("value"))
  }

  /** DuckDB CTE producing the identical view; prepend to oracle SQL. */
  val sqlCte: String =
    """WITH log AS (
      |  SELECT
      |    event_id,
      |    epoch_us(ts) AS timestamp,
      |    'site_' || CAST(user_id % 10 AS VARCHAR) AS site,
      |    'h' || CAST(user_id % 5 AS VARCHAR) || '.example.com' AS host,
      |    'gen' || CAST(event_id % 3 AS VARCHAR) AS generator,
      |    CASE WHEN user_id % 5 = 0 THEN NULL
      |      ELSE 'aid-' || CAST(user_id % 40 AS VARCHAR) END AS analytics_id,
      |    CASE WHEN event_id % 3 = 0
      |      THEN 'node-' || CAST(event_id % 16 AS VARCHAR) END AS forwarded_to,
      |    '10.' || CAST(user_id % 200 AS VARCHAR) || '.' ||
      |      CAST(event_id % 250 AS VARCHAR) || '.' ||
      |      CAST((event_id * 7) % 250 AS VARCHAR) AS remote_host,
      |    CASE event_type WHEN 'error' THEN 'http_error'
      |      WHEN 'signup' THEN 'submission' WHEN 'purchase' THEN 'job'
      |      ELSE 'http_access' END AS type,
      |    CASE WHEN event_type = 'purchase' THEN 'POST'
      |      WHEN event_type = 'signup' THEN 'PUT'
      |      WHEN event_type = 'error' AND k % 2 = 0 THEN 'DELETE'
      |      ELSE 'GET' END AS method,
      |    '/' || event_type || '/item' || CAST(k % 50 AS VARCHAR) AS uri,
      |    CASE WHEN k % 3 = 0 THEN 'https://ref' || CAST(k % 20 AS VARCHAR)
      |      || '.example.org/' END AS referer,
      |    CASE user_id % 5 WHEN 0 THEN 'curl/8.5.0'
      |      WHEN 1 THEN 'Mozilla/5.0 (X11; Linux x86_64)'
      |      WHEN 2 THEN 'Googlebot/2.1 (+http://www.google.com/bot.html)'
      |      WHEN 3 THEN 'python-requests/2.31.0' END AS user_agent,
      |    CAST(CASE WHEN event_type = 'error' THEN 500 + (k % 12)
      |      WHEN k % 7 = 0 THEN 404 ELSE 200 END AS INTEGER) AS status,
      |    CAST(floor(value * 90) AS BIGINT) AS length,
      |    CASE k % 4 WHEN 0 THEN 'text/html'
      |      WHEN 1 THEN 'application/json' WHEN 2 THEN 'image/png'
      |      END AS content_type,
      |    CAST(floor(value * 1000) AS BIGINT) AS duration_us,
      |    CAST(floor(value * 100) AS BIGINT) AS traffic_sent,
      |    CAST(floor(value * 10) AS BIGINT) AS traffic_received,
      |    props AS message,
      |    user_id,
      |    value
      |  FROM (SELECT *, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      |        FROM events)
      |)""".stripMargin

  /** Wrap a SELECT over `log` with the CTE. */
  def oracle(select: String): String = s"$sqlCte\n$select"
}
