package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.logs.{LogView, Shaping}

/** JSONL access-log *source*: read lines in the reference client's
  * FormatJson layout (reference src/client/FormatJson.cxx:25-97 —
  * what `pond --jsonl` emits and what a downstream pipeline ingests)
  * back into the engine's typed log schema.
  *
  * The schema is EXPLICIT, never inferred: inference is a second full
  * pass over the data and makes the schema depend on which fields
  * happened to be present — at 100 TB both are disqualifying. Fields
  * absent from a line (FormatJson skips null members) surface as
  * NULL, exactly the reference's optional-attribute semantics.
  */
object JsonlSource {

  /** FormatJson's members, in emission order, typed. `time` is the
    * ISO8601 micro-second stamp; numerics are longs on the wire.
    */
  val schema: StructType = StructType(Seq(
    StructField("time", StringType),
    StructField("remote_host", StringType),
    StructField("host", StringType),
    StructField("site", StringType),
    StructField("analytics_id", StringType),
    StructField("generator", StringType),
    StructField("forwarded_to", StringType),
    StructField("method", StringType),
    StructField("uri", StringType),
    StructField("referer", StringType),
    StructField("user_agent", StringType),
    StructField("message", StringType),
    StructField("status", StringType),
    StructField("length", LongType),
    StructField("content_type", StringType),
    StructField("traffic_received", LongType),
    StructField("traffic_sent", LongType),
    StructField("duration", LongType),
    StructField("type", StringType)))

  private val TimeFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"

  /** Parse a JSONL directory into the typed log view (the FormatJson
    * field subset — the wire format carries no event_id/user_id).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).json(path)
      .select(
        unix_micros(to_timestamp(col("time"), TimeFmt)).as("timestamp"),
        col("site"), col("host"), col("generator"), col("analytics_id"),
        col("forwarded_to"), col("remote_host"), col("type"),
        col("method"), col("uri"), col("referer"), col("user_agent"),
        col("status").cast("int").as("status"), col("length"),
        col("content_type"), col("duration").as("duration_us"),
        col("traffic_sent"), col("traffic_received"), col("message"))

  /** Permissive ingest with corrupt-line accounting — what a real
    * JSONL landing zone needs: malformed lines must be ISOLATED
    * (counted, quarantined in `_corrupt_record`), never poison the
    * parse of good lines, and never abort the job (at 100 TB some
    * lines are always broken). The fixture deterministically mangles
    * every `event_id % 10 == 3` line (truncated to 20 chars —
    * unparseable mid-string), so the oracle knows exactly which lines
    * are bad; the gate checks the good rows parsed fully
    * (`good_ts_sum` over the recovered microsecond timestamps) and
    * the bad ones were all caught. The mangle appends an unmatched
    * `{` to the truncated prefix so the line is invalid JSON by
    * construction — not merely invalid-because-truncated, which
    * would silently stop holding if the serialization ever made a
    * 20-char prefix (or a sub-20-char line) self-delimiting. Pure
    * per-line parse — the accounting aggregate is one scalar row.
    */
  def corruptAccounting(spark: SparkSession, dir: String): DataFrame = {
    val tmp = TmpDir.scoped("jsonl_corrupt",
      spark.sparkContext.applicationId, dir)
    Shaping.jsonl(LogView(spark, dir))
      .select(
        when(pmod(col("event_id"), lit(10L)) === 3L,
          concat(substring(col("json"), 1, 20), lit("{")))
          .otherwise(col("json")).as("json"))
      .write.mode("overwrite").text(tmp)
    spark.read
      .schema(schema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(tmp)
      .select(col("_corrupt_record"),
        // micros-within-day: full sub-second parse fidelity without
        // BIGINT overflow in the corpus-wide sum (raw micro stamps
        // are ~1.7e15 each; the full-fidelity round trip is
        // jsonl_source's gate)
        pmod(unix_micros(to_timestamp(col("time"), TimeFmt)),
          lit(86400000000L)).as("ts"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("_corrupt_record")).as("n_corrupt"),
        count(when(col("_corrupt_record").isNull, lit(1))).as("n_good"),
        sum(when(col("_corrupt_record").isNull, col("ts"))).as("good_ts_sum"))
  }

  /** Round trip: render the log as JSONL ([[Shaping.jsonl]]), read it
    * back through [[read]]. Lossless up to the fields the wire format
    * carries — the gate compares the result against the original log
    * table, proving writer and reader agree byte-for-byte on every
    * field (timestamps to the microsecond, null-member omission).
    */
  def roundTrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = TmpDir.scoped("jsonl_src",
      spark.sparkContext.applicationId, dir)
    Shaping.jsonl(LogView(spark, dir))
      .select("json").write.mode("overwrite").text(tmp)
    // the wire format carries no event_id, so (timestamp, remote_host,
    // uri) is the best available sort key and is NOT provably unique —
    // a documented exception to the unique-ORDER-BY convention; the
    // gate is safe because the driver sorts full rows before hashing
    read(spark, tmp).orderBy("timestamp", "remote_host", "uri")
  }
}
