package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.logs.LogView

/** CSV access-log source/sink: the full typed log schema through a
  * delimited text round trip. Schema is EXPLICIT on read (inference
  * is a second pass and type-unstable at scale); quoting handles the
  * embedded commas/quotes in message/user_agent; nulls are written as
  * the `\N` sentinel so an absent optional field and a (non-occurring)
  * empty string can't be conflated. Unlike the JSONL wire format the
  * CSV carries event_id, so the round trip is checked on the FULL
  * log schema keyed by event_id.
  */
object CsvSource {

  private val NullToken = "\\N"

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("nullValue", NullToken)
      .option("emptyValue", "")
      .csv(path)

  def read(spark: SparkSession, path: String,
           schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema)
      .option("nullValue", NullToken)
      .option("emptyValue", "")
      // the writer quotes fields with embedded newlines; without
      // multiLine the reader would split such records on the raw
      // newline before parsing quotes and corrupt the row
      .option("multiLine", "true")
      .csv(path)

  /** Write the log view as CSV, read it back typed. Lossless for
    * every column including the DOUBLE `value` (the writer emits the
    * shortest round-tripping decimal repr; parsing it restores the
    * exact bits).
    */
  def roundTrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = TmpDir.scoped("csv_src",
      spark.sparkContext.applicationId, dir)
    val log = LogView(spark, dir)
    write(log, tmp)
    read(spark, tmp, log.schema)
      .orderBy("event_id")
  }
}
