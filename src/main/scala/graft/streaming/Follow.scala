package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Tables
import graft.logs.LogView

/** FOLLOW/CONTINUE — pond's live tail (reference src/Protocol.hxx
  * FOLLOW, doc/index.rst `--follow`) re-expressed as Structured
  * Streaming: `readStream` over the log table, the same LogView
  * derivation and filter predicates as the batch path (one code path
  * for both, the point of declarative plans), `writeStream` to a sink.
  *
  * In production the source is a file/Kafka stream and the query runs
  * with `Trigger.ProcessingTime`; here `Trigger.AvailableNow` drains
  * the existing data and terminates, which makes the streaming path
  * batch-verifiable: the result must equal the batch query over the
  * same input — exactly what the DuckDB oracle checks.
  */
object Follow {

  /** CONTINUE (reference src/Protocol.hxx:141: "Option for COMMIT …:
    * after the dump is finished, keep the query online and send new
    * records as they are received"): dump what's there, remember the
    * position, resume later with no duplicates and no gaps.
    *
    * Structured Streaming's checkpoint IS the cursor: each
    * `Trigger.AvailableNow` run drains everything unseen since the
    * checkpoint into the (exactly-once) parquet sink and terminates.
    * Call again after new files arrive → only the new records are
    * appended. FollowSpec drives the stop → append → resume cycle.
    */
  def followContinue(spark: SparkSession, srcDir: String,
                     checkpointDir: String, outDir: String,
                     sinceUs: Long = Long.MinValue): Unit = {
    val schema = spark.read.parquet(srcDir).schema
    val stream = Tables.normalize(
      spark.readStream.schema(schema).parquet(srcDir))
    val q = LogView.fromEvents(stream)
      .filter(col("timestamp") >= sinceUs)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Tail records with `timestamp >= sinceUs` through a streaming
    * plan, returning the drained result as a DataFrame.
    */
  def followTail(spark: SparkSession, dir: String, sinceUs: Long): DataFrame = {
    val stream = Tables.stream(spark, dir, "events")
    val name = "graft_follow"
    val q = LogView.fromEvents(stream)
      .filter(col("timestamp") >= sinceUs)
      .writeStream
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).orderBy("timestamp", "event_id")
  }
}
