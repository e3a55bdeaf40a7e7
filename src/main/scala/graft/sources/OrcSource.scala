package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.logs.LogView

/** ORC access-log source/sink: the second columnar format next to
  * parquet (warehouses that standardised on Hive/ORC hand data over
  * in it). Spark's native vectorized ORC reader gives the same
  * columnar virtues as the parquet path — predicate pushdown via
  * file/stripe/row-group statistics, column pruning, splittable
  * files — so a 100 TB ORC landing zone reads with the same plan
  * shapes as the parquet tables (OrcSourceSpec asserts pushdown
  * reaches the scan).
  *
  * ORC is type-precise for every log column (longs, strings, doubles
  * all round-trip bit-exact — no text parsing anywhere), so the gate
  * checks the FULL schema keyed by event_id against the same oracle
  * the CSV round trip uses.
  */
object OrcSource {

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Schema from the files themselves (self-describing format — no
    * inference pass, unlike CSV/JSONL).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Write the log view as ORC, read it back. */
  def roundTrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = TmpDir.scoped("orc_src",
      spark.sparkContext.applicationId, dir)
    write(LogView(spark, dir), tmp)
    read(spark, tmp).orderBy("event_id")
  }
}
