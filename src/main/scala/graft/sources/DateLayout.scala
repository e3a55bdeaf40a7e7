package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.logs.LogView

/** The 100 TB storage layout as an operator: the log written as
  * date-partitioned parquet (`.../date=2024-01-05/part-*.parquet`) —
  * the layout that makes pond's time-window queries partition-prunable
  * (whole directories skipped on since/until, PlanSpec asserts the
  * PartitionFilters) and max_age retention a directory drop instead
  * of a scan.
  */
object DateLayout {

  /** Write the log date-partitioned, read it back, and roll up per
    * partition — the round trip proves writer and reader agree on the
    * partition column derivation and that no row is lost or
    * duplicated across partition boundaries (the gate compares
    * per-date counts and byte sums against the unpartitioned log).
    */
  def writeRollup(spark: SparkSession, dir: String): DataFrame = {
    val tmp = TmpDir.scoped("datepart",
      spark.sparkContext.applicationId, dir)
    LogView(spark, dir)
      .withColumn("date", expr("date(timestamp_micros(timestamp))"))
      // repartition on the partition column first: without it every
      // task writes a file into every date directory (tasks × dates
      // small files — the classic partitioned-write mistake at scale);
      // with it each date is one task's contiguous write. AQE coalesces
      // the post-shuffle partitions, so skewed dates still split.
      .repartition(col("date"))
      .write.mode("overwrite").partitionBy("date").parquet(tmp)
    spark.read.parquet(tmp)
      .groupBy(col("date").cast("string").as("date"))
      .agg(count(lit(1)).as("n"), sum("traffic_sent").as("bytes_sent"))
      .orderBy("date")
  }
}
