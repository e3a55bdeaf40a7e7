package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BackfillSpec extends SparkSpec {

  private def freshDest(): String = {
    val d = Files.createTempDirectory("graft_backfill_test").toFile
    d.delete() // backfill expects to create the target itself
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(d)
    }
    d.getAbsolutePath
  }

  test("fresh clone converges to an empty manifest diff; rerun is a no-op") {
    val dest = freshDest()
    val copied = Backfill.backfill(spark, sf, dest)
    assert(copied > 0)
    assert(Backfill.diff(spark, sf, dest).isEmpty)
    assert(Backfill.backfill(spark, sf, dest) == 0) // idempotent
    // destination manifest equals the source manifest exactly
    val src = Backfill.sourceManifest(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val dst = Backfill.destManifest(spark, dest).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(src == dst)
  }

  test("interrupted clone resumes: bounded run leaves a diff, rerun completes") {
    val dest = freshDest()
    val first = Backfill.backfill(spark, sf, dest, maxDays = 3)
    assert(first == 3)
    val remaining = Backfill.diff(spark, sf, dest).count()
    assert(remaining > 0, "bounded backfill must leave pending days")
    // the 3 copied days are NOT in the diff — completed work survives
    // the interruption and is never re-copied
    val total = Backfill.sourceManifest(spark, sf).count()
    assert(remaining == total - 3)
    Backfill.backfill(spark, sf, dest)
    assert(Backfill.diff(spark, sf, dest).isEmpty)
  }

  test("a torn day partition is detected by the diff and repaired") {
    val dest = freshDest()
    Backfill.backfill(spark, sf, dest)
    // tear one day: overwrite its directory with a 1-row subset, as a
    // kill mid-copy on a non-atomic store would leave it
    val day = Backfill.sourceManifest(spark, sf)
      .orderBy("day").head().getString(0)
    graft.Tables.events(spark, sf)
      .withColumn("day",
        date_format(timestamp_micros(expr("ts div 1000")), "yyyy-MM-dd"))
      .filter(col("day") === day).drop("day").limit(1)
      .write.mode("overwrite").parquet(s"$dest/day=$day")
    val d = Backfill.diff(spark, sf, dest).collect()
    assert(d.length == 1 && d.head.getString(0) == day,
      s"diff must flag exactly the torn day: ${d.mkString(",")}")
    Backfill.backfill(spark, sf, dest)
    assert(Backfill.diff(spark, sf, dest).isEmpty)
  }
}
