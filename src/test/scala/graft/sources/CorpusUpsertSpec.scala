package graft.sources

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CorpusUpsertSpec extends SparkSpec {

  private def freshLayout(): String = {
    val d = Files.createTempDirectory("graft_upsert_test").toString
    Tables.events(spark, sf)
      .withColumn("date", expr("date(timestamp_micros(ts div 1000))"))
      .repartition(col("date"))
      .write.mode("overwrite").partitionBy("date").parquet(d)
    d
  }

  private def fileSig(dir: String): Map[String, Seq[(String, Long)]] =
    new java.io.File(dir).listFiles().toSeq
      .filter(d => d.isDirectory && d.getName.startsWith("date="))
      .map(d => d.getName ->
        d.listFiles().toSeq.filter(f => f.isFile && !f.getName.startsWith("_")
            && !f.getName.startsWith("."))
          .map(f => (f.getName, f.lastModified())).sortBy(_._1))
      .toMap

  test("upsert rewrites only affected partitions, replaces and inserts exactly") {
    val dir = freshLayout()
    val before = fileSig(dir)
    val events = Tables.events(spark, sf)
      .withColumn("date", expr("date(timestamp_micros(ts div 1000))"))
    val updates = events.filter(pmod(col("user_id"), lit(89)) === 5)
      .withColumn("event_type", lit("corrected"))
    val inserts = events.filter(pmod(col("user_id"), lit(89)) === 7)
      .withColumn("event_id", col("event_id") + lit(1000000000L))
      .withColumn("event_type", lit("inserted"))
    val batch = updates.unionByName(inserts)
    val nUpd = updates.count()
    val nIns = inserts.count()
    val affectedDates = batch.select(col("date").cast("string")).distinct()
      .collect().map("date=" + _.getString(0)).toSet

    val stats = CorpusUpsert.upsert(spark, dir, batch, "event_id", "date")
    assert(stats.replaced == nUpd && stats.inserted == nIns,
      s"stats=$stats expected replaced=$nUpd inserted=$nIns")
    assert(stats.partitions.toSet == affectedDates)

    // untouched partitions keep their exact files (names + mtimes)
    val after = fileSig(dir)
    before.keys.filterNot(affectedDates).foreach { p =>
      assert(after(p) == before(p), s"untouched $p was rewritten")
    }
    // final state: corrected rows replaced in place, inserts present
    val fin = spark.read.parquet(dir)
    assert(fin.filter(col("event_type") === "corrected").count() == nUpd)
    assert(fin.filter(col("event_type") === "inserted").count() == nIns)
    assert(fin.count() == Tables.events(spark, sf).count() + nIns)

    // replaying the same batch is idempotent: every key now matches,
    // so replaced = batch size, inserted = 0, same final state
    val rollup1 = fin.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val stats2 = CorpusUpsert.upsert(spark, dir, batch, "event_id", "date")
    assert(stats2.replaced == nUpd + nIns && stats2.inserted == 0, stats2.toString)
    val rollup2 = spark.read.parquet(dir).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rollup2 == rollup1)
  }

  test("upsert moves a row across partitions and creates new ones") {
    val dir = freshLayout()
    val one = spark.read.parquet(dir)
      .orderBy("event_id").limit(1).collect()(0)
    val oldDate = one.getAs[java.sql.Date]("date").toString
    val key = one.getAs[Long]("event_id")
    // move the row to a date far outside the layout (a new partition)
    import spark.implicits._
    val batch = Seq((key, one.getAs[Long]("ts"), one.getAs[Long]("user_id"),
        "moved", one.getAs[Double]("value"), one.getAs[String]("props"),
        java.sql.Date.valueOf("2031-01-01")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props", "date")
    val stats = CorpusUpsert.upsert(spark, dir, batch, "event_id", "date")
    assert(stats.replaced == 1 && stats.inserted == 0)
    assert(stats.partitions.toSet ==
      Set(s"date=$oldDate", "date=2031-01-01"), stats.toString)
    val fin = spark.read.parquet(dir)
    // exactly one copy, in the new partition only
    val rows = fin.filter(col("event_id") === key).collect()
    assert(rows.length == 1 && rows(0).getAs[java.sql.Date]("date").toString
      == "2031-01-01" && rows(0).getAs[String]("event_type") == "moved")
  }
}
