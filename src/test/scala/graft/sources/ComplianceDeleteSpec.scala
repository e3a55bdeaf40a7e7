package graft.sources

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ComplianceDeleteSpec extends SparkSpec {

  private def freshLayout(): String = {
    val d = Files.createTempDirectory("graft_compdel_test").toString
    Tables.events(spark, sf)
      .withColumn("date", expr("date(timestamp_micros(ts div 1000))"))
      .repartition(col("date"))
      .write.mode("overwrite").partitionBy("date").parquet(d)
    d
  }

  private def dataFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))

  private def dayDirs(root: String): Seq[java.io.File] =
    new java.io.File(root).listFiles().toSeq
      .filter(d => d.isDirectory && d.getName.startsWith("date="))

  test("delete removes exactly the matching rows and reports them") {
    val dir = freshLayout()
    val before = spark.read.parquet(dir)
    val keys = before.select("user_id").distinct()
      .filter(pmod(col("user_id"), lit(97)) === 3)
      .collect().map(_.getLong(0)).toSeq
    assert(keys.nonEmpty, "test data must contain delete subjects")
    val hit = before.filter(col("user_id").isin(keys: _*)).count()
    val total = before.count()
    val stats = ComplianceDelete.delete(spark, dir, "user_id", keys)
    assert(stats.rowsDeleted == hit, s"${stats.rowsDeleted} vs $hit")
    val after = spark.read.parquet(dir)
    assert(after.count() == total - hit)
    assert(after.filter(col("user_id").isin(keys: _*)).count() == 0,
      "deleted subjects must be gone")
    // idempotent: a second run finds nothing, touches nothing
    val again = ComplianceDelete.delete(spark, dir, "user_id", keys)
    assert(again.rewritten.isEmpty && again.rowsDeleted == 0)
  }

  test("partitions without matches are untouched byte for byte") {
    val dir = freshLayout()
    // a key set confined to ONE day, so every other day must survive
    // with identical files (same names, same mtimes)
    val oneDay = spark.read.parquet(dir)
      .groupBy("date").agg(min("user_id").as("u"))
      .orderBy("date").limit(1).collect()(0)
    val day = s"date=${oneDay.get(0)}"
    val key = oneDay.getLong(1)
    // the chosen subject may appear in other days too — restrict the
    // assertion to days that genuinely hold no matching rows
    val cleanDays = dayDirs(dir).filterNot { d =>
      spark.read.parquet(d.toString)
        .filter(col("user_id") === key).limit(1).count() > 0
    }
    assert(cleanDays.nonEmpty)
    val snapshot = cleanDays.map(d =>
      d.getName -> dataFiles(d).map(f => f.getName -> f.lastModified()).toMap).toMap
    val stats = ComplianceDelete.delete(spark, dir, "user_id", Seq(key))
    assert(stats.rewritten.contains(day))
    assert(stats.rewritten.intersect(cleanDays.map(_.getName)).isEmpty,
      "clean partitions must not be rewritten")
    cleanDays.foreach { d =>
      val now = dataFiles(d).map(f => f.getName -> f.lastModified()).toMap
      assert(now == snapshot(d.getName), s"${d.getName} was touched")
    }
  }

  test("crash windows recover without losing or resurrecting rows") {
    // window: staged with _SUCCESS, live dir renamed away (crash
    // between trash and promote) — recovery must promote the staged
    // post-delete copy, so the deletion COMMITS
    val dir = freshLayout()
    val root = new java.io.File(dir)
    val day = dayDirs(dir).minBy(_.getName)
    val key = spark.read.parquet(day.toString)
      .select(min("user_id")).collect()(0).getLong(0)
    val survivors = spark.read.parquet(day.toString)
      .filter(col("user_id") =!= key).count()
    val stage = new java.io.File(root, s"_graft_delete_stage/${day.getName}")
    spark.read.parquet(day.toString).filter(col("user_id") =!= key)
      .coalesce(1).write.parquet(stage.toString)
    val trash = new java.io.File(root, s"_graft_delete_old/${day.getName}")
    trash.getParentFile.mkdirs()
    Files.move(day.toPath, trash.toPath) // the mid-swap crash state
    // any later delete run recovers first
    ComplianceDelete.delete(spark, dir, "user_id", Seq(-1L))
    assert(day.exists, "staged post-delete copy not promoted")
    assert(!trash.exists)
    assert(spark.read.parquet(day.toString).count() == survivors)
    assert(spark.read.parquet(day.toString)
      .filter(col("user_id") === key).count() == 0)

    // window: stage without _SUCCESS — recovery must drop it and
    // leave the live partition intact
    val dir2 = freshLayout()
    val root2 = new java.io.File(dir2)
    val day2 = dayDirs(dir2).minBy(_.getName)
    val rows2 = spark.read.parquet(day2.toString).count()
    val stage2 = new java.io.File(root2, s"_graft_delete_stage/${day2.getName}")
    stage2.mkdirs()
    val f = dataFiles(day2).head
    Files.copy(f.toPath, new java.io.File(stage2, f.getName).toPath)
    new java.io.File(stage2, "_SUCCESS").delete() // ensure no marker
    ComplianceDelete.delete(spark, dir2, "user_id", Seq(-1L))
    assert(!stage2.exists)
    assert(spark.read.parquet(day2.toString).count() == rows2)
  }

  test("bloom manifest: no false negatives, real pruning, same delete result") {
    val dir = freshLayout()
    ComplianceDelete.bloomManifestWrite(spark, dir, "user_id")
    val key = spark.read.parquet(dir).select(min("user_id"))
      .collect()(0).getLong(0)
    def norm(p: String) = new org.apache.hadoop.fs.Path(p).toUri.getPath
    // every file that truly holds the key must be a candidate
    val truly = spark.read.parquet(dir).filter(col("user_id") === key)
      .select(input_file_name()).distinct()
      .collect().map(r => norm(r.getString(0))).toSet
    val cand = ComplianceDelete.bloomCandidateFiles(spark, dir, "user_id", Seq(key))
      .get.map(norm).toSet
    assert(truly.subsetOf(cand), s"missed: ${truly -- cand}")
    // and the probe must actually prune something for a single key
    val all = spark.read.parquet(dir).select(input_file_name()).distinct().count()
    assert(cand.size < all, s"no pruning: ${cand.size} of $all")
    // delete through the bloom plan == delete through the full scan
    val dir2 = freshLayout() // no manifest → full planning scan
    val s1 = ComplianceDelete.delete(spark, dir, "user_id", Seq(key))
    val s2 = ComplianceDelete.delete(spark, dir2, "user_id", Seq(key))
    assert(s1.rowsDeleted == s2.rowsDeleted && s1.rowsDeleted > 0)
    val rows = (d: String) => spark.read.parquet(d)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(rows(dir) == rows(dir2))
  }

  test("bloom manifest self-heals across successive deletes") {
    val dir = freshLayout()
    ComplianceDelete.bloomManifestWrite(spark, dir, "user_id")
    val keys = spark.read.parquet(dir).select("user_id").distinct()
      .orderBy("user_id").limit(2).collect().map(_.getLong(0))
    val expectB = spark.read.parquet(dir)
      .filter(col("user_id") === keys(1)).count()
    ComplianceDelete.delete(spark, dir, "user_id", Seq(keys(0)))
    // the second delete plans against the REFRESHED manifest — the
    // rewritten partitions' new files must be probed (or fall back as
    // unknown), never silently skipped
    val s = ComplianceDelete.delete(spark, dir, "user_id", Seq(keys(1)))
    assert(s.rowsDeleted == expectB, s"${s.rowsDeleted} vs $expectB")
    assert(spark.read.parquet(dir)
      .filter(col("user_id").isin(keys.toIndexedSeq: _*)).count() == 0)
  }

  test("planning pushes the key filter to the parquet scan") {
    val dir = freshLayout()
    val plan = spark.read.parquet(dir)
      .filter(col("user_id").isin(1L, 2L, 3L))
      .select(input_file_name())
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("user_id"),
      s"key filter must reach the scan:\n$plan")
  }
}
