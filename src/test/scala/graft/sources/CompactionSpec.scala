package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  private def freshLayout(): String = {
    val d = Files.createTempDirectory("graft_compact_test").toString
    Compaction.fragmentedLayout(spark, sf, d)
    d
  }

  private def dataFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))

  private def dayDirs(root: String): Seq[java.io.File] =
    new java.io.File(root).listFiles().toSeq
      .filter(d => d.isDirectory && d.getName.startsWith("date="))

  test("compact shrinks fragmented partitions to their byte-justified count") {
    val dir = freshLayout()
    val before = dayDirs(dir).map(d => d.getName -> dataFiles(d).size).toMap
    assert(before.values.max > 4, s"layout must be fragmented: $before")
    val rows = spark.read.parquet(dir).count()
    val done = Compaction.compact(spark, dir, targetBytes = 4L * 1024 * 1024)
    assert(done.nonEmpty)
    val after = dayDirs(dir).map(d => d.getName -> dataFiles(d).size).toMap
    done.foreach { p =>
      assert(after(p.partition) == p.targetFiles,
        s"${p.partition}: ${after(p.partition)} files, wanted ${p.targetFiles}")
      assert(after(p.partition) < before(p.partition))
    }
    // content preserved exactly
    assert(spark.read.parquet(dir).count() == rows)
    // idempotent: nothing left to do, nothing touched
    assert(Compaction.compact(spark, dir, targetBytes = 4L * 1024 * 1024).isEmpty)
  }

  test("healthy partitions are untouched byte for byte") {
    val dir = freshLayout()
    // pre-compact one day by hand so it's already at its target
    val day = dayDirs(dir).minBy(_.getName)
    val plans = Compaction.plan(spark, dir, targetBytes = 4L * 1024 * 1024)
    val p = plans.find(_.partition == day.getName).get
    val pre = Compaction.compact(spark, dir, targetBytes = 4L * 1024 * 1024)
    assert(pre.exists(_.partition == day.getName))
    val snapshot = dataFiles(day).map(f => f.getName -> f.lastModified()).toMap
    // a second run must not rewrite it
    assert(Compaction.compact(spark, dir, targetBytes = 4L * 1024 * 1024).isEmpty)
    val again = dataFiles(day).map(f => f.getName -> f.lastModified()).toMap
    assert(again == snapshot, s"healthy partition rewritten: $snapshot vs $again")
    assert(p.fragmented)
  }

  test("crash windows recover without losing or duplicating rows") {
    val dir = freshLayout()
    val root = new java.io.File(dir)
    val rows = spark.read.parquet(dir).count()
    val day = dayDirs(dir).minBy(_.getName)

    // window A: staging finished (_SUCCESS), live dir still present —
    // recovery must drop the stage and keep the live data
    val stageA = new java.io.File(root, s"_graft_compact_stage/${day.getName}")
    stageA.mkdirs()
    val f = dataFiles(day).head
    Files.copy(f.toPath, new java.io.File(stageA, f.getName).toPath)
    new java.io.File(stageA, "_SUCCESS").createNewFile()
    Compaction.compact(spark, dir, targetBytes = 4L * 1024 * 1024)
    assert(!stageA.exists)
    assert(spark.read.parquet(dir).count() == rows, "window A lost rows")

    // window B: live dir renamed away (crash between trash and
    // promote) — the staged copy is whole; recovery must promote it
    val dir2 = freshLayout()
    val root2 = new java.io.File(dir2)
    val rows2 = spark.read.parquet(dir2).count()
    val day2 = dayDirs(dir2).minBy(_.getName)
    val stageB = new java.io.File(root2, s"_graft_compact_stage/${day2.getName}")
    // stage = a real compacted copy of the day (what step 1 produces)
    spark.read.parquet(day2.toString).coalesce(1)
      .write.parquet(stageB.toString)
    val trashB = new java.io.File(root2, s"_graft_compact_old/${day2.getName}")
    trashB.getParentFile.mkdirs()
    Files.move(day2.toPath, trashB.toPath) // the mid-swap crash state
    Compaction.compact(spark, dir2, targetBytes = 4L * 1024 * 1024)
    assert(day2.exists, "window B: staged copy not promoted")
    assert(!trashB.exists)
    assert(spark.read.parquet(dir2).count() == rows2, "window B lost rows")
  }
}
