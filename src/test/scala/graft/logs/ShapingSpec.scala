package graft.logs

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShapingSpec extends SparkSpec {

  private lazy val log = LogView(spark, sf)

  test("window max@skip: bounded, time-ordered, offset applied") {
    val all = log.orderBy("timestamp", "event_id")
      .select("event_id").limit(60).collect().map(_.getLong(0))
    val win = Shaping.window(log, max = 10, skip = 50)
      .select("event_id").collect().map(_.getLong(0))
    assert(win.length == 10)
    assert(win.toSeq == all.slice(50, 60).toSeq)
  }

  test("last returns the single most recent record") {
    val l = Shaping.last(log).collect()
    assert(l.length == 1)
    val maxTs = log.agg(max("timestamp")).head().getLong(0)
    assert(l.head.getAs[Long]("timestamp") == maxTs)
  }

  test("group_site: exactly `max` sites after skipping, lexicographic") {
    val out = Shaping.groupSite(log, max = 3, skip = 2)
    val sites = out.select("site").distinct()
      .collect().map(_.getString(0)).sorted
    val allSites = log.select("site").distinct()
      .collect().map(_.getString(0)).sorted
    assert(sites.toSeq == allSites.slice(2, 5).toSeq)
  }

  test("accumulate more/top agree with manual counting") {
    val counts = log.groupBy("site").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val top = Shaping.accumulateTop(log, "site", 3).collect()
    assert(top.length == 3)
    assert(top.map(_.getLong(1)).toSeq ==
      counts.values.toSeq.sorted(Ordering[Long].reverse).take(3))
    val more = Shaping.accumulateMore(log, "site", 1L).collect()
    assert(more.length == counts.size)
  }

  test("rate limit keeps at most n per (site, bucket)") {
    val limited = Shaping.rateLimit(log, n = 1, bucketUs = 86400000000L)
    val worst = limited
      .groupBy(col("site"), expr("timestamp div 86400000000"))
      .count().agg(max("count")).head().getLong(0)
    assert(worst == 1L)
    assert(limited.count() < log.count())
  }

  test("max_age keeps only the trailing window") {
    val kept = Shaping.maxAgeRetention(log, 86400000000L) // 1 day
    val bounds = kept.agg(min("timestamp"), max("timestamp")).head()
    assert(bounds.getLong(1) - bounds.getLong(0) <= 86400000000L)
    assert(kept.count() > 0 && kept.count() < log.count())
  }

  test("per-site writer fans out one directory per site") {
    val dir = java.nio.file.Files.createTempDirectory("persite").toString
    Shaping.perSiteWrite(log, dir)
    val siteDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("site="))
    assert(siteDirs.length == 10)
  }

  test("per-site-nested splits long site names 2/2/2 — PerSitePath.cxx NestedSiteName") {
    import spark.implicits._
    val rows = Seq(
      ("alphabravo.example", 1L), // long → alphabravo.e/xa/mp/le
      ("site_0", 2L)) // len 6 < 7 → flat
      .toDF("site", "event_id")
    // path expression
    val paths = rows.select(col("site"),
      Shaping.nestedSitePath(col("site")).as("p")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(paths("alphabravo.example") == "alphabravo.e/xa/mp/le")
    assert(paths("site_0") == "site_0")
    // actual writer layout
    val dir = java.nio.file.Files.createTempDirectory("persiten").toString
    Shaping.perSiteWrite(rows, dir, nested = true)
    val deep = new java.io.File(
      s"$dir/p1=alphabravo.e/p2=xa/p3=mp/p4=le")
    assert(deep.isDirectory, s"nested levels missing under $dir")
    // short name falls back FLAT: part files directly under p1, no
    // __HIVE_DEFAULT_PARTITION__ placeholder levels
    val flat = new java.io.File(s"$dir/p1=site_0")
    assert(flat.isDirectory)
    assert(flat.listFiles().exists(_.getName.endsWith(".parquet")),
      s"expected part files directly under ${flat}")
    assert(!flat.listFiles().exists(_.getName.contains("HIVE_DEFAULT")),
      s"null placeholder levels under ${flat}")
  }

  test("--gzip encoding writes gzip-framed text that reads back whole") {
    val dir = java.nio.file.Files.createTempDirectory("gz").toString
    Shaping.textWrite(Shaping.oneLine(log), dir, gzip = true)
    val gz = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".txt.gz"))
    assert(gz.nonEmpty, "expected .txt.gz part files")
    assert(spark.read.text(dir).count() == log.count())
  }

  test("per-site-file puts a fixed leaf name under each site dir") {
    import spark.implicits._
    val rows = Seq(("site_a", 1L), ("site_b", 2L)).toDF("site", "event_id")
    val dir = java.nio.file.Files.createTempDirectory("persitef").toString
    Shaping.perSiteWrite(rows, dir, filename = Some("access.log"))
    assert(new java.io.File(s"$dir/p1=site_a/leaf=access.log").isDirectory)
    assert(new java.io.File(s"$dir/p1=site_b/leaf=access.log").isDirectory)
  }

  test("jsonl emits parseable objects with the FormatJson field set") {
    val j = Shaping.jsonl(log.limit(5)).collect().map(_.getString(1))
    assert(j.forall(_.startsWith("{\"time\":\"")))
    assert(j.forall(_.contains("\"site\":\"site_")))
    assert(j.forall(_.endsWith("\"}")))
  }

  test("top pages strips query and fragment, caps at n, orders by hits") {
    import spark.implicits._
    val rows = Seq(
      ("/a?x=1", 10L), ("/a?y=2", 5L), ("/a#frag", 1L),
      ("/b", 7L), ("/c?z", 2L))
      .toDF("uri", "traffic_sent")
    val got = Shaping.topPages(rows, n = 2).collect()
    assert(got.length == 2)
    assert(got(0).getString(0) == "/a" && got(0).getLong(1) == 3L &&
      got(0).getLong(2) == 16L)
    assert(got(1).getString(0) == "/b" && got(1).getLong(1) == 1L)
  }
}
