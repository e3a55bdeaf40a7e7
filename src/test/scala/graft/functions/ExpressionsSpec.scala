package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpressionsSpec extends SparkSpec {

  test("rolling_hash matches the reference implementation (codegen path)") {
    import spark.implicits._
    val inputs = Seq("", "a", "hello world", "the quick brown fox", "ü§")
    val got = inputs.toDF("s")
      .select(rolling_hash(col("s"))).collect().map(_.getLong(0))
    assert(got.toSeq == inputs.map(RollingHash.hash))
  }

  test("rolling_hash known values") {
    assert(RollingHash.hash("") == 0L)
    assert(RollingHash.hash("a") == 97L)
    assert(RollingHash.hash("ab") == 97L * 257 + 98)
  }

  test("rolling_hash is rolling: prefix property over random strings") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val s = rnd.alphanumeric.take(rnd.nextInt(40)).mkString
      val c = rnd.alphanumeric.head
      var h = RollingHash.hash(s)
      c.toString.getBytes("UTF-8").foreach { b =>
        h = (h * RollingHash.Base + (b & 0xff)) % RollingHash.Mod
      }
      assert(RollingHash.hash(s + c) == h)
    }
  }

  test("rolling_hash is SQL-callable via GraftExtensions") {
    val r = spark.sql("SELECT rolling_hash('ab') AS h").head().getLong(0)
    assert(r == 97L * 257 + 98)
  }

  test("cosine_sim agrees with a plain-Scala implementation") {
    import spark.implicits._
    val a = Array(1.0, 2.0, 3.0)
    val b = Array(-1.0, 0.5, 2.0)
    val got = Seq((a, b)).toDF("a", "b")
      .select(cosine_sim(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(got - CosineSimilarity.cosine(a, b)) < 1e-15)
    // orthogonal / identical / zero
    assert(CosineSimilarity.cosine(Array(1.0, 0.0), Array(0.0, 1.0)) == 0.0)
    assert(math.abs(CosineSimilarity.cosine(a, a) - 1.0) < 1e-12)
    assert(CosineSimilarity.cosine(Array(0.0, 0.0), a.take(2)) == 0.0)
  }

  test("sorted_intersect_count equals array_intersect size on sorted sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 50).map { _ =>
      val a = (1 to rnd.nextInt(30)).map(_ => rnd.nextInt(40).toString)
        .distinct.sorted
      val b = (1 to rnd.nextInt(30)).map(_ => rnd.nextInt(40).toString)
        .distinct.sorted
      (a, b, a.toSet.intersect(b.toSet).size)
    }
    val got = rows.toDF("a", "b", "want")
      .select(sorted_intersect_count(col("a"), col("b")), col("want"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("cdc_chunks: content-defined boundaries survive a prefix insertion") {
    import graft.functions.{CdcChunks, RollingHash}
    import org.apache.spark.unsafe.types.UTF8String
    def chunkSet(s: String): Set[Long] =
      CdcChunks.chunks(s.getBytes("UTF-8"), 64, 24, 256)
        .toLongArray().toSet
    val base = (1 to 40).map(i => s"sentence number $i with some words").mkString(" ")
    val edited = "INSERTED PREFIX CONTENT! " + base
    val a = chunkSet(base)
    val b = chunkSet(edited)
    // most chunks must be shared despite the offset shift — the whole
    // point of content-defined (vs fixed-offset) chunking
    val shared = a.intersect(b).size.toDouble / a.size
    assert(shared >= 0.7, s"shared chunk ratio $shared")
    // chunk hashes concatenated must cover the text deterministically
    assert(chunkSet(base) == chunkSet(base))
    // degenerate input: one short chunk, equal to whole-string hash
    assert(chunkSet("tiny") == Set(RollingHash.hash("tiny")))
  }

  test("simhash_agg equals the declarative 64-sum formulation") {
    import spark.implicits._
    val toks = Seq((1L, "alpha"), (1L, "beta"), (1L, "alpha"), (2L, "gamma"),
      (2L, "delta"), (2L, "alpha"), (3L, "x"))
      .toDF("doc_id", "tok")
      .withColumn("h", xxhash64(col("tok")))
    val got = toks.groupBy("doc_id").agg(simhash_agg(col("h")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: explicit vote counting driver-side
    val rows = toks.select("doc_id", "h").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = rows.groupBy(_._1).map { case (d, hs) =>
      var sig = 0L
      (0 until 64).foreach { j =>
        val v = hs.map(h => if (((h._2 >>> j) & 1L) == 1L) 1 else -1).sum
        if (v > 0) sig |= (1L << j)
      }
      d -> sig
    }
    assert(got == want)
  }

  test("winnow_fps equals the SQL md5/array_min formulation exactly") {
    // the native expression must be value-identical to the SQL form
    // the DuckDB oracles mirror — per doc, per fingerprint, both ways
    def rel(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val native = rel(graft.pipeline.TextAnalysis.winnowFps(spark, sf01))
    val sql = rel(graft.pipeline.TextAnalysis.winnowFpsSql(spark, sf01))
    assert(native == sql,
      s"native-only=${(native -- sql).take(3)} sql-only=${(sql -- native).take(3)}")
    assert(native.nonEmpty)
    // edge cases the corpus may not cover: shorter-than-k text (one
    // whole-string gram), fewer grams than the window, empty string
    import spark.implicits._
    val edge = Seq((1L, "ab"), (2L, "abcdef"), (3L, ""), (4L, "abcdefghij"))
      .toDF("doc_id", "text")
    def edgeRel(fn: org.apache.spark.sql.Column) = edge
      .select(col("doc_id"), explode(fn).as("fp")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val nativeEdge = edgeRel(winnow_fps(col("text"), 5, 4))
    val sqlEdge = edgeRel(expr(
      """element_at(transform(array(
        |  transform(sequence(1, greatest(length(text) - 4, 1)),
        |    i -> substr(md5(substr(text, i, 5)), 1, 8))),
        |  h -> CASE WHEN size(h) >= 4 THEN
        |    array_distinct(transform(sequence(1, size(h) - 4 + 1),
        |      i -> array_min(slice(h, i, 4))))
        |  ELSE array(array_min(h)) END), 1)""".stripMargin))
    assert(nativeEdge == sqlEdge, s"$nativeEdge vs $sqlEdge")
  }

  test("bloom_agg: no false negatives ever, false positives rare at " +
       "10 bits/key, grouped build keys independent filters") {
    import spark.implicits._
    val n = 2000
    val rows = (0 until n).map(i => (i.toLong % 4, i.toLong * 37 + 5))
    val blooms = rows.toDF("g", "k")
      .groupBy("g").agg(bloom_agg(col("k"), 8192, 5).as("b"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(blooms.size == 4)
    // every inserted key may-contains in ITS group's filter
    rows.foreach { case (g, k) =>
      assert(BloomAgg.mayContain(blooms(g), k, 5), s"false negative $k")
    }
    // absent keys: false-positive rate stays near the analytic bound
    // (~(1-e^{-kn/m})^k ≈ 0.9% at n=500/group, m=8192, k=5)
    val fp = (0 until 5000).map(i => i.toLong * 37 + 6)
      .count(k => BloomAgg.mayContain(blooms(0L), k, 5))
    assert(fp < 250, s"$fp false positives of 5000")
    // string keys route through fnv64 identically on both sides
    val sb = Seq("alpha", "beta", "gamma").toDF("s")
      .agg(bloom_agg(col("s"), 4096, 4)).head().getAs[Array[Byte]](0)
    assert(BloomAgg.mayContain(sb, "alpha", 4))
    assert(BloomAgg.mayContain(sb, "beta", 4))
    assert(!BloomAgg.mayContain(sb, "delta-not-present-key", 4))
  }

  test("expressions stay inside whole-stage codegen") {
    // a real file scan (LocalRelation would constant-fold away);
    // execute first so AQE finalises the plan, then look for the
    // `*(n)` / WholeStageCodegen markers
    val df = graft.Tables.documents(spark, sf).select(rolling_hash(col("text")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan)
    assert(plan.contains("rolling_hash"), plan)
  }
}
