package graft.functions

import graft.{SparkSpec, Tables}
import graft.pipeline.TextAnalysis
import org.apache.spark.sql.functions._

class MisraGriesSpec extends SparkSpec {

  /** Synthetic stream with known truth: 5 heavy items far above the
    * N/(cap+1) guarantee line plus a 5 000-item singleton tail that
    * forces constant counter exhaustion (the decrement path) and,
    * across partitions, the subtract-and-trim merge path.
    */
  private def skewed(parts: Int) = {
    import spark.implicits._
    val heavy = Seq("h1" -> 500, "h2" -> 400, "h3" -> 300, "h4" -> 250,
      "h5" -> 220).flatMap { case (s, n) => Seq.fill(n)(s) }
    val tail = (0 until 5000).map(i => s"t$i")
    // deterministic interleave (no RNG): round-robin by index hash
    val all = (heavy ++ tail).zipWithIndex
      .sortBy { case (s, i) => (i * 2654435761L + s.hashCode) & 0x7fffffffL }
      .map(_._1)
    all.toDF("term").repartition(parts)
  }

  test("misra-gries guarantee: items above N/(cap+1) always survive, " +
       "estimates under-count by at most N/(cap+1)") {
    val cap = 32
    for (parts <- Seq(1, 4, 13)) {
      val df = skewed(parts)
      val n = df.count()
      val bound = n / (cap + 1) // 6670/33 ≈ 202
      val summary = df.agg(graft.functions.misra_gries(col("term"), cap).as("mg"))
        .select(explode(col("mg")).as("c"))
        .select(col("c.item"), col("c.est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(summary.size <= cap, s"summary exceeds capacity: ${summary.size}")
      val truth = Map("h1" -> 500L, "h2" -> 400L, "h3" -> 300L,
        "h4" -> 250L, "h5" -> 220L)
      truth.foreach { case (item, cnt) =>
        if (cnt > bound) {
          assert(summary.contains(item),
            s"parts=$parts: heavy item $item (count $cnt > bound $bound) missing")
          // estimate never exceeds truth and under-counts by ≤ bound
          assert(summary(item) <= cnt, s"$item over-counted: ${summary(item)}")
          assert(summary(item) >= cnt - bound,
            s"$item estimate ${summary(item)} below $cnt - $bound")
        }
      }
    }
  }

  test("misra-gries is exact when capacity covers the domain") {
    import spark.implicits._
    val df = Seq.fill(7)("a").++(Seq.fill(3)("b")).++(Seq("c"))
      .toDF("term").repartition(3)
    val got = df.agg(graft.functions.misra_gries(col("term"), 16).as("mg"))
      .select(explode(col("mg")).as("c"))
      .select(col("c.item"), col("c.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 7L, "b" -> 3L, "c" -> 1L))
  }

  test("heavy hitters equals the exact full-shuffle top-k") {
    val got = TextAnalysis.heavyHitters(spark, sf01, cap = 64, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = Tables.documents(spark, sf01)
      .select(explode(split(TextAnalysis.normText(col("text")), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exact, s"got $got\nexact $exact")
  }

  test("heavy hitters recount stays exact when capacity forces decrements") {
    // cap far below the synthetic domain (5 005 items): MG candidates
    // are lossy, but every true top-k item is above the guarantee
    // line, so the recount still yields the exact top-k
    import spark.implicits._
    val df = skewed(7)
    val toks = df.select(col("term"))
    val cap = 32
    val cands = toks.agg(graft.functions.misra_gries(col("term"), cap).as("mg"))
      .select(explode(col("mg")).as("c"))
      .select(col("c.item").as("term"))
    val got = toks.join(broadcast(cands), Seq("term"), "left_semi")
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq("h1" -> 500L, "h2" -> 400L, "h3" -> 300L,
      "h4" -> 250L, "h5" -> 220L))
  }

  test("certification predicate: strict guarantee-line check") {
    // n=6670, cap=32 → bound ≈ 202: ck=220 certifies, ck=202 does not
    assert(TextAnalysis.mgCertified(found = 5, k = 5, ck = 220L,
      n = 6670L, cap = 32))
    assert(!TextAnalysis.mgCertified(found = 5, k = 5, ck = 202L,
      n = 6670L, cap = 32), "equality at the bound must NOT certify")
    assert(!TextAnalysis.mgCertified(found = 4, k = 5, ck = 9999L,
      n = 6670L, cap = 32), "fewer than k candidates must NOT certify")
  }

  test("escalation: an uncovering cap0 doubles until the answer is " +
       "self-certified, result equals the exact top-k") {
    // cap0=2 on the skewed stream: bound = n/3 ≈ 2223 > every true
    // count, so the k-th candidate can never certify — the loop must
    // escalate (2→4→…→32 certifies: 220·33 = 7260 > 6670) and still
    // return the exact answer
    val toks = skewed(7).select(col("term"))
    val got = TextAnalysis.heavyHittersOf(toks, cap0 = 2, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq("h1" -> 500L, "h2" -> 400L, "h3" -> 300L,
      "h4" -> 250L, "h5" -> 220L))
  }

  test("flat distribution past maxCap falls back to the exact groupBy") {
    // 3000 distinct singletons: ck=1 and 1·(cap+1) ≤ n for every cap
    // ≤ maxCap, so no cap certifies — the fixed-cap r9 form returned
    // whatever survived MG's evictions here; the self-certifying form
    // must detect the lapsed guarantee and produce the exact answer
    import spark.implicits._
    val toks = (0 until 3000).map(i => f"t$i%04d").toDF("term")
      .repartition(5)
    val got = TextAnalysis.heavyHittersOf(toks, cap0 = 8, k = 10,
        maxCap = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exact)
    assert(got.map(_._1) == (0 until 10).map(i => f"t$i%04d"))
  }
}
