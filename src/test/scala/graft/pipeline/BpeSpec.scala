package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gates for the byte-level BPE trainer/encoder against INDEPENDENT
  * naive implementations (functional-style, recomputed-from-scratch
  * each step — deliberately structured unlike the production
  * incremental/imperative code, so a mechanical bug in either can't
  * hide in both):
  *
  *  - the naive trainer recomputes the full pair-statistics table per
  *    step and merges ALL occurrences of the best pair; production
  *    [[Bpe.learn]] maintains counts incrementally with an ordered
  *    set — equality proves the delta bookkeeping exact.
  *  - the naive encoder is the textbook "find min-rank pair present,
  *    merge all its occurrences, repeat" loop. Production encode
  *    ([[graft.functions.BpeEncodeExpr]]) merges ONE leftmost
  *    occurrence per iteration — equality here is the proof of the
  *    equivalence argued in its doc comment.
  *  - byte tokenization is re-derived independently here via
  *    String.format over getBytes, vs the production nibble table.
  */
class BpeSpec extends SparkSpec {

  // ---- naive references ----

  private def bytes(w: String): List[String] =
    w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => f"${b & 0xff}%02X").toList

  private def naiveMergeAll(toks: List[String], p: (String, String)): List[String] =
    toks match {
      case a :: b :: rest if (a, b) == p => (a + b) :: naiveMergeAll(rest, p)
      case a :: rest => a :: naiveMergeAll(rest, p)
      case Nil => Nil
    }

  private def naiveLearn(wc: Seq[(String, Long)], n: Int): Seq[(String, String)] = {
    @annotation.tailrec
    def go(words: Seq[(List[String], Long)],
           acc: List[(String, String)]): List[(String, String)] =
      if (acc.size == n) acc.reverse
      else {
        val stats = words
          .flatMap { case (toks, c) => toks.sliding(2).collect {
            case a :: b :: Nil => ((a, b), c) } }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        if (stats.isEmpty) acc.reverse
        else {
          // max count, ties to the lexicographically smallest pair
          val best = stats.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
          if (best._2 < 2) acc.reverse
          else go(words.map { case (t, c) => (naiveMergeAll(t, best._1), c) },
            best._1 :: acc)
        }
      }
    go(wc.sortBy(_._1).map { case (w, c) => (bytes(w), c) }, Nil)
  }

  private def naiveEncode(w: String, merges: Seq[(String, String)]): List[String] = {
    val rank = merges.zipWithIndex.toMap
    @annotation.tailrec
    def go(toks: List[String]): List[String] = {
      val present = toks.sliding(2).collect {
        case a :: b :: Nil if rank.contains((a, b)) => (a, b)
      }.toSeq
      if (present.isEmpty) toks
      else go(naiveMergeAll(toks, present.minBy(rank)))
    }
    go(bytes(w))
  }

  // a dictionary with real structure: shared stems, prefixes, UTF-8
  // multi-byte words, digits — Zipf-ish counts
  private val fixtureDict: Seq[(String, Long)] = Seq(
    "spark" -> 900L, "sparkle" -> 120L, "sparse" -> 80L, "window" -> 700L,
    "windows" -> 150L, "merge" -> 650L, "merger" -> 60L, "naïve" -> 300L,
    "café" -> 280L, "日本語" -> 240L, "привет" -> 200L, "tokens123" -> 90L,
    "2048" -> 170L, "a" -> 999L, "the" -> 950L, "über" -> 130L)

  test("incremental learner equals the naive recompute-per-step trainer") {
    // corpus dictionary (the production path's own reduction)
    val dict = Bpe.dictOf(spark, sf, Bpe.TrainMaxWords)
    assert(Bpe.learn(dict, Bpe.MergeBudget) ==
      naiveLearn(dict, Bpe.MergeBudget))
    // UTF-8 fixture at a few budgets incl. saturation
    Seq(5, 37, 4096).foreach { n =>
      assert(Bpe.learn(fixtureDict, n) == naiveLearn(fixtureDict, n),
        s"budget $n")
    }
  }

  test("incremental learner equals naive at mid scale (hundreds of " +
       "words, hundreds of merges)") {
    // deterministic synthetic dictionary: syllable products give
    // shared substructure so merges chain deep
    val syll = Seq("ba", "re", "to", "mi", "ka", "su", "ne", "lo")
    val words = for (a <- syll; b <- syll; c <- syll.take(5))
      yield a + b + c
    val dict = words.zipWithIndex.map { case (w, i) =>
      w -> (2L + (i * 37 % 211))
    }
    assert(dict.size == 320)
    // the fixture saturates at 362 merges; 300 keeps the budget the
    // binding constraint so deep merge chains are exercised
    val got = Bpe.learn(dict, 300)
    assert(got == naiveLearn(dict, 300))
    assert(got.size == 300, "mid-scale corpus must not saturate early")
  }

  test("corpus-trained model: bpe_learn matches naive, persists, and " +
       "the budget is the stop condition only at saturation") {
    val dict = Bpe.dictOf(spark, sf, Bpe.TrainMaxWords)
    val got = Bpe.bpeLearn(spark, sf).collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
    assert(got.toSeq == naiveLearn(dict, Bpe.MergeBudget))
    // the toy corpus saturates below budget: every corpus word ends
    // single-token, so merge count == total bytes - distinct words
    assert(got.nonEmpty && got.length < Bpe.MergeBudget)
    // persisted artifact equals the in-memory model
    val rules = spark.read.parquet(s"${Bpe.StorePath}/rules")
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("l"), r.getAs[String]("r")))
    assert(rules.toSeq == got.toSeq)
  }

  test("expression encode equals the textbook merge-all loop, and " +
       "round-trips bytes — UTF-8 never degrades to OOV") {
    import spark.implicits._
    val rules = Bpe.learn(fixtureDict, 64)
    val corpusWords = fixtureDict.map(_._1)
    // fuzz beyond the trained domain: unseen words, repeats (overlap
    // handling), single bytes, emoji (4-byte UTF-8), mixed scripts
    val fuzz = Seq("aaaaaa", "erer", "sparkspark", "xyzzy", "q", "zz",
      "thethethe", "smallest", "windowing", "παρτ", "naïveté", "🙂ok",
      "日本語です", "x")
    val words = corpusWords ++ fuzz
    val got = words.toDF("w")
      .select(col("w"), graft.functions.bpe_encode(col("w"), rules).as("p"))
      .collect().map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[String]](1).toList).toMap
    words.foreach { w =>
      assert(got(w) == naiveEncode(w, rules), s"word: $w")
      // BPE never alters bytes: concatenated pieces = the word's hex
      assert(got(w).mkString == bytes(w).mkString, s"round trip: $w")
    }
  }

  test("vocab ids are unique, cover the byte alphabet and every merge " +
       "output; id 0 is never assigned") {
    val rules = Bpe.learn(fixtureDict, 64)
    val vocab = Bpe.vocabOf(rules)
    val ids = vocab.map(_._2)
    assert(ids.distinct.size == ids.size)
    assert(!ids.contains(0L))
    assert(vocab.take(256).map(_._1) ==
      (0 until 256).map(b => f"$b%02X"))
    assert(vocab.take(256).map(_._2) == (1L to 256L))
    val pieces = vocab.map(_._1).toSet
    rules.foreach { case (l, r) => assert(pieces(l + r)) }
  }

  test("tokenize_ids_bpe ids are consistent with the model vocab and " +
       "never 0 (byte-level has no OOV)") {
    val m = Bpe.model(spark, sf).vocab.toMap
    val rows = Bpe.tokenizeIdsBpe(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("token_id") == m(r.getAs[String]("piece")))
      assert(r.getAs[Long]("token_id") > 0L)
    }
  }
}
