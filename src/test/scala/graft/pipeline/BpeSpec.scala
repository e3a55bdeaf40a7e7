package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gates for the BPE trainer/encoder against INDEPENDENT naive
  * implementations (functional-style, recomputed-from-scratch each
  * step — deliberately structured unlike the production imperative
  * code, so a mechanical bug in either can't hide in both):
  *
  *  - the naive trainer merges ALL occurrences of the best pair per
  *    step; the naive encoder is the textbook "find min-rank pair
  *    present, merge all its occurrences, repeat" loop. Production
  *    encode ([[graft.functions.BpeEncodeExpr]]) merges ONE leftmost
  *    occurrence per iteration — equality here is the proof of the
  *    equivalence argued in its doc comment.
  */
class BpeSpec extends SparkSpec {

  // ---- naive references ----

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
    go(wc.sortBy(_._1).map { case (w, c) => (w.map(_.toString).toList, c) }, Nil)
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
    go(w.map(_.toString).toList)
  }

  test("pretrained merge list matches the naive trainer on the seed counts") {
    assert(Bpe.pretrained.size == Bpe.NumMerges)
    assert(naiveLearn(Bpe.SeedCounts, Bpe.NumMerges) == Bpe.pretrained)
  }

  test("corpus-learned rules match the naive trainer on the same dictionary") {
    val dict = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(TextAnalysis.normText(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val got = Bpe.bpeLearn(spark, sf).collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
    assert(got.toSeq == naiveLearn(dict, Bpe.NumMerges))
  }

  test("expression encode equals the textbook merge-all loop, and round-trips") {
    import spark.implicits._
    val corpusWords = Bpe.SeedCounts.map(_._1)
    // fuzz beyond the corpus domain: unseen words, repeats (overlap
    // handling), single chars, a char outside the base alphabet
    val fuzz = Seq("aaaaaa", "erer", "partpart", "xyzzy", "q", "zz",
      "thethethe", "smallest", "windowing", "παρτ")
    val words = corpusWords ++ fuzz
    val got = words.toDF("w")
      .select(col("w"), call_function("bpe_encode", col("w")).as("p"))
      .collect().map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[String]](1).toList).toMap
    words.foreach { w =>
      assert(got(w) == naiveEncode(w, Bpe.pretrained), s"word: $w")
      assert(got(w).mkString == w, s"round trip: $w") // BPE never alters bytes
    }
  }

  test("vocab ids are unique, cover the alphabet and every merge output") {
    val ids = Bpe.vocab.map(_._2)
    assert(ids.distinct.size == ids.size)
    assert(Bpe.vocab.take(26).map(_._1) == ('a' to 'z').map(_.toString))
    val pieces = Bpe.vocab.map(_._1).toSet
    Bpe.pretrained.foreach { case (l, r) => assert(pieces(l + r)) }
  }

  test("tokenize_ids_bpe ids are consistent with the vocab and never OOV here") {
    val m = Bpe.vocab.toMap
    val rows = Bpe.tokenizeIdsBpe(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("token_id") == m(r.getAs[String]("piece")))
    }
  }
}
