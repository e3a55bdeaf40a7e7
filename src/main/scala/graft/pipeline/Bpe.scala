package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Subword (BPE) tokenization — the terminal encoding a training-data
  * pipeline ships (Sennrich et al. 2016, "Neural Machine Translation
  * of Rare Words with Subword Units"). Two halves:
  *
  *  - [[learn]]: the trainer — iteratively merge the most frequent
  *    adjacent token pair over a word-frequency dictionary. Spark's
  *    role ([[bpeLearn]]) is reducing the corpus to that dictionary
  *    (one vocab-sized shuffle); the merge loop itself runs on the
  *    collected dictionary, which is capped and metadata-sized — the
  *    same driver-side shape every production BPE trainer uses
  *    (training state is vocabulary-, not corpus-, sized).
  *  - [[pretrained]]: a fixed merge list (learned once from the seed
  *    word distribution below, deterministically) applied at encode
  *    time by [[graft.functions.BpeEncodeExpr]] — a pure per-row map,
  *    no shuffle, scaling with input splits. [[bpeEncode]] /
  *    [[tokenizeIdsBpe]] gate it hash-exact against a DuckDB oracle
  *    that re-implements merge application as a recursive CTE over
  *    the distinct-word domain with the same merge list inlined.
  *
  * Encode-time semantics (shared by the expression, the oracle CTE
  * and the plain-Scala reference in BpeSpec): repeatedly apply the
  * lowest-ranked applicable merge at its leftmost occurrence until
  * none applies. See BpeEncodeExpr's doc for why this equals the
  * textbook merge-all-occurrences loop on any learned merge list.
  */
object Bpe {

  /** Seed word distribution for the pretrained tokenizer: the public
    * synthetic-corpus vocabulary (TESTDATA.md documents table) with
    * its observed frequencies — the "representative sample" a real
    * pipeline trains its shipped tokenizer on. A fixed literal so the
    * pretrained merge list is identical at every scale factor (the
    * oracle SQL inlines it; a scale-dependent list would unglue the
    * sf0.01 and sf1 gates).
    */
  val SeedCounts: Seq[(String, Long)] = Seq(
    "spark" -> 9182L, "window" -> 9159L, "merge" -> 9157L,
    "table" -> 9144L, "column" -> 9127L, "vector" -> 9119L,
    "stream" -> 9117L, "value" -> 9112L, "data" -> 9104L,
    "small" -> 9100L, "join" -> 9080L, "filter" -> 9063L,
    "big" -> 9057L, "group" -> 9040L, "hash" -> 9024L,
    "customer" -> 9017L, "sort" -> 9005L, "order" -> 8971L,
    "slow" -> 8960L, "line" -> 8951L, "part" -> 8929L,
    "fast" -> 8926L, "the" -> 8925L, "row" -> 8925L,
    "agg" -> 8912L, "key" -> 8893L, "query" -> 8881L,
    "a" -> 8877L, "scan" -> 8863L, "batch" -> 8829L,
    "dup" -> 255L)

  /** Merge count of the pretrained model: enough to fuse the frequent
    * stems while keeping multi-piece words (avg ~2 pieces/word on the
    * seed), so the encode gate exercises real merge chains rather
    * than a word-level lookup in disguise.
    */
  val NumMerges = 48

  /** Learn `nMerges` merge rules from a word-frequency dictionary.
    * Deterministic: best pair = max total count, ties broken by
    * (left, right) lexicographic; pair counts include overlapping
    * occurrences (the reference get_stats convention); merging is
    * left-to-right non-overlapping. Pairs seen fewer than 2 times
    * are never promoted to rules.
    */
  def learn(wordCounts: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] = wordCounts
      .sortBy(_._1)
      .map { case (w, c) => (w.map(_.toString).toArray, c) }
      .toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var go = true
    while (go && merges.size < nMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (toks, c) =>
        var i = 0
        while (i < toks.length - 1) {
          val p = (toks(i), toks(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      val best = counts.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, (p, c)) =>
          acc match {
            case Some((bp, bc)) if bc > c => acc
            case Some((bp, bc)) if bc == c &&
              (bp._1 < p._1 || (bp._1 == p._1 && bp._2 <= p._2)) => acc
            case _ => Some((p, c))
          }
      }
      best match {
        case Some((p, c)) if c >= 2 =>
          merges += p
          words = words.map { case (toks, cnt) => (mergeAll(toks, p), cnt) }
        case _ => go = false
      }
    }
    merges.toSeq
  }

  /** Left-to-right non-overlapping replacement of the pair in one
    * token sequence (the learner's merge step).
    */
  private[pipeline] def mergeAll(toks: Array[String], p: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < toks.length) {
      if (i < toks.length - 1 && toks(i) == p._1 && toks(i + 1) == p._2) {
        out += toks(i) + toks(i + 1); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toArray
  }

  /** The shipped merge list (rank order). */
  lazy val pretrained: Seq[(String, String)] = learn(SeedCounts, NumMerges)

  /** The shipped vocabulary: id 0 = OOV (a character outside the
    * base alphabet), 1–26 = 'a'–'z', then each DISTINCT merge output
    * in rank order (two merges can produce the same surface string
    * via different splits; first rank wins the id).
    */
  lazy val vocab: Seq[(String, Long)] = {
    val base = ('a' to 'z').zipWithIndex.map { case (c, i) =>
      (c.toString, (i + 1).toLong)
    }
    val seen = scala.collection.mutable.HashSet(base.map(_._1): _*)
    var next = base.size.toLong
    val merged = pretrained.flatMap { case (l, r) =>
      val s = l + r
      if (seen.add(s)) { next += 1; Some((s, next)) } else None
    }
    base ++ merged
  }

  // ---- queries (SparkEntry registry) ----

  /** `bpe_learn`: train a merge list FROM the corpus. The Spark part
    * is the dictionary reduction — explode to words, one vocab-sized
    * groupBy shuffle (map-side partial counts collapse each split to
    * its distinct words), cap to the top `maxWords` — and the merge
    * loop runs over that collected dictionary. Output: the learned
    * rule table (rank, left, right, merged). Rows-only at the driver
    * gate (DuckDB cannot express the iterative trainer); BpeSpec
    * gates the trainer against an independent naive implementation
    * and pins the pretrained list byte-for-byte.
    */
  def bpeLearn(spark: SparkSession, dir: String,
               nMerges: Int = NumMerges, maxWords: Int = 1 << 16): DataFrame = {
    val dict = Tables.documents(spark, dir)
      .select(explode(split(TextAnalysis.normText(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val rules = learn(dict, nMerges).zipWithIndex.map {
      case ((l, r), i) => ((i + 1).toLong, l, r, l + r)
    }
    import spark.implicits._
    rules.toDF("rank", "left", "right", "merged").orderBy("rank")
  }

  /** `bpe_encode`: the corpus encoded with the [[pretrained]] merge
    * list — one row per (document, piece position). Map-only: the
    * merge table rides the expression, encoding is a per-split scan
    * (the ORDER BY is gate presentation only).
    */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame =
    piecesOf(Tables.documents(spark, dir))
      .orderBy("doc_id", "pos")

  /** Exploded (doc_id, pos, piece) of any (doc_id, text) frame. */
  private[graft] def piecesOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(call_function("bpe_encode",
          TextAnalysis.normText(col("text")))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("piece"))

  /** `tokenize_ids_bpe`: [[bpeEncode]] pieces mapped to their
    * [[vocab]] ids (0 = OOV) — the subword analogue of
    * `tokenize_ids`, same exploded shape, consumed unchanged by the
    * pack/export chain. The id lookup is a broadcast join against the
    * vocab table (≤ alphabet + merges rows): per-split map at any
    * corpus size.
    */
  def tokenizeIdsBpe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = vocab.toDF("piece", "token_id")
    piecesOf(Tables.documents(spark, dir))
      .join(broadcast(v), Seq("piece"), "left")
      .select(col("doc_id"), col("pos"), col("piece"),
        coalesce(col("token_id"), lit(0L)).as("token_id"))
      .orderBy("doc_id", "pos")
  }

  // ---- oracle SQL fragments (DuckDB) ----

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** `(rank, l, r)` VALUES rows of the pretrained merge list. */
  def mergesValuesSql: String =
    pretrained.zipWithIndex.map { case ((l, r), i) =>
      s"(${i + 1}, ${sqlLit(l)}, ${sqlLit(r)})"
    }.mkString(", ")

  /** `(piece, vid)` VALUES rows of the shipped vocabulary. */
  def vocabValuesSql: String =
    vocab.map { case (p, id) => s"(${sqlLit(p)}, $id)" }.mkString(", ")

  /** The shared oracle CTE chain: BPE merge application as a
    * recursive CTE over the DISTINCT words of the normalised corpus
    * (each step applies the lowest-ranked merge at its leftmost
    * occurrence — the LATERAL picks (rank, position) minimal — and a
    * word leaves the recursion when NOT EXISTS any applicable merge),
    * joined back to word positions. Terminal relation `px`:
    * (doc_id, wpos, pi, piece). Embed under `WITH RECURSIVE`.
    */
  def encodeCteSql(normSql: String): String =
    s"nd AS (SELECT doc_id, $normSql AS txt FROM documents), " +
      "wd AS (SELECT doc_id, regexp_split_to_array(txt, ' ') AS ws FROM nd), " +
      "wp AS (SELECT doc_id, unnest(generate_series(1, len(ws))) AS wpos, " +
      "unnest(ws) AS w FROM wd), " +
      s"merges(rank, l, r) AS (VALUES $mergesValuesSql), " +
      "dw AS (SELECT DISTINCT w FROM wp WHERE len(w) > 0), " +
      "init AS (SELECT w, list_transform(range(1, length(w) + 1), i -> w[i]) AS toks FROM dw), " +
      "enc AS (SELECT w, toks FROM init " +
      "UNION ALL " +
      "SELECT e.w, e.toks[:bp.p-1] || [e.toks[bp.p] || e.toks[bp.p+1]] || e.toks[bp.p+2:] " +
      "FROM enc e, LATERAL (" +
      "SELECT i AS p FROM (SELECT unnest(range(1, len(e.toks))) AS i) t " +
      "JOIN merges m ON m.l = e.toks[i] AND m.r = e.toks[i+1] " +
      "ORDER BY m.rank, i LIMIT 1) bp), " +
      "fin AS (SELECT w, toks FROM enc e WHERE NOT EXISTS (" +
      "SELECT 1 FROM (SELECT unnest(range(1, len(e.toks))) AS i) t " +
      "JOIN merges m ON m.l = e.toks[i] AND m.r = e.toks[i+1])), " +
      "pc AS (SELECT w, unnest(generate_series(1, len(toks))) AS pi, " +
      "unnest(toks) AS piece FROM fin), " +
      "px AS (SELECT wp.doc_id, wp.wpos, pc.pi, pc.piece " +
      "FROM wp JOIN pc USING (w))"
}
