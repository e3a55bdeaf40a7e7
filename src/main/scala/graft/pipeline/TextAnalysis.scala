package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.rolling_hash

/** Text-analysis operators for a training-data pipeline (SURVEY §2E):
  * exact dedup, language ID, quality scoring, token counting,
  * fingerprinting. All pure column expressions (codegen'd, no UDFs),
  * all embarrassingly parallel — per-row transforms followed by at
  * most one aggregation, so they scale linearly with input splits.
  *
  * Ratio outputs use `floor(10000 * x / y)` basis points: double
  * division is IEEE-identical on both engines and floor avoids the
  * engine-specific rounding of cast-to-int (Spark truncates, DuckDB
  * rounds).
  */
object TextAnalysis {

  /** Whitespace-collapsed, trimmed, lower-cased text — the
    * normalisation key for exact dedup.
    */
  def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** The full crawl-cleanup normalisation chain (C4-style), applied in
    * a fixed order so the result is reproducible across engines:
    *  1. un-wrap soft line breaks (`-\n` hyphenation → joined word);
    *  2. map typographic quotes to ASCII (`translate`, 1:1);
    *  3. replace C0 control chars + DEL with a space;
    *  4. collapse whitespace runs, trim, lower-case.
    * Every step is a codegen'd built-in (regexp_replace / translate),
    * expressible identically in the DuckDB oracle (RE2 and Java regex
    * agree on these classes), and a pure per-row map — the 100 TB
    * shape is one scan, zero shuffles.
    */
  def normalizeChain(c: Column): Column =
    normText(regexp_replace(
      translate(regexp_replace(c, "-\n", ""),
        "’‘“”", "''\"\""),
      "[\\x00-\\x1f\\x7f]", " "))

  /** `text_normalize`: the [[normalizeChain]] over the corpus, with
    * before/after char counts so a curation run can report how much
    * the cleanup removed.
    */
  def textNormalize(spark: SparkSession, dir: String): DataFrame =
    textNormalizeOf(Tables.documents(spark, dir)).orderBy("doc_id")

  /** The normalisation projection over a batch table or an arriving
    * stream alike (shared expression tree — batch gate covers both).
    */
  private[graft] def textNormalizeOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        normalizeChain(col("text")).as("norm_text"),
        length(col("text")).cast("long").as("n_chars_raw"))
      .withColumn("n_chars_norm", length(col("norm_text")).cast("long"))

  /** Exact deduplication: md5 over normalised text; one row per
    * distinct content hash with the representative (min doc_id) and
    * multiplicity. Hash-groupBy: one shuffle on the 32-hex key,
    * perfectly uniform — the canonical 100 TB exact-dedup shape.
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(normText(col("text"))).as("content_hash"))
      .groupBy("content_hash")
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("content_hash")

  /** Marker words per language for the n-gram/stopword language-ID
    * heuristic. Counting uses padded occurrences of ` word ` so the
    * same regex-free expression exists on both engines.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "und", "die"),
    "es" -> Seq("el", "que", "los"),
    "fr" -> Seq("le", "et", "les"))

  private def markerCount(text: Column, words: Seq[String]): Column =
    words.map { w =>
      // occurrences of " w " in " text ": (len - len(removed)) / (len(w)+2)
      val padded = concat(lit(" "), text, lit(" "))
      (length(padded) - length(regexp_replace(padded, s"\\s$w\\s", ""))) /
        lit(w.length + 2)
    }.reduce(_ + _).cast("long")

  /** Language identification: count language-marker stopwords, pick
    * the argmax (ties → first language in [[langMarkers]] order, 'und'
    * if no markers at all). Heuristic by design — the reference point
    * is an n-gram/stopword classifier, not a model.
    */
  def langId(spark: SparkSession, dir: String): DataFrame =
    langIdOf(Tables.documents(spark, dir))

  /** [[langId]] over any (doc_id, lang, text) DataFrame. */
  def langIdOf(docs: DataFrame): DataFrame = {
    val txt = normText(col("text"))
    val scored = docs
      .select(col("doc_id") +: col("lang").as("actual_lang") +:
        langMarkers.map { case (l, ws) => markerCount(txt, ws).as(s"c_$l") }: _*)
    val best = langMarkers.map { case (l, _) => col(s"c_$l") }
      .reduce((a, b) => when(a >= b, a).otherwise(b))
    val pred = langMarkers.foldRight(lit("und")) { case ((l, _), elseCol) =>
      when(col(s"c_$l") === best && best > 0, lit(l)).otherwise(elseCol)
    }
    // foldRight gives priority to the FIRST language that attains the max
    scored.withColumn("pred_lang", pred)
      .select("doc_id", "actual_lang", "pred_lang")
      .orderBy("doc_id")
  }

  /** Document quality signals: char/token counts, punctuation and
    * stopword ratios (basis points), mean token length.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_measured"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
        regexp_count(col("text"), lit("[.,!?;:]")).cast("long").as("n_punct"),
        regexp_count(concat(lit(" "), normText(col("text")), lit(" ")),
          lit(" (the|a|of|and|to|is|in) ")).cast("long").as("n_stop"))
      .withColumn("punct_bp",
        floor(lit(10000.0) * col("n_punct") / col("n_chars_measured")).cast("long"))
      .withColumn("stop_bp",
        floor(lit(10000.0) * col("n_stop") / col("n_tokens")).cast("long"))
      .orderBy("doc_id")

  /** The distinct-stopword presence list for [[gopherRules]] — the
    * Gopher "must contain at least two of" rule's word set.
    */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style rule filter (Rae et al. 2021 §A1.1, adapted to the
    * corpus): the document-shape heuristics a pretraining pipeline
    * applies BEFORE any model-based scoring — word count bounds, mean
    * word length window, alphabetic-word fraction, symbol-to-word
    * ratio, and distinct-stopword presence. Each rule emits its
    * metric plus the composed `ok` verdict, so downstream can both
    * filter and audit which rule fired.
    *
    * Exactness: counts are integers; ratios are
    * `floor(k · a / b)` basis-point/centi-unit doubles (IEEE-
    * identical both engines per this file's convention). Pure map —
    * no shuffle, embarrassingly parallel at any scale.
    */
  def gopherRules(spark: SparkSession, dir: String): DataFrame =
    gopherRulesOf(Tables.documents(spark, dir)).orderBy("doc_id")

  /** [[gopherRules]] over any (doc_id, text) DataFrame — unsorted,
    * so the ingest-time streaming form
    * ([[graft.streaming.StreamOps.gopherRulesStream]]) can share the
    * same expression tree (a streaming plan cannot carry a sort).
    */
  def gopherRulesOf(docs: DataFrame): DataFrame = {
    val t = trim(col("text"))
    val words = split(t, "\\s+")
    val nWords = size(words).cast("long")
    // total word chars = text minus whitespace (portable, no explode)
    val nChars = length(regexp_replace(t, "\\s+", "")).cast("long")
    val nAlpha = size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long")
    val nSym = regexp_count(t, lit("#|\\.\\.\\.")).cast("long")
    val padded = concat(lit(" "), normText(col("text")), lit(" "))
    val stopKinds = gopherStopwords
      .map(w => when(instr(padded, s" $w ") > 0, 1L).otherwise(0L))
      .reduce(_ + _)
    docs.select(
        col("doc_id"),
        nWords.as("n_words"),
        floor(lit(100.0) * nChars / nWords).cast("long").as("mwl_c100"),
        floor(lit(10000.0) * nAlpha / nWords).cast("long").as("alpha_bp"),
        floor(lit(10000.0) * nSym / nWords).cast("long").as("sym_bp"),
        stopKinds.cast("long").as("n_stop_kinds"))
      .withColumn("ok",
        when(col("n_words").between(10L, 100000L) &&
          col("mwl_c100").between(300L, 1000L) &&
          col("alpha_bp") >= 8000L &&
          col("sym_bp") <= 1000L &&
          col("n_stop_kinds") >= 2L, 1L).otherwise(0L))
  }

  /** Token counting: whitespace tokens and a BPE-ish alnum-run count
    * (`[A-Za-z0-9]+` matches — the pre-tokenizer split most BPE vocabs
    * use). Both regexes are dialect-portable (Java / RE2).
    */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("ws_tokens"),
        regexp_count(col("text"), lit("[A-Za-z0-9]+")).cast("long").as("re_tokens"))
      .orderBy("doc_id")

  /** Per-document token diversity as the Gini–Simpson index
    * `1 − Σ_t (tf/dl)²` — the rational cousin of unigram entropy
    * (entropy's `ln` is libm-divergent across engines; Simpson is a
    * pure integer rational, so the gate is exact). High values =
    * diverse vocabulary; low values = a few tokens dominate —
    * template/spam pages score low even when [[repetitionScore]]'s
    * max-based signals look fine, because Simpson weighs the WHOLE
    * frequency distribution, not just the top item. The companion
    * `eff_vocab_micro` (inverse Simpson, `dl²/Σtf²`) reads as the
    * "effective vocabulary size" in micro-units.
    *
    * Plan: one explode → per-(doc, term) count → per-doc sum. Both
    * aggregations partial-merge map-side; no joins, no transcendental
    * — linear in corpus tokens at any scale.
    */
  def tokenDiversity(spark: SparkSession, dir: String): DataFrame =
    tokenDiversityOf(Tables.documents(spark, dir))

  /** [[tokenDiversity]] over any (doc_id, text) DataFrame. */
  def tokenDiversityOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(split(normText(col("text")), " ")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("long").as("tf"))
      .groupBy("doc_id")
      .agg(sum("tf").as("dl"),
        sum(col("tf") * col("tf")).as("s2"),
        count(lit(1)).cast("long").as("n_distinct"))
      .select(col("doc_id"), col("dl"), col("n_distinct"),
        expr("(dl * dl - s2) * 1000000L div (dl * dl)")
          .as("gini_simpson_micro"),
        expr("dl * dl * 1000000L div s2").as("eff_vocab_micro"))
      .orderBy("doc_id")

  /** Intra-document repetition signals — the pretraining quality rule
    * family that [[qualityScore]]'s surface ratios don't cover:
    * duplicate-word fraction and top-bigram fraction (a document
    * dominated by one repeated phrase is boilerplate/spam even when
    * its punctuation looks fine). All exact integer/basis-point math.
    *
    * Shape: one explode to bigram rows + two aggregations keyed by
    * doc_id — linear, partial-aggregatable, no joins. Documents with
    * fewer than 2 words have no bigrams and are OMITTED (the guard
    * matters: `sequence(1, 0)` is DESCENDING in Spark and the
    * resulting element_at(ws, 0) throws under ANSI mode; the DuckDB
    * oracle's `range(1, 1)` is empty and omits the doc the same way).
    */
  def repetitionScore(spark: SparkSession, dir: String): DataFrame =
    repetitionScoreOf(Tables.documents(spark, dir))

  /** [[repetitionScore]] over any (doc_id, text) DataFrame. */
  def repetitionScoreOf(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("doc_id"), split(normText(col("text")), " ").as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        size(array_distinct(col("ws"))).cast("long").as("n_distinct"),
        col("ws"))
    val bigrams = base.select(col("doc_id"), col("n_words"), col("n_distinct"),
      explode(expr("CASE WHEN size(ws) >= 2 THEN " +
        "transform(sequence(1, size(ws) - 1), " +
        "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1))) " +
        "ELSE array() END")).as("bg"))
    bigrams
      .groupBy("doc_id", "n_words", "n_distinct", "bg")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "n_words", "n_distinct")
      .agg(max("c").as("top_bg"), sum("c").as("n_bg"))
      .select(col("doc_id"), col("n_words"),
        floor(lit(10000.0) * (col("n_words") - col("n_distinct")) / col("n_words"))
          .cast("long").as("dup_word_bp"),
        floor(lit(10000.0) * col("top_bg") / col("n_bg"))
          .cast("long").as("top_bigram_bp"))
      .orderBy("doc_id")
  }

  /** Document fingerprint via the native [[graft.functions.RollingHash]]
    * expression over normalised text.
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), rolling_hash(normText(col("text"))).as("fp"))
      .orderBy("doc_id")

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003):
    * hash every `k`-gram, keep the MINIMUM hash of each sliding window
    * of `w` — the guarantee is that any substring match of length ≥
    * k + w − 1 between two documents shares at least one fingerprint,
    * at ~2/(w+1) sampling density. THE local fingerprinting scheme for
    * partial-copy detection: the emitted (doc_id, fp) pairs feed the
    * same inverted-index join as [[Dedup.cdcPairsOf]]'s chunks.
    * Hashes are md5 prefixes here (portable to the oracle;
    * [[graft.functions.RollingHash]] is the native scale path). Pure
    * per-row array expressions — no explode until the final
    * fingerprint set, no UDF. Documents with fewer than `w` grams
    * yield their single minimum (the whole doc is one window).
    */
  def fingerprintWinnow(spark: SparkSession, dir: String,
                        k: Int = 5, w: Int = 4): DataFrame =
    winnowFps(spark, dir, k, w).orderBy("doc_id", "fp")

  /** [[fingerprintWinnow]] without the presentation sort — the
    * join-input form ([[Dedup.winnowPairs]] consumes this; a sort
    * feeding a shuffle would be thrown away work).
    */
  def winnowFps(spark: SparkSession, dir: String,
                k: Int = 5, w: Int = 4): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), normText(col("text")).as("txt"))
      .select(col("doc_id"),
        explode(graft.functions.winnow_fps(col("txt"), k, w)).as("fp"))

  /** The SQL formulation [[winnowFps]]'s native expression replaced —
    * kept as the equality reference (FunctionsSpec asserts the two
    * produce identical (doc_id, fp) relations; the DuckDB oracle
    * mirrors THIS form). One full md5() evaluation per character per
    * document plus per-window slice arrays — ~3× the native
    * expression's cost at sf1.
    */
  def winnowFpsSql(spark: SparkSession, dir: String,
                   k: Int = 5, w: Int = 4): DataFrame = {
    // the gram-hash array is BOUND through a lambda variable (`h`):
    // referencing a withColumn alias 3 times lets the optimizer
    // substitute the whole 100s-of-elements transform tree into every
    // reference, and rule iteration over the duplicated trees hangs
    // the planner (observed). A lambda variable is a cheap reference.
    val winnow =
      s"""element_at(transform(array(
         |  transform(sequence(1, greatest(length(txt) - ${k - 1}, 1)),
         |    i -> substr(md5(substr(txt, i, $k)), 1, 8))),
         |  h -> CASE WHEN size(h) >= $w THEN
         |    array_distinct(transform(sequence(1, size(h) - $w + 1),
         |      i -> array_min(slice(h, i, $w))))
         |  ELSE array(array_min(h)) END), 1)""".stripMargin
    Tables.documents(spark, dir)
      .select(col("doc_id"), normText(col("text")).as("txt"))
      .select(col("doc_id"), explode(expr(winnow)).as("fp"))
  }

  /** Per-document DISTINCT terms — the (doc, term) incidence relation
    * [[tokenDfScore]] aggregates. ([[tfidfTopTerms]] deliberately does
    * NOT use this: tf needs duplicate occurrences, so it explodes
    * without array_distinct — folding it onto this relation would
    * silently pin every tf to 1.) One explode, no UDF; at 100 TB this
    * is the classic inverted-index build shape (shuffle on term is the
    * only wide dependency downstream).
    */
  private def docTerms(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(array_distinct(split(normText(col("text")), " ")))
          .as("term"))

  /** Document-frequency scoring: how "common" a document's vocabulary
    * is — mean corpus document-frequency of its distinct terms, in
    * exact integer micro-units. Low scores flag rare-vocabulary
    * (often noisy/non-lingual) documents; the integer formulation
    * (`sum_df × 1e6 div n_terms`) is division-free float-safe algebra
    * shared with the oracle. Shapes: one groupBy(term) for df, one
    * shuffle join back on term (vocabulary-sized build side), one
    * groupBy(doc). A df table is Zipf-skewed — stop words are hot
    * keys — but the join's probe side is (doc, term) pairs, which
    * AQE skew-split handles; the aggregates are partial-aggregated
    * map-side.
    */
  def tokenDfScore(spark: SparkSession, dir: String): DataFrame = {
    val dt = docTerms(spark, dir)
    val dfr = dt.groupBy("term").agg(count(lit(1)).as("df"))
    dt.join(dfr, "term")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("df").as("sum_df"))
      .withColumn("df_score_micro",
        expr("sum_df * 1000000 div n_terms"))
      .orderBy("doc_id")
  }

  /** Bigram fluency: mean corpus document-frequency of a document's
    * bigram occurrences, in exact integer micro-units — the
    * two-token sibling of [[tokenDfScore]] and the poor man's
    * language-model score (text whose word PAIRS recur across the
    * corpus reads as fluent; rare-bigram text is disfluent or
    * scrambled even when its unigrams are common). Documents with
    * fewer than 2 words have no bigrams and are OMITTED — same CASE
    * guard as [[repetitionScoreOf]] (`sequence(1, 0)` is DESCENDING
    * in Spark and would throw under ANSI).
    */
  def bigramFluency(spark: SparkSession, dir: String): DataFrame = {
    val bg = Tables.documents(spark, dir)
      .select(col("doc_id"), split(normText(col("text")), " ").as("ws"))
      .select(col("doc_id"),
        explode(expr("CASE WHEN size(ws) >= 2 THEN " +
          "transform(sequence(1, size(ws) - 1), " +
          "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1))) " +
          "ELSE array() END")).as("bg"))
    val dfr = bg.select(col("doc_id"), col("bg")).distinct()
      .groupBy("bg").agg(count(lit(1)).as("df"))
    bg.join(dfr, "bg")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("df").as("sum_df"))
      .withColumn("lm_score_micro",
        expr("sum_df * 1000000 div n_bigrams"))
      .orderBy("doc_id")
  }

  /** Per-document most-distinctive terms: top-k by (tf DESC, df ASC,
    * term ASC) — the division-free stand-in for tf-idf ranking
    * (log(N/df) is float and engine-divergent; the lexicographic
    * (tf, −df) order is exact and agrees with tf·idf whenever tf
    * dominates). The rank window is a grouped top-k, which
    * [[graft.plans.TopKPerGroup]] executes as bounded heaps instead
    * of a per-doc sort.
    */
  def tfidfTopTerms(spark: SparkSession, dir: String,
                    k: Int = 3): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(split(normText(col("text")), " ")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val dfr = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(dfr, "term")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "term", "tf", "df")
      .orderBy("doc_id", "rank")
  }

  /** Keyword retrieval: top-`k` documents for a query term set,
    * ranked by an exact-integer tf·idf score — the query-driven
    * selection pass a curation pipeline runs to pull topical subsets
    * out of the corpus. Score = Σ_t tf(t,d) · (N div df(t)): the
    * integer N/df idf surrogate is division-free and engine-identical
    * (log-idf is float and engine-divergent) while staying monotone
    * in 1/df, which is all the ranking needs.
    *
    * Plan shape: the exploded (doc, term) stream is filtered to the
    * literal query terms AT THE SCAN STAGE (an `isin` over a handful
    * of strings — non-matching tokens never leave the stage), df is
    * a |terms|-row broadcast agg over those survivors, and the final
    * ranking is a global top-k (`TakeOrderedAndProject` — no full
    * sort). Corpus size N enters as a literal: one count — the same
    * table-stats lookup a real catalog serves.
    */
  def keywordSearch(spark: SparkSession, dir: String,
                    terms: Seq[String] = Seq("spark", "table", "window"),
                    k: Int = 25): DataFrame =
    keywordSearchOf(Tables.documents(spark, dir), terms, k)

  /** [[keywordSearch]] over any (doc_id, text) DataFrame. */
  def keywordSearchOf(docs: DataFrame, terms: Seq[String],
                      k: Int): DataFrame = {
    val n = docs.count()
    val tf = docs
      .select(col("doc_id"),
        explode(split(normText(col("text")), " ")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    // df via a whole-partition window on the SURVIVOR relation (only
    // docs containing query terms) — a tf.groupBy("term") self-join
    // would recompute the corpus scan+explode subtree twice, and at
    // 100 TB the scan is the cost; the window shuffles the tiny
    // filtered relation instead
    tf.withColumn("df",
        count(lit(1)).over(Window.partitionBy("term")))
      .groupBy("doc_id")
      .agg(sum(col("tf") * expr(s"${n}L div df")).as("score"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Context-window chunking: split each document's whitespace-token
    * stream into fixed-size windows of `win` tokens advancing by
    * `stride` (overlap = win − stride carries context across chunk
    * boundaries) — the transform that turns raw documents into
    * training-context-sized sequences. Chunk `i` covers tokens
    * `[i·stride, i·stride+win)` clamped to the document, for
    * `i ∈ [0, ceil(max(0, n−win)/stride)]` — every token appears in
    * ≥1 chunk, a short document yields exactly one chunk, and the
    * content of every chunk is hash-attested (`chunk_hash` over the
    * space-joined token window), so the gate checks the actual
    * chunk text, not just counts.
    *
    * Plan shape: pure per-row explode of a computed index sequence —
    * no shuffle, no state, embarrassingly parallel; output grows by
    * ~n/stride rows per doc. `slice` clamps at the document tail in
    * both engines, so the last chunk may be shorter (its `n_toks`
    * says by how much).
    */
  def chunkDocs(spark: SparkSession, dir: String,
                win: Int = 64, stride: Int = 48): DataFrame = {
    require(stride > 0 && win >= stride, "need 0 < stride <= win")
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("chunk_id", explode(sequence(lit(0L),
        expr(s"(greatest(n - ${win}L, 0L) + ${stride - 1}L) div ${stride}L"))))
      .withColumn("ctoks",
        slice(col("toks"), (col("chunk_id") * stride + 1).cast("int"), lit(win)))
      .select(col("doc_id"), col("chunk_id"),
        size(col("ctoks")).cast("long").as("n_toks"),
        md5(array_join(col("ctoks"), " ")).as("chunk_hash"))
      .orderBy("doc_id", "chunk_id")
  }

  /** The per-term BM25 contribution in micro-units, as one SQL
    * expression string over columns `tf` (term frequency), `df`
    * (document frequency), `dl` (document length in tokens) and the
    * corpus scalars `n` (doc count) / `dtot` (total tokens) — built
    * here so the Spark plan (scalars inlined as literals) and the
    * DuckDB oracle (scalars as CTE columns) evaluate the IDENTICAL
    * operation tree and agree bit-for-bit.
    *
    * BM25 (Robertson–Spärck Jones, k1=1.2, b=0.75) made exactly
    * reproducible:
    *  - TF saturation `tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` is a
    *    RATIONAL in (tf, dl, n, dtot): multiply through by `10·dtot`
    *    → `22·tf·dtot / (10·tf·dtot + 3·dtot + 9·dl·n)` — integer
    *    operands only;
    *  - log-IDF is transcendental (libm-divergent across engines), so
    *    the probabilistic-IDF rational surrogate
    *    `(N−df+0.5)/(df+0.5) = (2N−2df+1)/(2df+1)` replaces it —
    *    exact integers, the same monotone-in-1/df damping;
    *  - each double op (int→double conversions under 2^53, products,
    *    the division) is IEEE-correctly-rounded, so with one shared
    *    association order both engines produce the same bits;
    *  - `round(1e6·x)` quantizes to BIGINT micro-units, making the
    *    per-document SUM integer — order-free, safe under Spark's
    *    nondeterministic aggregation order.
    *
    * Validity bound: operands stay exact below 2^53 — with dl ≤ 10⁴
    * that holds to ~10¹² total corpus tokens; beyond that, divide
    * `dtot` out first (`9·dl·n/dtot = 9·dl/avgdl`) at a ulp of
    * reproducibility cost.
    */
  def bm25MicroSql(n: String, dtot: String): String =
    s"CAST(round((1000000.0 * ((22.0 * tf * $dtot) * (2 * $n - 2 * df + 1))) / " +
      s"((10.0 * tf * $dtot + 3.0 * $dtot + 9.0 * dl * $n) * (2 * df + 1))) AS BIGINT)"

  /** BM25 top-`k` retrieval — [[keywordSearch]]'s ranking upgraded
    * with document-length normalisation and TF saturation, still in
    * exactly-reproducible integer algebra (see [[bm25MicroSql]]).
    *
    * Plan shape matches [[keywordSearchOf]]: term filter at the scan
    * stage, df via a tiny window over the survivor relation, corpus
    * scalars (N, Σdl) from one agg (at production scale: the
    * `corpus_stats` manifest), final global top-k via
    * `TakeOrderedAndProject`. One corpus scan for the scalars + one
    * for the tf stream — both linear, no self-join of the scan.
    */
  def bm25TopK(spark: SparkSession, dir: String,
               terms: Seq[String] = Seq("spark", "table", "window"),
               k: Int = 25): DataFrame =
    bm25TopKOf(Tables.documents(spark, dir), terms, k)

  /** [[bm25TopK]] over any (doc_id, text) DataFrame. */
  def bm25TopKOf(docs: DataFrame, terms: Seq[String],
                 k: Int): DataFrame = {
    val toks = docs.select(col("doc_id"),
        split(normText(col("text")), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        col("toks"))
    val scalars = toks
      .agg(count(lit(1)).cast("long"), sum("dl").cast("long")).head()
    val n = scalars.getLong(0)
    val dTot = scalars.getLong(1)
    val tf = toks
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).cast("long").as("tf"))
    tf.withColumn("df",
        count(lit(1)).over(Window.partitionBy("term")).cast("long"))
      .withColumn("s_micro", expr(bm25MicroSql(n.toString, dTot.toString)))
      .groupBy("doc_id")
      .agg(sum("s_micro").as("score_micro"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
  }

  /** Exact corpus-wide top-`k` frequent tokens WITHOUT a full-domain
    * shuffle — the heavy-hitters query every corpus audit starts
    * with. Two linear scans:
    *
    *  1. candidate generation: [[graft.functions.MisraGriesAgg]]
    *     folds the token stream into one capacity-bounded summary
    *     (map-side partials, order-independent guarantee). Every item
    *     with true frequency > N/(cap+1) is guaranteed present, so
    *     with cap sized to the skew the true top-k is a subset.
    *  2. exact recount: broadcast the ≤`cap` candidates back over the
    *     corpus as a semi-join filter and aggregate ONLY the
    *     survivors. The shuffle carries at most `cap` distinct keys —
    *     at 100 TB this replaces a billions-of-keys token shuffle
    *     with two scans and a KB-sized exchange.
    *
    * Output is exact and deterministic (estimate-independent: MG only
    * chooses the candidate set; counts come from the recount), ties
    * broken by term — hash-gated against DuckDB's exact top-k.
    *
    * SELF-CERTIFYING: the MG guarantee only covers rank k when the
    * k-th recounted count strictly exceeds N/(cap+1) — on a flat
    * distribution (many tokens near N/cap) a fixed cap can silently
    * return the wrong tail. After the recount the answer is checked
    * against its own guarantee ([[mgCertified]]); on violation the
    * cap escalates — certification-GUIDED: the failed attempt's exact
    * k-th count `ck` says precisely what capacity would certify
    * (`ck·(cap+1) > n` ⇒ `cap ≥ n/ck`), so the jump lands a
    * sufficient cap in ONE extra pass instead of a doubling walk;
    * past `maxCap` the query falls back to the exact vocab-keyed
    * groupBy — so the result is exact at ANY distribution, and the
    * bounded-shuffle fast path is used exactly when its precondition
    * provably holds.
    */
  def heavyHitters(spark: SparkSession, dir: String,
                   cap: Int = 64, k: Int = 10): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(explode(split(normText(col("text")), " ")).as("term"))
    heavyHittersOf(toks, cap, k)
  }

  /** The certification predicate: with `n` total items and MG
    * capacity `cap`, every item whose true count exceeds n/(cap+1) is
    * guaranteed in the candidate set — so items OUTSIDE it have count
    * ≤ n/(cap+1). The recounted top-k is provably the true top-k iff
    * k candidates were found and the k-th count `ck` satisfies
    * ck·(cap+1) > n STRICTLY (an excluded item could tie at exactly
    * n/(cap+1) and deserve rank k by the term tiebreak, so equality
    * does not certify).
    */
  def mgCertified(found: Int, k: Int, ck: Long, n: Long, cap: Int): Boolean =
    found >= k && ck * (cap + 1L) > n

  /** [[heavyHitters]] over any single-column (`term`) token stream.
    * Each attempt is two linear scans (MG summary + bounded recount);
    * the escalation loop is driver-side over metadata-sized results
    * (≤ cap candidate strings, ≤ k checked rows). The exact fallback
    * shuffles |vocab| keys — the cost the fast path avoids, paid only
    * when no affordable cap covers rank k.
    */
  def heavyHittersOf(toks: DataFrame, cap0: Int, k: Int,
                     maxCap: Int = 4096): DataFrame = {
    var cap = cap0
    while (cap <= maxCap) {
      val summary = toks.agg(
        graft.functions.misra_gries(col("term"), cap).as("mg"),
        count(lit(1)).cast("long").as("n")).head()
      val n = summary.getLong(1)
      val items = summary.getSeq[org.apache.spark.sql.Row](0)
        .map(_.getString(0))
      val spark = toks.sparkSession
      import spark.implicits._
      val cands = items.toDF("term")
      val recount = toks.join(broadcast(cands), Seq("term"), "left_semi")
        .groupBy("term")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("term").asc)
        .limit(k)
      if (n == 0L) return recount
      val top = recount.collect()
      if (top.nonEmpty &&
        mgCertified(top.length, k min n.toInt, top.last.getLong(1), n, cap))
        return recount
      // guided jump: a larger candidate set can only RAISE the exact
      // k-th count, so ck'·(cap'+1) ≥ ck·(cap'+1) > n — one extra
      // pass certifies whenever any affordable cap can (doubling
      // floor keeps progress if ck is degenerate)
      val ck = if (top.nonEmpty) top.last.getLong(1) else 0L
      val needed = if (ck > 0 && n / ck < Int.MaxValue.toLong)
        (n / ck).toInt + 1 else cap * 2
      cap = math.max(cap * 2, needed)
    }
    // guarantee not certifiable at any affordable cap (near-flat
    // distribution): exact top-k over the full token domain
    toks.groupBy("term")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(k)
  }

  /** Frequency-ranked vocabulary of the top-`k` corpus tokens — the
    * table a word-level tokenizer ships: `vocab_id` 1..k assigned in
    * (tf DESC, token ASC) order (id 0 is reserved for OOV by
    * [[tokenizeIds]]), with both total occurrences (`tf`) and
    * document frequency (`df`) so downstream filters can
    * distinguish burstiness from spread.
    *
    * Plan shape: one groupBy on the token domain (map-side partial
    * counts collapse the per-split stream to its distinct tokens, so
    * the shuffle carries |vocab| keys, not corpus positions), then a
    * global rank over the surviving ≤|vocab| rows — at 100 TB the
    * ranked relation is vocab-sized (≤ millions), which
    * TakeOrderedAndProject handles without a full sort of anything
    * corpus-sized.
    */
  def vocabBuild(spark: SparkSession, dir: String, k: Int = 24): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(split(normText(col("text")), " ")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"),
        count_distinct(col("doc_id")).as("df"))
    tf.orderBy(col("tf").desc, col("token").asc)
      .limit(k)
      .withColumn("vocab_id",
        row_number().over(Window.orderBy(col("tf").desc, col("token").asc))
          .cast("long"))
      .select("token", "vocab_id", "tf", "df")
      .orderBy("vocab_id")
  }

  /** Token-id encoding of the corpus against [[vocabBuild]]'s top-`k`
    * vocabulary: one row per (document, position) with the 1-based
    * position, the surface token and its vocab id (0 = OOV) — the
    * exploded form a sequence-packing export consumes (see
    * [[graft.pipeline.Curation.packSequences]]).
    *
    * Plan shape: the vocabulary is vocab-sized, so the id lookup is a
    * broadcast LEFT join against the exploded token stream — encoding
    * is a pure per-split map at any corpus size, no shuffle of
    * anything corpus-sized (the sole shuffle in this gate query is
    * the presentation ORDER BY).
    */
  def tokenizeIds(spark: SparkSession, dir: String, k: Int = 24): DataFrame = {
    val vocab = vocabBuild(spark, dir, k).select("token", "vocab_id")
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(split(normText(col("text")), " ")))
      .withColumn("pos", (col("pos") + 1).cast("long"))
      .withColumnRenamed("col", "token")
      .join(broadcast(vocab), Seq("token"), "left")
      .select(col("doc_id"), col("pos"), col("token"),
        coalesce(col("vocab_id"), lit(0L)).as("token_id"))
      .orderBy("doc_id", "pos")
  }
}
