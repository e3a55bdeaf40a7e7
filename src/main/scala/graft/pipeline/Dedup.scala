package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{cosine_sim, minhash_signature, simhash_agg, sorted_intersect_atleast, sorted_intersect_count}

/** Near-duplicate detection (SURVEY §2E). Every variant follows the
  * same scale discipline: CANDIDATE GENERATION BY BUCKETING (shuffle
  * on a bucket key), never an all-pairs cross join. At 100 TB the
  * bucket join is the only quadratic-risk step and its cost is bounded
  * by bucket size, which the band/bit parameters control.
  */
object Dedup {

  /** Distinct character 3-grams of the column named `textCol`, as an
    * array column. `transform(sequence(...))` stays in codegen — no
    * UDF.
    */
  def shingles(textCol: String, n: Int = 3): Column =
    array_distinct(expr(
      s"transform(sequence(1, greatest(length($textCol) - ${n - 1}, 1)), " +
        s"i -> substring($textCol, i, $n))"))

  /** The early-exit exact-verify predicate shared by every detector's
    * verify filter: `|A∩B| ≥ ceil(t·S/(1e4+t))` ⟺
    * `|A∩B|·(1e4+t) ≥ t·S` ⟺ `floor(1e4·J) ≥ t` (the count is an
    * integer, so the ceil-division threshold is bit-identical to the
    * product inequality), but the sorted merge stops at `needed`
    * matches (near-identical pairs) or at the first impossibility
    * bound (false candidates) instead of always walking O(|A|+|B|).
    * Survivors still compute the exact count once for `jac_bp`.
    */
  private def exactAtLeast(aSh: Column, bSh: Column, sizes: Column,
                           minBp: Long): Column =
    sorted_intersect_atleast(aSh, bSh,
      call_function("div",
        (lit(minBp) * sizes + lit(10000L + minBp - 1)).cast("long"),
        lit(10000L + minBp)).cast("int"))

  private def normed(spark: SparkSession, dir: String): DataFrame =
    normedOf(Tables.documents(spark, dir))

  /** Materialize a per-invocation intermediate ONCE (eager
    * localCheckpoint behind a fresh-leaf frame, the
    * [[graft.operators.Components]] `cut` discipline) so a frame
    * consumed by several plan branches is computed a single time.
    * The detectors' signature/fingerprint frames are each read by
    * 2–4 branches (bucket self-join sides + rehydration sides);
    * without the cut, each branch re-runs the scan + shingle + sign
    * pass — at 100 TB that is 2–4 full corpus passes where one is
    * enough (guide §1.2 step 1: don't compute things twice). Blocks
    * are MEMORY_AND_DISK and freed by the ContextCleaner once the
    * invocation's result is unreachable; nothing persists across
    * invocations, so every bench/oracle sample still computes from
    * the parquet inputs.
    */
  private[pipeline] def materialize(df: DataFrame): DataFrame =
    graft.operators.Frames.materialize(df)

  /** The shared normalization projection, usable on a batch table or
    * an arriving stream alike.
    */
  private[graft] def normedOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), col("source"),
      TextAnalysis.normText(col("text")).as("txt"))

  /** MinHash + LSH candidate pairs (*rows-only*; Spark hash functions
    * are not portable to the oracle).
    *
    * shingle → 32-permutation signature in one fused
    * [[graft.functions.MinHashSignature]] pass (each shingle hashed
    * once) → 4 bands of 8 rows (LSH s-curve threshold ≈ (1/4)^(1/8)
    * ≈ 0.84 Jaccard) → explode to (band, band_hash) → self-join per
    * bucket. Two narrow shuffles (explode + join); pair count is
    * bounded by bucket collisions, never O(n²).
    */
  def minhashPairs(spark: SparkSession, dir: String,
                   numPerm: Int = 32, bands: Int = 4): DataFrame =
    pairsFromBandKeys(minhashBandKeys(spark, dir, numPerm, bands))

  /** The exploded (doc_id, band, bh) LSH key relation behind
    * [[minhashPairs]] — also the gate artifact: persisted, it lets the
    * oracle re-derive the pair set with a plain band-bucket self-join
    * over the same parquet keys.
    */
  private def minhashBandKeys(spark: SparkSession, dir: String,
                              numPerm: Int, bands: Int): DataFrame = {
    val rows = numPerm / bands
    val withSig = normed(spark, dir)
      .select(col("doc_id"),
        minhash_signature(shingles("txt"), numPerm).as("sig"))
    val bandCols = (0 until bands).map { b =>
      val slice = (0 until rows)
        .map(r => s"sig[${b * rows + r}]").mkString(", ")
      struct(lit(b).as("band"), expr(s"xxhash64($slice)").as("bh")).as(s"b$b")
    }
    withSig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
  }

  private def pairsFromBandKeys(exploded: DataFrame): DataFrame = {
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** [[minhashPairs]] with the band keys PERSISTED at the fixed gate
    * path: the Spark hashes stay engine-specific, but the pair set is
    * a pure band-bucket self-join over the persisted keys, which the
    * DuckDB oracle re-derives from the same parquet — flipping the
    * gate from rows-only to hash-exact.
    */
  def minhashPairsGate(spark: SparkSession, dir: String,
                       numPerm: Int = 32, bands: Int = 4): DataFrame = {
    val p = Gate.once(spark, "dedup_minhash", dir)(g =>
      minhashBandKeys(spark, dir, numPerm, bands)
        .write.mode("overwrite").parquet(s"$g/keys"))
    pairsFromBandKeys(spark.read.parquet(s"$p/keys"))
  }

  /** 64-bit SimHash per document: token-level xxhash64 folded by the
    * custom [[graft.functions.SimHashAgg]] aggregate — one 64-int
    * vote buffer per group with map-side partial aggregation (the
    * shuffle carries one 256-byte buffer per doc per mapper, not
    * exploded token rows or 64 sum columns).
    */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    normed(spark, dir)
      .select(col("doc_id"), explode(split(col("txt"), " ")).as("tok"))
      .groupBy("doc_id")
      .agg(simhash_agg(xxhash64(col("tok"))).as("simhash"))

  /** SimHash near-dup candidate pairs (*rows-only*), multi-index
    * Hamming search (the Manku/Jain/Sarma web-dedup layout): split the
    * 64-bit fingerprint into `blocks` blocks; at most `maxHamming`
    * blocks can be dirty, so every pair within the distance agrees
    * EXACTLY on some `(blocks - maxHamming)`-subset of blocks
    * (pigeonhole). Index each doc under every such subset —
    * C(blocks, maxHamming) keys/doc, each key the xxhash64 of
    * (subset id, that subset's block values) — bucket self-join, then
    * verify with `bit_count`. Output is EXACTLY the hamming ≤
    * `maxHamming` pair set (asserted in PipelineSpec): hash collisions
    * only add candidates, which the verify filter removes.
    *
    * Scale: key entropy is `64·(blocks-maxHamming)/blocks` bits —
    * defaults give ~26-bit keys (~6.7e7 buckets/index vs the 65,536
    * cap of naive 16-bit banding, whose buckets go quadratic at
    * billions of docs). Grow `blocks` with the corpus: blocks=8 →
    * 40-bit keys / 56 indexes; occupancy per bucket stays O(N / 2^keybits),
    * so the bucket join stays near-linear.
    */
  def simhashPairs(spark: SparkSession, dir: String,
                   maxHamming: Int = 3, blocks: Int = 5): DataFrame =
    hammingPairs(simhash(spark, dir).withColumnRenamed("simhash", "sig"),
      maxHamming, blocks)

  /** [[simhashPairs]] with the 64-bit signatures PERSISTED at the
    * fixed gate path: the output is EXACTLY the hamming ≤ `maxHamming`
    * pair set over those values, so the oracle re-derives it from the
    * same parquet with `bit_count(xor(a.sig, b.sig))` — the signature
    * fold stays engine-specific, the search becomes hash-exact. The
    * production search stays the multi-index bucketed plan (never
    * all-pairs); only the small-corpus oracle brute-forces.
    */
  def simhashPairsGate(spark: SparkSession, dir: String,
                       maxHamming: Int = 3, blocks: Int = 5): DataFrame = {
    val p = Gate.once(spark, "dedup_simhash", dir)(g =>
      simhash(spark, dir).withColumnRenamed("simhash", "sig")
        .write.mode("overwrite").parquet(s"$g/sigs"))
    hammingPairs(spark.read.parquet(s"$p/sigs"), maxHamming, blocks)
  }

  /** The multi-index Hamming search over ANY (doc_id, sig: long)
    * fingerprint table — shared by [[simhashPairs]] and the
    * multimodal payload signature ([[Multimodal.mmDedupNear]]).
    * Output is EXACTLY the hamming ≤ `maxHamming` pair set
    * (doc_a, doc_b, hamming).
    */
  private[pipeline] def hammingPairs(sigs: DataFrame, maxHamming: Int,
                                     blocks: Int): DataFrame = {
    require(blocks > maxHamming, "need at least one clean block per index")
    val keep = blocks - maxHamming
    val width = Array.tabulate(blocks)(i => 64 / blocks + (if (i < 64 % blocks) 1 else 0))
    val offset = width.scanLeft(0)(_ + _)
    // (sig >>> off) & mask; last block may reach the sign bit —
    // use the logical shift so the mask sees zero-filled high bits
    def bv(i: Int): String =
      s"(shiftrightunsigned(sig, ${offset(i)}) & ${(1L << width(i)) - 1}L)"
    val keys = (0 until blocks).combinations(keep).zipWithIndex.map {
      case (subset, idx) =>
        expr(s"xxhash64($idx, ${subset.map(bv).mkString(", ")})")
    }.toSeq
    val keyed = sigs
      .select(col("doc_id"), col("sig"), explode(array(keys: _*)).as("k"))
    val a = keyed.as("a")
    val b = keyed.as("b")
    a.join(b, col("a.k") === col("b.k") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.sig ^ b.sig)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  /** Character-3-gram Jaccard similarity pairs, blocked by
    * (lang, source) — the blocking key caps the quadratic join at
    * block size, the standard sharded-Jaccard shape. Oracle-checkable:
    * set intersection sizes are exact integers on both engines.
    *
    * ROLE: calibration oracle. The candidate join is O(block²) by
    * definition, so this is NOT the production edge source —
    * [[lshJaccardPairs]] computes the same exact-verified pair set at
    * LSH cost and is what `dedup_clusters`/[[unionEdges]] consume;
    * this operator remains gated (`dedup_ngram`) as the ground truth
    * the LSH path is verified against (gate `dedup_lsh_verify` +
    * PipelineSpec equality property).
    *
    * Perf shape: shingle sets are sorted ONCE per document
    * (projection, before the join); each CANDIDATE pair costs one
    * allocation-free early-exit merge ([[exactAtLeast]] — the
    * threshold form of `inter * (10000 + t) >= t * (|A| + |B|)`,
    * ⇔ floor(1e4·J) >= t) in the join condition.
    * SURVIVING pairs re-run the merge once more in the projection to
    * produce `jac_bp` — a deliberate trade: survivors are a tiny
    * fraction of candidates, and keeping the exact test inside the
    * join condition is what lets the cheap length prune short-circuit
    * ahead of it (see below).
    *
    * @param docSlice deterministic corpus sample for the GATE query:
    *   `Some(h)` keeps only documents whose `md5(doc_id)` first hex
    *   digit is < `h` (md5 renders identically in Spark and DuckDB, so
    *   the oracle applies the very same slice). A calibration oracle
    *   doesn't need the whole corpus to exercise every code path, and
    *   its quadratic join makes it the single most expensive bench
    *   query — `Some("8")` halves the docs and quarters the pair
    *   work. `None` (default) = full corpus, which is what the
    *   PipelineSpec equality property against [[lshJaccardPairs]]
    *   runs on.
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String,
                        minBp: Long = 3000,
                        docSlice: Option[String] = None): DataFrame = {
    val base = docSlice.foldLeft(normed(spark, dir))((df, h) =>
      df.filter(substring(md5(col("doc_id").cast("string")), 1, 1) < lit(h)))
    val g = materialize(base
      .withColumn("sh", array_sort(shingles("txt")))
      .select(col("doc_id"), col("lang"), col("source"), col("sh"),
        size(col("sh")).as("nsh")))
    val a = g.as("a")
    val b = g.as("b")
    // pin a shuffle-hash join on the block key: the build side per
    // block is bounded by the blocking, and the alternatives are both
    // wrong here (broadcast: the shingle arrays are ~40 MB and AQE
    // stats can flip it to a sort-merge join; SMJ: sorts rows carrying
    // the full arrays).
    // BOTH threshold conjuncts are authored into the join condition in
    // cheap-first order: the length-ratio prune (with |A∩B| ≤
    // min(|A|,|B|), J ≥ t is impossible unless min·(1e4+t) ≥
    // t·(|A|+|B|) — two ints) short-circuits before the O(|A|+|B|)
    // sorted-merge. Writing the exact test as a post-join filter
    // instead lets Catalyst push it into the condition AHEAD of the
    // prune, running the expensive merge first (observed in the
    // physical plan).
    val sizes = col("a.nsh") + col("b.nsh")
    val lengthPrune =
      least(col("a.nsh"), col("b.nsh")) * (10000L + minBp) >= lit(minBp) * sizes
    val exactTest = exactAtLeast(col("a.sh"), col("b.sh"), sizes, minBp)
    a.join(b.hint("shuffle_hash"), col("a.lang") === col("b.lang") &&
        col("a.source") === col("b.source") &&
        col("a.doc_id") < col("b.doc_id") &&
        lengthPrune && exactTest)
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        sorted_intersect_count(col("a.sh"), col("b.sh")).as("inter"),
        sizes.as("sizes"))
      .select(col("doc_a"), col("doc_b"),
        floor(lit(10000.0) * col("inter") / (col("sizes") - col("inter")))
          .cast("long").as("jac_bp"))
      .orderBy("doc_a", "doc_b")
  }

  /** [[ngramJaccardPairs]]' exact pair set at LSH cost — the
    * production-scale detector behind `dedup_keep`/`dedup_clusters`.
    *
    * Same SEMANTICS as the block-exact operator (same (lang, source)
    * blocking, same exact integer threshold `floor(1e4·J) ≥ minBp`,
    * same output schema); only candidate GENERATION changes, from
    * all-pairs-per-block (O(block²) — a (lang, source) block at
    * 100 TB is billions of documents) to MinHash band buckets:
    *
    *  - one fused [[graft.functions.MinHashSignature]] pass per doc
    *    (each shingle hashed once, `numPerm` permutations derived);
    *  - `bands` band keys per doc, each the xxhash64 of (lang,
    *    source, band, its `numPerm/bands` signature rows) — the block
    *    key is IN the bucket key, so candidates never cross blocks;
    *  - bucket self-join → candidate pairs, bounded by bucket
    *    occupancy (O(N/2^keybits) per bucket), never O(block²);
    *  - each candidate verified with the SAME exact integer test as
    *    [[ngramJaccardPairs]] (cheap length prune first, then the
    *    allocation-free sorted-merge intersect) — false candidates
    *    are filtered, so precision is exact by construction.
    *
    * Recall is the LSH s-curve: a true pair at Jaccard J is missed
    * with probability (1 − J^rows)^bands. The defaults (64 perms, 32
    * bands of 2 rows) put the s-curve midpoint at J ≈ (1/32)^(1/2) ≈
    * 0.18, far below the dedup thresholds this feeds: at the
    * `dedup_keep` gate threshold J = 0.65 the miss probability is
    * (1 − 0.65²)^32 ≈ 2e-8 — the pair set is the exact one with
    * overwhelming (and, hashes being deterministic, reproducible)
    * probability, which is what lets `dedup_lsh_verify` gate against
    * the block-exact DuckDB oracle BY HASH. Lower thresholds need
    * more bands (rows=1 at minBp ≤ 3000): the s-curve is a parameter,
    * not a constant.
    *
    * Cost at 100 TB: three narrow shuffles (band explode + bucket
    * join on the 8-byte key; two doc_id joins rehydrating the shingle
    * arrays for SURVIVING candidates only — the wide arrays never
    * ride the bucket shuffle). The two rehydration exchanges are
    * identical, so the second is a ReusedExchange.
    *
    * `bucketCap` (default off here — the `dedup_lsh_verify` gate row
    * stays the exact pair set; the CLUSTERING consumers select it via
    * [[autoBucketCap]]): buckets whose occupancy exceeds the cap emit
    * a STAR (every member paired with the bucket's min doc_id)
    * instead of the full clique — n−1 candidates instead of n(n−1)/2.
    * The r11 decade metrics (tools.DedupMetrics) showed candidate
    * volume growing 22× for 10× data once duplicate clusters densify
    * (a cluster of n near-identical docs is n²/2 pairs by
    * definition); the cap bounds LISTING cost per hot bucket while
    * preserving what dedup actually consumes — CONNECTIVITY
    * (components via the hub; spec-asserted label equality at a
    * forced tiny cap). Recall shape: a true pair suppressed in one
    * over-cap bucket is still listed by any of its other `bands−1`
    * band buckets that stay under cap, and near-identical docs
    * collide on most bands. [[autoBucketCap]] sizes the arm from the
    * persisted `dedup_band_stats` histogram.
    */
  def lshJaccardPairs(spark: SparkSession, dir: String,
                      minBp: Long = 6500, numPerm: Int = 64,
                      bands: Int = 32,
                      bucketCap: Option[Int] = None): DataFrame = {
    require(numPerm % bands == 0, "bands must divide numPerm")
    val rows = numPerm / bands
    // the guarantee this operator sells is "the exact pair set at LSH
    // cost" — refuse configurations where the banding would miss
    // at-threshold pairs at a rate a gate could ever observe, instead
    // of silently under-recalling (miss prob at J: (1 - J^rows)^bands)
    val missAtThreshold =
      math.pow(1.0 - math.pow(minBp / 10000.0, rows), bands)
    require(missAtThreshold < 1e-6,
      f"banding $bands×$rows misses J=${minBp / 10000.0}%.2f pairs with " +
        f"p=$missAtThreshold%.2e — use more bands (rows=1 for low thresholds)")
    // same signing + band keys as the persisted dedup_band_stats
    // index ([[bandKeyExprs]]) — which is what lets [[autoBucketCap]]
    // select this join's arm from that artifact's histogram
    val g = materialize(signedDocs(normed(spark, dir), numPerm))
    // band keys carry each doc's shingle-set size (one int per
    // exploded row): the two-int length prune runs INSIDE the
    // candidate join, so pairs the verify's lengthPrune would reject
    // never reach the distinct or the shingle-rehydration joins —
    // guide §2.3, decide on metadata and move the heavy arrays for
    // survivors only. Output-identical by construction (the verify
    // filter re-applies the same prune); measured at sf1 it drops
    // ~70 % of raw band collisions before any shingle bytes move.
    val keyed = g.select(col("doc_id"), col("nsh"),
      explode(array(bandKeyExprs(numPerm, bands): _*)).as("bh"))
    def lenOk(an: Column, bn: Column): Column =
      least(an, bn) * (10000L + minBp) >= lit(minBp) * (an + bn)
    val cand0 = bucketCap match {
      case None =>
        keyed.as("ka")
          .join(keyed.as("kb").hint("shuffle_hash"),
            col("ka.bh") === col("kb.bh") && col("ka.doc_id") < col("kb.doc_id") &&
              lenOk(col("ka.nsh"), col("kb.nsh")))
          .select(col("ka.doc_id").as("doc_a"), col("kb.doc_id").as("doc_b"))
      case Some(cap) =>
        // per-bucket occupancy + hub in one bh-shuffled aggregate
        // (same key as the pair join); under-cap buckets keep the
        // clique, over-cap buckets emit the star only (star pairs
        // carry no partner nsh here — their length prune happens in
        // the verify filter as before)
        val occ = keyed.groupBy("bh")
          .agg(count(lit(1)).as("occ"), min("doc_id").as("hub"))
        val kc = keyed.join(occ.hint("shuffle_hash"), Seq("bh"))
        val small = kc.filter(col("occ") <= cap)
        val clique = small.as("ka")
          .join(small.as("kb").hint("shuffle_hash"),
            col("ka.bh") === col("kb.bh") && col("ka.doc_id") < col("kb.doc_id") &&
              lenOk(col("ka.nsh"), col("kb.nsh")))
          .select(col("ka.doc_id").as("doc_a"), col("kb.doc_id").as("doc_b"))
        val star = kc.filter(col("occ") > cap && col("doc_id") =!= col("hub"))
          .select(col("hub").as("doc_a"), col("doc_id").as("doc_b"))
        clique.unionByName(star)
    }
    val cand = cand0.distinct()
    val slim = g.select(col("doc_id"), col("lang"), col("source"),
      col("sh"), col("nsh"))
    val a = slim.as("a")
    val b = slim.as("b")
    val sizes = col("a.nsh") + col("b.nsh")
    // same cheap-first conjunct order as ngramJaccardPairs: the
    // two-int length prune short-circuits ahead of the merge (block
    // equality re-checked exactly — the bucket key only makes
    // cross-block candidates hash-collision-unlikely). The exact test
    // is the EARLY-EXIT threshold form: |A∩B| ≥ ceil(t·S/(1e4+t)) ⟺
    // floor(1e4·J) ≥ t — bit-identical to the count inequality, but
    // the merge stops at `needed` matches (near-identical pairs) or
    // at the first impossibility bound (false candidates) instead of
    // always walking O(|A|+|B|); survivors still compute the exact
    // count once for jac_bp.
    val lengthPrune =
      least(col("a.nsh"), col("b.nsh")) * (10000L + minBp) >= lit(minBp) * sizes
    val exactTest = exactAtLeast(col("a.sh"), col("b.sh"), sizes, minBp)
    cand
      .join(a.hint("shuffle_hash"), col("doc_a") === col("a.doc_id"))
      .join(b.hint("shuffle_hash"), col("doc_b") === col("b.doc_id"))
      .filter(col("a.lang") === col("b.lang") &&
        col("a.source") === col("b.source") && lengthPrune && exactTest)
      .select(col("doc_a"), col("doc_b"),
        sorted_intersect_count(col("a.sh"), col("b.sh")).as("inter"),
        sizes.as("sizes"))
      .select(col("doc_a"), col("doc_b"),
        floor(lit(10000.0) * col("inter") / (col("sizes") - col("inter")))
          .cast("long").as("jac_bp"))
      .orderBy("doc_a", "doc_b")
  }

  /** Chunk-level partial-duplicate pairs via content-defined chunking
    * (*rows-only*): split each document at content-determined
    * boundaries ([[graft.functions.CdcChunks]]), build the chunk-hash
    * inverted index, and emit document pairs sharing ≥ `minShared`
    * chunks — the standard common-passage / partial-overlap detector.
    * Explode → groupBy chunk → pair-count: one shuffle on chunk hash,
    * one on the pair; never all-pairs.
    */
  /** Incremental ingestion dedup: near-duplicate pairs between a NEW
    * batch and the EXISTING corpus — the nightly pipeline shape
    * (today's crawl against everything already ingested), where
    * re-running the full symmetric dedup would re-pay the whole
    * corpus each day. The batch here is the deterministic
    * `doc_id % 7 = 0` slice standing in for a day's arrivals (same
    * stand-in discipline as decontaminate's benchmark split; 7 is
    * coprime to the generator's 20-id clone family stride, so the
    * split actually severs duplicate families).
    *
    * 100 TB shape: the corpus is touched ONCE, linearly — minhash
    * band keys streamed map-side into a hash join whose BUILD side is
    * the (day ≪ corpus) batch's band keys, broadcast: corpus band
    * keys never shuffle, candidates are bounded by batch bucket
    * occupancy, and only the candidate corpus docs are rehydrated
    * (shuffle_hash on the slim shingle projection) for the exact
    * verify. A backfill-sized "batch" should use the symmetric
    * [[lshJaccardPairs]] instead — the broadcast assumes day ≪
    * corpus. Same banding guarantee (miss < 1e-6 at threshold), same
    * exact integer Jaccard verify → hash-gated against the
    * block-exact batch×corpus DuckDB relation.
    */
  def incrementalDedup(spark: SparkSession, dir: String,
                       minBp: Long = 6500, numPerm: Int = 64,
                       bands: Int = 32): DataFrame = {
    requireBanding(minBp, numPerm, bands)
    val g = materialize(signedDocs(normed(spark, dir), numPerm))
    val isNew = col("doc_id") % 7 === 0
    incrementalCore(g.filter(isNew),
      bandKeyed(g.filter(!isNew), numPerm, bands),
      slimOf(g.filter(!isNew)), minBp, numPerm, bands)
  }

  private def requireBanding(minBp: Long, numPerm: Int, bands: Int): Unit = {
    require(numPerm % bands == 0, "bands must divide numPerm")
    val rows = numPerm / bands
    val missAtThreshold =
      math.pow(1.0 - math.pow(minBp / 10000.0, rows), bands)
    require(missAtThreshold < 1e-6,
      f"banding $bands×$rows misses J=${minBp / 10000.0}%.2f pairs with " +
        f"p=$missAtThreshold%.2e — use more bands (rows=1 for low thresholds)")
  }

  /** (doc_id, lang, source, sorted shingles, size, minhash sig). */
  private def signedDocs(docs: DataFrame, numPerm: Int): DataFrame =
    docs.withColumn("sh", array_sort(shingles("txt")))
      .select(col("doc_id"), col("lang"), col("source"), col("sh"),
        size(col("sh")).as("nsh"),
        minhash_signature(col("sh"), numPerm).as("sig"))

  /** One band-bucket hash per band, block key (lang, source) folded
    * into the bucket so blocks never collide across languages/sources.
    */
  private def bandKeyExprs(numPerm: Int, bands: Int): Seq[Column] = {
    val rows = numPerm / bands
    (0 until bands).map { bnd =>
      val slice = (0 until rows)
        .map(r => s"sig[${bnd * rows + r}]").mkString(", ")
      expr(s"xxhash64(lang, source, $bnd, $slice)")
    }
  }

  /** Exploded (doc_id, band-bucket hash) keys, block key folded in. */
  private def bandKeyed(signed: DataFrame, numPerm: Int,
                        bands: Int): DataFrame =
    signed.select(col("doc_id"),
      explode(array(bandKeyExprs(numPerm, bands): _*)).as("bh"))

  private def slimOf(signed: DataFrame): DataFrame =
    signed.select(col("doc_id"), col("lang"), col("source"),
      col("sh"), col("nsh"))

  /** The shared asymmetric candidate+verify plan: batch band keys
    * broadcast against corpus keys (from either an in-memory
    * projection or the persisted index), slim rehydration, exact
    * integer Jaccard verify.
    */
  private def incrementalCore(batchSigned: DataFrame, corpusKeys: DataFrame,
                              corpusSlim: DataFrame, minBp: Long,
                              numPerm: Int, bands: Int): DataFrame = {
    val cand = corpusKeys
      .join(broadcast(bandKeyed(batchSigned, numPerm, bands)
        .withColumnRenamed("doc_id", "new_id")), Seq("bh"))
      .select(col("new_id"), col("doc_id").as("dup_of"))
      .distinct()
    val a = corpusSlim.as("a") // corpus / dup_of side
    val b = slimOf(batchSigned).as("b") // batch / new side
    val sizes = col("a.nsh") + col("b.nsh")
    val lengthPrune =
      least(col("a.nsh"), col("b.nsh")) * (10000L + minBp) >= lit(minBp) * sizes
    val exactTest = exactAtLeast(col("a.sh"), col("b.sh"), sizes, minBp)
    cand
      .join(broadcast(b), col("new_id") === col("b.doc_id"))
      .join(a.hint("shuffle_hash"), col("dup_of") === col("a.doc_id"))
      .filter(col("a.lang") === col("b.lang") &&
        col("a.source") === col("b.source") && lengthPrune && exactTest)
      .select(col("new_id"), col("dup_of"),
        sorted_intersect_count(col("a.sh"), col("b.sh")).as("inter"),
        sizes.as("sizes"))
      .select(col("new_id"), col("dup_of"),
        floor(lit(10000.0) * col("inter") / (col("sizes") - col("inter")))
          .cast("long").as("jac_bp"))
      .orderBy("new_id", "dup_of")
  }

  /** Fixed gate location for the band-stats index (NOT TmpDir-scoped:
    * the oracle runs in a separate process after the Spark session
    * exits and must name the same files — the same discipline as
    * [[graft.sources.StorageStats.GatePath]], per-user for the same
    * predictable-path reasons).
    */
  val BandStatsGatePath: String = new java.io.File(
    sys.props.getOrElse("java.io.tmpdir", "/tmp"),
    "graft_band_stats_gate_" +
      sys.props.getOrElse("user.name", "anon").replaceAll("[^A-Za-z0-9_.-]", "_")
  ).getPath

  // TrieMap + Memo.once (not a check-then-act keyset): concurrent
  // first callers — the warmup pool runs dedup_band_stats and the
  // clusterLabels consumers side by side — must BLOCK on the build,
  // not race past a flag into a half-written artifact
  private val bandStatsBuilt =
    scala.collection.concurrent.TrieMap.empty[(String, String), Unit]

  /** Band-bucket occupancy telemetry over the full-corpus MinHash band
    * index — the observability SURVEY §4's pair-cost bound needs: LSH
    * dedup's candidate cost is Σ_buckets C(occ, 2), quadratic in the
    * occupancy of each HOT bucket (a cluster of n near-identical docs
    * is n²/2 real pairs by definition), and this histogram makes that
    * bound measurable per corpus — one groupBy over the persisted
    * index, no text, no pairs. Emits (occ, n_buckets, cand_pairs)
    * with cand_pairs = n_buckets · occ·(occ−1)/2, so the candidate
    * volume a `dedup_lsh_verify` run will generate is the column sum,
    * readable BEFORE committing to the pair join; at 100 TB a
    * production pass caps or streams the histogram's tail buckets.
    *
    * Oracle-exact: the index is persisted at the fixed gate path and
    * the oracle counts the SAME parquet keys — the hashes themselves
    * are engine-specific, but both engines histogram identical files
    * (the `storage_stats` discipline).
    */
  def dedupBandStats(spark: SparkSession, dir: String,
                     numPerm: Int = 64, bands: Int = 32): DataFrame =
    spark.read.parquet(bandStatsIndex(spark, dir, numPerm, bands))
      .groupBy("bh").agg(count(lit(1)).as("occ"))
      .groupBy("occ")
      .agg(count(lit(1)).as("n_buckets"),
        expr("count(*) * occ * (occ - 1) div 2").as("cand_pairs"))
      .orderBy("occ")

  /** The persisted full-corpus band-key index behind
    * [[dedupBandStats]] (built once per session at the fixed gate
    * path; written at corpus layout time in production) — ALSO the
    * selection surface [[autoBucketCap]] probes, because these keys
    * are byte-identical to [[lshJaccardPairs]]' bucket keys (same
    * [[bandKeyExprs]], same defaults).
    */
  private[pipeline] def bandStatsIndex(spark: SparkSession, dir: String,
                                       numPerm: Int = 64,
                                       bands: Int = 32): String = {
    graft.Memo.once(bandStatsBuilt, (spark.sparkContext.applicationId, dir),
      bandKeyed(signedDocs(normed(spark, dir), numPerm), numPerm, bands)
        .write.mode("overwrite").parquet(s"$BandStatsGatePath/index"))
    s"$BandStatsGatePath/index"
  }

  /** Hot-bucket occupancy above which [[lshJaccardPairs]]' candidate
    * join switches the OVER-CAP buckets to star listing (and the cap
    * value itself): a bucket of occupancy k costs C(k,2) candidate
    * pairs as a clique but k−1 as a star, and past ~64 the clique's
    * quadratic term dominates the whole join (measured at sf10: max
    * occupancy ~300, listing wall 334 s → 125 s with the cap).
    */
  val BucketCapThreshold: Int = 64

  private val capCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), Option[Int]]

  /** Cap ARM SELECTION — the knn_join footer-derived-choice template
    * applied to LSH density: probe the persisted band-occupancy
    * artifact ([[bandStatsIndex]] — what `dedup_band_stats` maintains
    * at corpus layout time) with one tiny parquet aggregate, and turn
    * the star cap on only when some bucket exceeds
    * [[BucketCapThreshold]]. Low-density corpora (every gate sf) keep
    * the exact clique join — the cap binds exactly where the measured
    * quadratic blow-up lives. Memoized per (session, dir): the answer
    * changes only when the corpus does.
    *
    * Why capped labels stay correct (PipelineSpec asserts equality at
    * a forced tiny cap): a star keeps every over-cap bucket CONNECTED
    * through its hub when the bucket is a true near-dup clique, and a
    * true pair listed only as a dropped clique edge still surfaces
    * through its other band buckets — at J ≥ 0.65 with 32 one-row...
    * 32 bands × 2 rows, the chance a true pair collides in NO other
    * band is (1 − J²)^(bands−1) ≈ 4e−8 — while false-collision edges
    * were never going to survive the exact verify anyway.
    */
  def autoBucketCap(spark: SparkSession, dir: String): Option[Int] =
    graft.Memo.once(capCache, (spark.sparkContext.applicationId, dir), {
      val maxOcc = spark.read.parquet(bandStatsIndex(spark, dir))
        .groupBy("bh").agg(count(lit(1)).as("occ"))
        .agg(max("occ")).head().getLong(0)
      if (maxOcc > BucketCapThreshold) Some(BucketCapThreshold) else None
    })

  /** The exploded full-corpus band keys — instrumentation surface for
    * [[graft.tools.DedupMetrics]] (candidate-volume accounting per
    * scale decade).
    */
  private[graft] def bandKeysOf(spark: SparkSession, dir: String,
                                numPerm: Int = 64,
                                bands: Int = 32): DataFrame =
    bandKeyed(signedDocs(normed(spark, dir), numPerm), numPerm, bands)

  /** Persist the corpus side of [[incrementalDedup]] as a reusable
    * MinHash band index: `index/` = the exploded (doc_id, band-bucket
    * hash) keys, `slim/` = the (doc_id, lang, source, shingles, size)
    * rehydration projection. This is THE nightly-dedup artifact at
    * 100 TB: corpus text is shingled and signed ONCE at layout time,
    * and every daily batch probes the persisted index without
    * touching corpus text again — the same
    * persist-at-write-time discipline as `StatsPruning`/`ZOrder`
    * manifests (recompute is exactly the cost the artifact exists to
    * avoid).
    */
  def bandIndexWriteOf(corpusDocs: DataFrame, outDir: String,
                       numPerm: Int = 64, bands: Int = 32): Unit = {
    val g = signedDocs(corpusDocs, numPerm)
    bandKeyed(g, numPerm, bands)
      .write.mode("overwrite").parquet(s"$outDir/index")
    slimOf(g).write.mode("overwrite").parquet(s"$outDir/slim")
  }

  /** [[incrementalDedup]] against a PERSISTED band index: identical
    * output (same gate oracle), but the corpus contributes only
    * parquet reads of `index/` and `slim/` — IncrementalIndexSpec
    * proves it by handing this function a batch-only input and still
    * getting the full-corpus answer.
    */
  def incrementalDedupIndexedOf(spark: SparkSession, batchDocs: DataFrame,
                                indexDir: String, minBp: Long = 6500,
                                numPerm: Int = 64,
                                bands: Int = 32): DataFrame = {
    requireBanding(minBp, numPerm, bands)
    incrementalCore(signedDocs(batchDocs, numPerm),
      spark.read.parquet(s"$indexDir/index"),
      spark.read.parquet(s"$indexDir/slim"), minBp, numPerm, bands)
  }

  // blocking memo (see bandStatsBuilt): dedup_incremental_indexed and
  // dedup_incremental_stream share this index and may warm concurrently
  private val builtIndexes =
    scala.collection.concurrent.TrieMap.empty[String, Unit]

  /** The `doc_id % 7` corpus/batch split's band index, built once per
    * session (the production artifact is written once at corpus
    * layout) — shared by the batch and streaming gate forms.
    */
  private[graft] def bandIndexFor(spark: SparkSession, dir: String,
                                  numPerm: Int, bands: Int): String = {
    val idx = graft.sources.TmpDir.scoped("bandindex",
      spark.sparkContext.applicationId, s"$dir:$numPerm:$bands")
    graft.Memo.once(builtIndexes, idx,
      bandIndexWriteOf(normed(spark, dir).filter(!(col("doc_id") % 7 === 0)),
        idx, numPerm, bands))
    idx
  }

  /** Gate form: build (memoized per session) then probe with the
    * `doc_id % 7` batch slice.
    */
  def incrementalDedupIndexed(spark: SparkSession, dir: String,
                              minBp: Long = 6500, numPerm: Int = 64,
                              bands: Int = 32): DataFrame =
    incrementalDedupIndexedOf(spark,
      normed(spark, dir).filter(col("doc_id") % 7 === 0),
      bandIndexFor(spark, dir, numPerm, bands), minBp, numPerm, bands)

  /** The STREAMING probe plan over [[bandIndexWriteOf]]'s artifact:
    * continuous-ingestion dedup, where `arrivals` is an unbounded
    * stream of normalized documents and both index halves are static.
    *
    * A stream cannot re-join itself without stream-stream state, so —
    * unlike [[incrementalCore]], which regenerates the batch side for
    * the verify — each arriving row CARRIES its slim columns (shingle
    * array, size) through the band-key explosion. Plan shape per
    * micro-batch: arrivals broadcast against the static index keys
    * (the index never shuffles — at 100 TB that's the whole point;
    * the broadcast is sound because one trigger's arrivals ≪ corpus),
    * candidate pairs deduped with `dropDuplicates` (state = the pair
    * set, the same discipline as `dedup_exact_stream`; a production
    * deploy bounds it with `withWatermark` +
    * `dropDuplicatesWithinWatermark` on arrival time), then one
    * stream-static shuffle-hash join rehydrates the candidate corpus
    * docs for the exact integer Jaccard verify. Stateless except the
    * pair dedup; gate-equal to [[incrementalDedupIndexedOf]].
    */
  private[graft] def incrementalStreamProbe(spark: SparkSession,
      arrivals: DataFrame, indexDir: String, minBp: Long = 6500,
      numPerm: Int = 64, bands: Int = 32): DataFrame = {
    requireBanding(minBp, numPerm, bands)
    val probes = signedDocs(arrivals, numPerm)
      .select(col("doc_id").as("new_id"), col("lang").as("b_lang"),
        col("source").as("b_source"), col("sh").as("b_sh"),
        size(col("sh")).as("b_nsh"),
        explode(array(bandKeyExprs(numPerm, bands): _*)).as("bh"))
    val cand = spark.read.parquet(s"$indexDir/index")
      .join(broadcast(probes), Seq("bh"))
      .select(col("new_id"), col("doc_id").as("dup_of"),
        col("b_lang"), col("b_source"), col("b_sh"), col("b_nsh"))
      .dropDuplicates("new_id", "dup_of")
    val a = spark.read.parquet(s"$indexDir/slim").as("a")
    val sizes = col("a.nsh") + col("b_nsh")
    val lengthPrune =
      least(col("a.nsh"), col("b_nsh")) * (10000L + minBp) >= lit(minBp) * sizes
    val exactTest = exactAtLeast(col("a.sh"), col("b_sh"), sizes, minBp)
    cand
      .join(a.hint("shuffle_hash"), col("dup_of") === col("a.doc_id"))
      .filter(col("a.lang") === col("b_lang") &&
        col("a.source") === col("b_source") && lengthPrune && exactTest)
      .select(col("new_id"), col("dup_of"),
        sorted_intersect_count(col("a.sh"), col("b_sh")).as("inter"),
        sizes.as("sizes"))
      .select(col("new_id"), col("dup_of"),
        floor(lit(10000.0) * col("inter") / (col("sizes") - col("inter")))
          .cast("long").as("jac_bp"))
  }

  def cdcPairs(spark: SparkSession, dir: String,
               minShared: Long = 3, maxDf: Long = 1000): DataFrame =
    cdcPairsOf(normed(spark, dir), minShared, maxDf)

  /** [[cdcPairs]] over any (doc_id, txt) DataFrame.
    *
    * `maxDf` is the hot-chunk guard: a chunk shared by k documents
    * costs k²/2 pairs in the inverted-index join, so one boilerplate
    * passage (license header, navigation chrome) shared by millions of
    * docs would dominate the whole job. Chunks with document frequency
    * above `maxDf` carry no dedup signal (they're corpus-wide
    * boilerplate, not copied passages) and are dropped BEFORE the pair
    * join. The df filter is a groupBy on the same chunk key the join
    * shuffles on — co-partitioned, one cheap extra pass.
    */
  def cdcPairsOf(docs: DataFrame, minShared: Long = 3,
                 maxDf: Long = 1000): DataFrame =
    cdcPairsFromChunks(cdcChunksOf(docs), minShared, maxDf)

  /** The distinct (doc_id, chunk-hash) relation behind [[cdcPairs]] —
    * also the gate artifact: persisted, the oracle re-derives the df
    * filter, the inverted-index pair join and the `minShared`
    * threshold from the same parquet keys.
    */
  private def cdcChunksOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(graft.functions.cdc_chunks(col("txt"))).as("chunk"))
      .distinct()

  /** [[cdcPairs]] with the chunk hashes PERSISTED at the fixed gate
    * path — the CDC rolling hash stays engine-specific, everything
    * downstream (df guard, pair join, threshold) is re-derived by the
    * oracle from the same parquet.
    */
  def cdcPairsGate(spark: SparkSession, dir: String,
                   minShared: Long = 3, maxDf: Long = 1000): DataFrame = {
    val p = Gate.once(spark, "dedup_cdc", dir)(g =>
      cdcChunksOf(normed(spark, dir))
        .write.mode("overwrite").parquet(s"$g/chunks"))
    cdcPairsFromChunks(spark.read.parquet(s"$p/chunks"), minShared, maxDf)
  }

  private def cdcPairsFromChunks(chunks: DataFrame, minShared: Long,
                                 maxDf: Long): DataFrame = {
    val rare = chunks.groupBy("chunk")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("chunk")
    val kept = chunks.join(rare.hint("shuffle_hash"), Seq("chunk"), "left_semi")
    val a = kept.as("a")
    val b = kept.as("b")
    a.join(b.hint("shuffle_hash"), col("a.chunk") === col("b.chunk") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy("doc_a", "doc_b")
  }

  /** Embedding-cosine near-dup pairs, blocked by `label`. Emits pair
    * ids only: the float value itself is engine-rounding-sensitive,
    * the pair SET (threshold with empirical margin) is not. Uses the
    * native [[graft.functions.CosineSimilarity]] expression.
    *
    * ROLE: calibration/gate oracle (same discipline as
    * [[ngramJaccardPairs]]). The candidate join is all-pairs within a
    * label — O(block²), unbounded by any parameter — so this is NOT
    * the production edge source: [[embeddingPairsIvf]] blocks by IVF
    * cells (occupancy-bounded) and is what [[unionEdges]] consumes by
    * default. This operator stays because label blocking is
    * SQL-expressible, which is what lets `dedup_embedding` and the
    * `dedup_keep` gate hash-match a DuckDB oracle.
    */
  def embeddingPairs(spark: SparkSession, dir: String,
                     threshold: Double = 0.8): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val a = e.as("a")
    val b = e.as("b")
    a.join(b, col("a.label") === col("b.label") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosine_sim(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= threshold)
      .select("vec_a", "vec_b")
      .orderBy("vec_a", "vec_b")
  }

  /** Embedding near-dup pairs blocked by the IVF coarse quantiser's
    * cells ([[Ann.ivfAssign]]) — the real 100 TB blocker behind
    * [[embeddingPairs]]'s `label` stand-in. Each vector is indexed
    * under its `nprobe` nearest cells (multi-probe assignment), so a
    * near-dup pair is only missed if the two vectors share NONE of
    * their probe cells; candidates are verified with the exact cosine.
    * Pair work is bounded by (cell occupancy × nprobe²), never all
    * pairs — cells scale with corpus size like any IVF index.
    * *Rows-only* (KMeans cell boundaries are engine-specific); recall
    * vs the exact blocked operator is gated in PipelineSpec.
    */
  def embeddingPairsIvf(spark: SparkSession, dir: String,
                        threshold: Double = 0.8, cells: Int = 16,
                        nprobe: Int = 2): DataFrame =
    embeddingPairsFromProbed(embeddingProbed(spark, dir, cells, nprobe),
      threshold)

  private def embeddingProbed(spark: SparkSession, dir: String,
                              cells: Int, nprobe: Int): DataFrame = {
    val (assigned, centersDf) = graft.pipeline.Ann.ivfAssign(spark, dir, cells)
    // probe routing goes through the shared two-level router
    // ([[Ann.routeProbeExpr]] — O(√cells) loops per vector once the
    // cell count scales with the corpus); pure per-row compute, no
    // window, no model state
    val router = graft.pipeline.Ann.routerFromCenters(centersDf)
    val (rframe, rcol) =
      graft.pipeline.Ann.attachRouter(assigned.drop("cell"), router)
    rframe.select(col("vec_id"), col("v"),
      explode(graft.pipeline.Ann.routeProbeExpr(rcol, router, nprobe))
        .as("cell"))
  }

  /** [[embeddingPairsIvf]] with the multi-probe (vec_id, cell) keys
    * PERSISTED at the fixed gate path — the KMeans cells stay
    * engine-specific; the candidate join, the exact-cosine threshold
    * and the pair set are re-derived by the oracle from the same
    * parquet plus the corpus embeddings.
    */
  def embeddingPairsIvfGate(spark: SparkSession, dir: String,
                            threshold: Double = 0.8, cells: Int = 16,
                            nprobe: Int = 2): DataFrame = {
    val probed = embeddingProbed(spark, dir, cells, nprobe)
    Gate.once(spark, "dedup_embedding_ivf", dir)(g =>
      probed.select("vec_id", "cell")
        .coalesce(1).write.mode("overwrite").parquet(s"$g/probed"))
    embeddingPairsFromProbed(probed, threshold)
  }

  private def embeddingPairsFromProbed(probed: DataFrame,
                                       threshold: Double): DataFrame = {
    val a = probed.as("a")
    val b = probed.as("b")
    a.join(b, col("a.cell") === col("b.cell") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosine_sim(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= threshold)
      .select("vec_a", "vec_b")
      .distinct()
      .orderBy("vec_a", "vec_b")
  }

  /** Incremental EMBEDDING dedup: near-dup pairs between a new batch
    * of vectors (`vec_id % 7 = 0` day stand-in) and the existing
    * corpus, probing the PERSISTED IVF index
    * ([[Ann.ivfIndexWrite]]) — the embedding twin of
    * [[incrementalDedup]], completing the nightly shape: text via the
    * band index, vectors via the IVF index, neither corpus re-signed.
    *
    * Plan: batch vectors rank the literal centers in codegen
    * (no model object at probe time — the centers come FROM the
    * index), explode to their `nprobe` cells, broadcast against the
    * cell-partitioned assignments (partition-pruned to probed cells at
    * 100 TB; the corpus never shuffles), exact cosine on candidates.
    * A pair is missed only if the new vector's nprobe cells exclude
    * the corpus vector's stored cell — standard IVF search recall,
    * gated in the spec vs the exact cross-split relation.
    * *Rows-only* (KMeans cells are engine-specific).
    */
  def embeddingIncremental(spark: SparkSession, dir: String,
                           threshold: Double = 0.8, cells: Int = 16,
                           nprobe: Int = 4): DataFrame =
    embeddingIncrementalPlan(spark, dir, threshold, cells, nprobe, None)

  /** [[embeddingIncremental]] with the batch probe keys and the
    * corpus-side inverted-list keys PERSISTED at the fixed gate path
    * — given those two (id, cell) relations the oracle re-derives the
    * candidate join, the exact-cosine threshold and the pair set from
    * the corpus embeddings.
    */
  def embeddingIncrementalGate(spark: SparkSession, dir: String,
                               threshold: Double = 0.8, cells: Int = 16,
                               nprobe: Int = 4): DataFrame =
    embeddingIncrementalPlan(spark, dir, threshold, cells, nprobe,
      Some("dedup_embedding_incremental"))

  private def embeddingIncrementalPlan(spark: SparkSession, dir: String,
                                       threshold: Double, cells: Int,
                                       nprobe: Int,
                                       gateOp: Option[String]): DataFrame = {
    val idx = graft.pipeline.Ann.ivfIndexFor(spark, dir, cells)
    val router = graft.pipeline.Ann.routerFromCenters(
      spark.read.parquet(s"$idx/centers"))
    val isNew = col("vec_id") % 7 === 0
    val (bframe, bcol) = graft.pipeline.Ann.attachRouter(
      spark.read.parquet(s"$idx/assigned").filter(isNew).drop("cell"), router)
    val batch = bframe
      .select(col("vec_id").as("new_id"), col("v").as("bv"),
        explode(graft.pipeline.Ann.routeProbeExpr(bcol, router, nprobe))
          .as("cell"))
    val corpus = spark.read.parquet(s"$idx/probed").filter(!isNew)
    gateOp.foreach(op => Gate.once(spark, op, dir) { g =>
      batch.select("new_id", "cell")
        .coalesce(1).write.mode("overwrite").parquet(s"$g/batch")
      corpus.select("vec_id", "cell")
        .coalesce(1).write.mode("overwrite").parquet(s"$g/corpus")
    })
    corpus
      .join(broadcast(batch), Seq("cell"))
      .select(col("new_id"), col("vec_id").as("dup_of"),
        cosine_sim(col("bv"), col("v")).as("cos"))
      .filter(col("cos") >= threshold)
      .select("new_id", "dup_of")
      .distinct()
      .orderBy("new_id", "dup_of")
  }

  /** Near-dup pairs → dedup clusters: connected components over the
    * [[lshJaccardPairs]] edge set ([[graft.operators.Components]]),
    * every document labelled with its component's min doc_id — the
    * "keep one representative, drop the rest" step that actually
    * deduplicates a corpus once pair detection has run. Singletons
    * label themselves. The oracle computes the same components with
    * an exact recursive-CTE transitive closure over the BLOCK-EXACT
    * pair relation — so the gate also re-proves the LSH pair set
    * equals the exact one end-to-end.
    */
  def clusters(spark: SparkSession, dir: String,
               minBp: Long = 6500): DataFrame = {
    // compute-and-PUBLISH: the clusters pass is its own gate and bench
    // row, so it always runs in full — and each run refreshes the
    // shared labels artifact downstream consumers read. The replaced
    // generation's blocks are left to the ContextCleaner: an explicit
    // drop could kill a CONCURRENTLY-warming consumer mid-execution
    // (split_assign reads the memoized labels; a checkpointed frame
    // cannot recompute once its blocks are gone).
    evictStoppedComponents()
    val labels = computeClusterLabels(spark, dir, minBp)
    componentCache.put(
      (spark.sparkContext.applicationId, dir, s"lsh:$minBp"), labels)
    labels.orderBy("doc_id")
  }

  /** The shared (doc_id, rep) cluster-labels artifact, memoized per
    * (session, dir, minBp) — the dedup surface's analogue of
    * [[Ann.ivfAssign]]'s quantiser: a production pipeline computes the
    * near-dup clusters ONCE per corpus pass and every consumer
    * (split assignment, dup reporting, keep/drop) reads that table;
    * recomputing the LSH + components iteration per consumer would
    * multiply the pipeline's most expensive pass. The labels end in a
    * localCheckpoint, so reuse reads materialized blocks — the local
    * stand-in for the persisted cluster-assignment table. [[clusters]]
    * (the gated operator) always computes fresh AND refreshes this
    * cache; consumers calling here pay only their marginal cost.
    */
  private val componentCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), DataFrame]

  private def evictStoppedComponents(): Unit =
    componentCache.filterInPlace { case (_, df) =>
      !df.sparkSession.sparkContext.isStopped
    }

  private[graft] def clusterLabels(spark: SparkSession, dir: String,
                                   minBp: Long = 6500): DataFrame = {
    evictStoppedComponents()
    graft.Memo.once(componentCache,
      (spark.sparkContext.applicationId, dir, s"lsh:$minBp"),
      computeClusterLabels(spark, dir, minBp))
  }

  private def computeClusterLabels(spark: SparkSession, dir: String,
                                   minBp: Long): DataFrame =
    clusterLabelsWithCap(spark, dir, minBp, autoBucketCap(spark, dir))

  /** [[computeClusterLabels]] at an EXPLICIT cap — the spec surface
    * that proves star-listing preserves component labels (capped vs
    * uncapped equality), and the path the auto selection routes
    * through.
    */
  private[pipeline] def clusterLabelsWithCap(spark: SparkSession,
                                             dir: String, minBp: Long,
                                             cap: Option[Int]): DataFrame = {
    val pairs = lshJaccardPairs(spark, dir, minBp, bucketCap = cap)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val nodes = Tables.documents(spark, dir)
      .select(col("doc_id").as("node"))
    graft.operators.Components.connectedComponents(nodes, pairs)
      .select(col("node").as("doc_id"), col("label").as("rep"))
  }

  /** Edge-source provenance bits for [[unionEdges]]. */
  val NgramBit = 1L
  val WinnowBit = 2L
  val EmbeddingBit = 4L
  val CdcBit = 8L

  /** The UNION of the near-dup edge sets with per-edge provenance —
    * what a production dedup pass actually clusters on: no single
    * detector catches everything (ngram = global overlap, winnow =
    * contiguous runs, embedding = semantic, cdc = shared passages), so
    * the edges are pooled and `sources` records which detectors agree
    * (bit-or of [[NgramBit]]/[[WinnowBit]]/[[EmbeddingBit]]/[[CdcBit]]).
    *
    * `vec_id` is the document's embedding key (ids align 1:1 with
    * `doc_id` in the testdata, as an `embedding` column would after
    * `posexplode`-free projection), so embedding edges land in the
    * same node space. The mask aggregates with `bit_or`, so it stays
    * correct even if a detector ever emits a pair more than once.
    * Plan shape: a union of already-blocked pair streams and ONE
    * groupBy on the pair key — no new quadratic surface.
    *
    * @param includeCdc CDC chunk edges use an engine-specific rolling
    *   hash (no SQL oracle), so the `dedup_keep` gate query runs
    *   without them and PipelineSpec covers the merge-only property
    *   (adding cdc edges can only shrink the keep set).
    * @param embIvf edge source for the embedding detector. `true`
    *   (production default): [[embeddingPairsIvf]] — IVF-cell blocked,
    *   pair work bounded by cell occupancy × nprobe², the only shape
    *   that survives 100 TB. `false`: the label-blocked
    *   [[embeddingPairs]] calibration operator, which is O(label²)
    *   but SQL-expressible — the `dedup_keep` gate runs with `false`
    *   so the DuckDB oracle can rebuild the identical union (KMeans
    *   cells are engine-specific, same exclusion discipline as
    *   `includeCdc`); PipelineSpec gates the recall between the two
    *   edge sets.
    */
  def unionEdges(spark: SparkSession, dir: String,
                 includeCdc: Boolean = true,
                 embIvf: Boolean = true): DataFrame = {
    // the production edge source runs at the AUTO-SELECTED cap: exact
    // clique join at gate densities, hot-bucket star listing once the
    // band histogram shows over-threshold occupancy (sf10+)
    val ngram = lshJaccardPairs(spark, dir, minBp = 6500,
        bucketCap = autoBucketCap(spark, dir))
      .select(col("doc_a"), col("doc_b"), lit(NgramBit).as("m"))
    val winnow = winnowPairs(spark, dir)
      .select(col("doc_a"), col("doc_b"), lit(WinnowBit).as("m"))
    val embPairs =
      if (embIvf) embeddingPairsIvf(spark, dir, threshold = 0.45)
      else embeddingPairs(spark, dir, threshold = 0.45)
    val emb = embPairs
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"),
        lit(EmbeddingBit).as("m"))
    val base = ngram.union(winnow).union(emb)
    val all =
      if (includeCdc)
        base.union(cdcPairs(spark, dir, minShared = 1)
          .select(col("doc_a"), col("doc_b"), lit(CdcBit).as("m")))
      else base
    all.groupBy("doc_a", "doc_b")
      .agg(expr("bit_or(m)").as("sources"))
      .orderBy("doc_a", "doc_b")
  }

  /** The end-to-end dedup materialization: connected components over
    * [[unionEdges]], then keep = min doc_id per component — the
    * keep/drop verdict a corpus dedup actually emits (drop everything
    * whose `keep` is 0, a single anti-join at write time). Singletons
    * keep themselves. Gated as `dedup_keep` (with `includeCdc = false,
    * embIvf = false` — the two engine-specific edge sources swapped
    * for their SQL-expressible calibration forms): the oracle
    * recomputes the same components as a recursive-CTE transitive
    * closure over the identically-defined union — two independent
    * algorithms, one answer.
    */
  def keepDrop(spark: SparkSession, dir: String,
               includeCdc: Boolean = true,
               embIvf: Boolean = true): DataFrame = {
    val edges = unionEdges(spark, dir, includeCdc, embIvf)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val nodes = Tables.documents(spark, dir)
      .select(col("doc_id").as("node"))
    graft.operators.Components.connectedComponents(nodes, edges)
      .select(col("node").as("doc_id"), col("label").as("rep"),
        when(col("node") === col("label"), lit(1))
          .otherwise(lit(0)).as("keep"))
      .orderBy("doc_id")
  }

  /** Winnowing-based near-dup pairs (MOSS-style): documents sharing
    * ≥ `minShared` winnowed k-gram fingerprints
    * ([[TextAnalysis.winnowFps]], Schleimer et al. 2003). The same
    * inverted-index discipline as [[cdcPairsOf]]: fingerprints with
    * document frequency above `maxDf` are corpus boilerplate, not
    * copied passages — dropped BEFORE the pair join so one hot
    * fingerprint can't cost df²/2 pairs. Guarantee inherited from
    * winnowing: any shared run ≥ k+w−1 chars shares a fingerprint,
    * so high-overlap pairs always surface.
    */
  def winnowPairs(spark: SparkSession, dir: String,
                  minShared: Long = 20, maxDf: Long = 50): DataFrame = {
    val fps = materialize(graft.pipeline.TextAnalysis.winnowFps(spark, dir))
    val rare = fps.groupBy("fp")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("fp")
    val kept = fps.join(rare.hint("shuffle_hash"), Seq("fp"), "left_semi")
    val a = kept.as("a")
    val b = kept.as("b")
    a.join(b.hint("shuffle_hash"), col("a.fp") === col("b.fp") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy("doc_a", "doc_b")
  }

  /** Exact duplicated-substring spans (the "ExactSubstr" dedup pass,
    * Lee et al. 2022 "Deduplicating Training Data Makes Language
    * Models Better"): per document, the maximal character spans whose
    * content occurs elsewhere in the corpus (or again in the same
    * document), reported as span count + duplicated chars.
    *
    * Spark-first replacement for the paper's global suffix array
    * (which needs corpus-wide shared memory): a STRIDED K-GRAM GRID.
    * Each doc emits k-grams only at positions 1, 1+s, 1+2s, … — any
    * duplicated run of length ≥ k+s−1 (= 50 chars at k=41, s=10) must
    * contain a grid-aligned k-gram on both of its occurrences, so
    * recall at that threshold is exact, with rows = chars/s instead
    * of chars. A gram is "duplicated" when its corpus occurrence
    * count is ≥ 2 (window count over the gram key — ONE shuffle, on
    * uniformly-distributed fixed-width keys). Duplicated grid
    * positions then merge into maximal spans per doc
    * (gaps-and-islands over a per-doc window: grid neighbours ≤ k
    * apart cover contiguous text, so they fuse; span end = last grid
    * start + k−1). At 100 TB every stage is linear in chars/s except
    * the gram shuffle, whose key distribution is as uniform as the
    * text itself — no suffix array, no quadratic surface.
    *
    * The whole derivation is engine-portable (substring grid + window
    * counts), so unlike the hash-based detectors this one is
    * oracle-exact.
    */
  def substringSpans(spark: SparkSession, dir: String,
                     k: Int = 41, stride: Int = 10): DataFrame =
    substringSpansOf(normed(spark, dir), k, stride)

  /** [[substringSpans]] over any (doc_id, txt)-shaped frame. */
  private[graft] def substringSpansOf(docs: DataFrame,
                                      k: Int, stride: Int): DataFrame =
    spanListOf(docs, k, stride)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_spans"),
        sum(col("e") - col("s") + 1).cast("long").as("dup_chars"))
      .orderBy("doc_id")

  /** The maximal duplicated spans behind [[substringSpansOf]], one row
    * per span as `(doc_id, s, e)` 1-based inclusive char bounds —
    * shared by the span REPORT ([[substringSpans]]) and the span
    * REMOVAL pass ([[substringScrub]]). Spans within a doc are
    * disjoint with gap ≥ 1 (grid groups split only where consecutive
    * duplicated grid positions sit > k apart).
    */
  private[graft] def spanListOf(docs: DataFrame,
                                k: Int, stride: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grid = docs
      // docs shorter than k carry no full k-gram: out of scope (and
      // Spark's sequence() rejects an empty ascending range)
      .filter(length(col("txt")) >= k)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, length(txt) - ${k - 1}, $stride), " +
          s"i -> substring(txt, i, $k))")).as(Seq("i", "gram")))
      .select(col("doc_id"),
        (lit(1) + col("i") * stride).cast("long").as("pos"), col("gram"))
    val dup = grid
      .withColumn("n", count(lit(1)).over(Window.partitionBy("gram")))
      .filter(col("n") >= 2)
      .select("doc_id", "pos")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val prev = lag(col("pos"), 1).over(w)
    dup
      .withColumn("brk",
        when(prev.isNull || col("pos") > prev + k, 1).otherwise(0))
      .withColumn("grp", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + lit(k - 1)).as("e"))
      .select("doc_id", "s", "e")
  }

  /** Exact-substring SCRUB — the removal half of the ExactSubstr pass
    * (Lee et al. 2022; their released dedup tool cuts EVERY occurrence
    * of a duplicated substring, which is what this does): delete each
    * doc's duplicated spans ([[spanListOf]]) from its normalized text
    * and return the stitched remainder. Per-doc reassembly is a single
    * `aggregate()` fold over the sorted span array — the spans are
    * few (bounded by chars/k), the fold is per-row, and the only
    * shuffles are the span grid's gram window and the doc-keyed span
    * collect, so the pass stays linear at 100 TB exactly like the
    * span report it derives from.
    */
  def substringScrub(spark: SparkSession, dir: String,
                     k: Int = 41, stride: Int = 10): DataFrame =
    substringScrubOf(normed(spark, dir), k, stride)

  /** [[substringScrub]] over any (doc_id, txt)-shaped frame. */
  private[graft] def substringScrubOf(docs: DataFrame,
                                      k: Int, stride: Int): DataFrame = {
    val spans = spanListOf(docs, k, stride)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("spans"))
    docs
      .join(spans, Seq("doc_id"), "left")
      .withColumn("clean_text",
        when(col("spans").isNull, col("txt")).otherwise(expr(
          // fold: cursor starts at char 1; each span appends the gap
          // [cur, s) and jumps the cursor to e+1; finish appends the
          // tail. Zero-length gaps (adjacent spans, span at pos 1,
          // span ending at the last char) yield empty substrings.
          "aggregate(spans, named_struct('cur', CAST(1 AS BIGINT), 'acc', ''), " +
            "(st, sp) -> named_struct('cur', sp.e + CAST(1 AS BIGINT), " +
            "'acc', concat(st.acc, " +
            "substring(txt, CAST(st.cur AS INT), CAST(sp.s - st.cur AS INT)))), " +
            "st -> concat(st.acc, substring(txt, CAST(st.cur AS INT), " +
            "CAST(length(txt) - st.cur + 1 AS INT))))")))
      .select(col("doc_id"), col("clean_text"),
        (length(col("txt")) - length(col("clean_text")))
          .cast("long").as("n_cut_chars"))
      .orderBy("doc_id")
  }
}
