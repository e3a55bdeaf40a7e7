package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{cosine_sim, hyperplane_buckets}

/** Approximate-nearest-neighbour search over the embedding column
  * (SURVEY §2E).
  *
  * `bruteTopK` is the exactness baseline — O(|Q|·N), acceptable only
  * because |Q| is a handful of probe vectors; it is the oracle that
  * `lshTopK`'s recall is measured against (AnnSpec). `lshTopK` is the
  * scale path: candidates come from hyperplane-LSH buckets, so the
  * expensive cosine runs on a small candidate set per query.
  */
object Ann {

  private def vectors(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))

  /** Exact top-k cosine neighbours for query vectors `vec_id < nQueries`
    * (self excluded). Broadcast the tiny query side; rank per query
    * with a window (ties broken by neighbour id).
    */
  def bruteTopK(spark: SparkSession, dir: String,
                nQueries: Int = 5, k: Int = 10): DataFrame = {
    val all = vectors(spark, dir)
    val queries = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = all.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine_sim(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id")
      .orderBy("q_id", "rank")
  }

  /** LSH-bucketed approximate top-k: 16 tables × 6 random-hyperplane
    * bits (for a ~0.4-cos neighbour, P(bit agree) ≈ 0.63, so per-table
    * hit ≈ 0.63⁶ ≈ 0.06 and 16 tables give ≈ 0.65 recall; `bits`
    * scales with log N in production to keep buckets O(1)).
    *
    * Plan shape: the whole signature builds in ONE
    * [[graft.functions.HyperplaneBuckets]] call per vector (fused
    * loop, vector copied once), `posexplode` yields (table, bucket)
    * rows, queries broadcast, and the exact cosine is computed at the
    * match site so only (q_id, n_id, cos) — never the vectors — flows
    * through the dedup/rank shuffles. At 100 TB the explode side
    * shuffles on (table, bucket) — linear, and bucket occupancy (not
    * N²) bounds the join.
    */
  def lshTopK(spark: SparkSession, dir: String,
              nQueries: Int = 5, k: Int = 10,
              tables: Int = 16, bits: Int = 6, dim: Int = 64): DataFrame =
    lshTopKFrom(lshBuckets(spark, dir, tables, bits), nQueries, k)

  /** The exploded (vec_id, v, t, bucket) hyperplane-LSH relation
    * behind [[lshTopK]] — its (vec_id, t, bucket) projection is the
    * gate artifact: persisted, the oracle re-derives the candidate
    * set (bucket self-join), the exact cosine and the final ranking
    * from the same parquet.
    */
  private def lshBuckets(spark: SparkSession, dir: String,
                         tables: Int, bits: Int): DataFrame =
    vectors(spark, dir).select(col("vec_id"), col("v"),
      posexplode(hyperplane_buckets(col("v"), tables, bits)).as(Seq("t", "bucket")))

  /** [[lshTopK]] with the bucket keys PERSISTED at the fixed gate
    * path — the hyperplane hashes stay engine-specific, everything
    * downstream is hash-exact against the oracle's re-derivation.
    */
  def lshTopKGate(spark: SparkSession, dir: String,
                  nQueries: Int = 5, k: Int = 10,
                  tables: Int = 16, bits: Int = 6): DataFrame = {
    val buckets = lshBuckets(spark, dir, tables, bits)
    Gate.once(spark, "ann_lsh", dir)(g =>
      buckets.select("vec_id", "t", "bucket")
        .coalesce(1).write.mode("overwrite").parquet(s"$g/buckets"))
    lshTopKFrom(buckets, nQueries, k)
  }

  private def lshTopKFrom(buckets: DataFrame, nQueries: Int,
                          k: Int): DataFrame = {
    val qb = buckets.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("t"), col("bucket"))
    val candidates = buckets.join(broadcast(qb), Seq("t", "bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine_sim(col("qv"), col("v")).as("cos"))
      .groupBy("q_id", "n_id").agg(max("cos").as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    candidates
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id")
      .orderBy("q_id", "rank")
  }

  /** IVF-style approximate top-k: an MLlib KMeans coarse quantiser
    * partitions the corpus into `cells`; each query probes its
    * `nprobe` nearest cells and runs exact cosine only there — the
    * classic inverted-file ANN layout. At 100 TB the quantiser trains
    * on a sample, assignment is one map pass, and the probe join
    * shuffles on cell id (each cell ≈ N/cells rows, the nprobe/cells
    * fraction of the corpus is all a query touches).
    *
    * KMeans is seeded → deterministic for a fixed input partitioning;
    * still *rows-only* (cluster boundaries are engine-specific), with
    * recall vs [[bruteTopK]] gated in AnnSpec.
    */
  // keyed by applicationId: unique per SparkContext, so a stopped
  // context's cached plans can never be served to a new session (an
  // identity-hash key could collide after GC); two sessions sharing
  // one context may safely share the entry. Concurrent first calls
  // may train twice — idempotent, last write wins.
  private val quantisers =
    scala.collection.concurrent.TrieMap.empty[(String, String, Int), (DataFrame, DataFrame)]

  // PQ codebooks are plain doubles (no session resources) — keyed by
  // applicationId for the same never-reused-id reason; stale entries
  // are bytes, not cached blocks, so no eviction hook is needed
  private val pqCodebooks =
    scala.collection.concurrent.TrieMap.empty[(String, String, Int, Int, Int), Array[Array[Array[Double]]]]

  // Entries for stopped contexts are unreachable (applicationId is
  // never reused) and their cached blocks died with the executor —
  // drop them so a long-lived multi-session JVM can't grow unboundedly.
  private def evictStopped(): Unit =
    quantisers.filterInPlace { case (_, (assigned, _)) =>
      !assigned.sparkSession.sparkContext.isStopped
    }

  /** The shared IVF coarse quantiser: KMeans over the embedding
    * corpus, returning (per-vector cell assignment, cell-center dim).
    * Used by both [[ivfTopK]] and
    * [[Dedup.embeddingPairsIvf]] — one quantiser, two
    * consumers, exactly how an IVF index is shared at 100 TB: the
    * model is trained ONCE — on a bounded deterministic hash sample
    * (≤[[MaxTrainVectors]]) — and every consumer assigns against it,
    * so training is memoized per
    * (session, dir, cells) here — the local stand-in for a persisted
    * model artifact.
    */
  /** Cap on the quantiser's training-set size: KMeans quality needs a
    * representative sample, not the corpus — a full-corpus fit is the
    * one step of IVF construction that would NOT scale (10 iterations
    * × all N vectors through the driver-coordinated ML job). 100k
    * vectors is orders of magnitude more than `cells` needs.
    */
  val MaxTrainVectors = 100000L

  def ivfAssign(spark: SparkSession, dir: String,
                cells: Int = 16): (DataFrame, DataFrame) = {
    evictStopped()
    graft.Memo.once(quantisers,
      (spark.sparkContext.applicationId, dir, cells),
      trainAssignOf(vectors(spark, dir), cells))
  }

  /** Cell count at or below which the coarse quantiser trains and
    * assigns FLAT (one MLlib fit; assignment ranks every cell per
    * vector — fine while cells is a constant). Above it the quantiser
    * goes TWO-LEVEL: ≈√cells super-centers route first, then only the
    * probed super's cells are ranked — because with `cells ∝ N/256`
    * (the constant-occupancy rule the kNN family uses) a flat
    * assignment is O(N · cells) = O(N²/256) in disguise, the exact
    * at-scale defect the sf10 probe measured (knn_join 31× wall for
    * 10× data). Two-level routing makes per-vector assignment
    * O(√cells) and training O(sample·√cells), the standard
    * hierarchical-quantiser remedy (FAISS-style deployments switch to
    * a second-level quantiser once nlist passes ~10⁴).
    */
  val FlatCellsMax = 64

  /** The two-level routing structure every per-VECTOR cell operation
    * (assignment, multi-probe) evaluates against: per super-center its
    * member cells, with pre-computed norms for cosine ranking. The
    * super "center" is the MEAN of its member cells' centers — a
    * routing representative derivable from the (cell, center, super)
    * relation alone, so the persisted index needs no extra
    * `supercenters/` file and legacy flat indexes (no super column)
    * degrade to one super holding every cell, which makes the
    * two-level expressions EXACTLY the old single-level ones.
    */
  private[graft] type RouterSupers =
    Seq[(Seq[Double], Double, Seq[(Int, Seq[Double], Double)])]

  private[graft] def routerOf(
      rows: Array[(Int, Seq[Double], Int)]): RouterSupers =
    rows.groupBy(_._3).toSeq.sortBy(_._1).map { case (_, cs) =>
      val cells = cs.sortBy(_._1).map { case (id, w, _) =>
        (id, w, math.max(math.sqrt(w.map(x => x * x).sum), 1e-12))
      }.toSeq
      val dim = cells.head._2.length
      val sc = (0 until dim).map(d => cells.map(_._2(d)).sum / cells.size)
      (sc, math.max(math.sqrt(sc.map(x => x * x).sum), 1e-12), cells)
    }

  /** Build the router from any (cell, center[, super]) relation —
    * in-memory centersDf or the persisted `centers/` parquet.
    */
  private[graft] def routerFromCenters(centersDf: DataFrame): RouterSupers = {
    val hasSuper = centersDf.columns.contains("super")
    routerOf(centersDf.collect().map(r =>
      (r.getInt(0), r.getSeq[Double](1), if (hasSuper) r.getInt(2) else 0)))
  }

  /** The router as a bare plan literal — for call sites (streaming)
    * where the broadcast-relation fallback is unavailable and the
    * frame is small.
    */
  private[graft] def routerLit(router: RouterSupers): Column =
    typedLit(router)

  /** The router as a plan-side column: a nested literal under the
    * budget (ksuper·dim + cells·dim doubles), a one-row broadcast
    * relation past it — same discipline as [[attachGrid]]; a
    * million-cell router is ~500 MB of centers and must never ride
    * every task's serialized plan.
    */
  private[graft] def attachRouter(df: DataFrame, router: RouterSupers,
                                  budget: Int = MaxPlanLiteralDoubles): (DataFrame, Column) = {
    val doubles = router.map(s => s._1.size + s._3.map(_._2.size).sum).sum
    if (doubles <= budget) (df, typedLit(router))
    else {
      val sq = df.sparkSession
      import sq.implicits._
      (df.crossJoin(broadcast(Seq(Tuple1(router)).toDF("__router"))),
        col("__router"))
    }
  }

  /** Euclidean cell assignment through the router: argmin over the
    * supers (ties to the lower super), then argmin over ONLY that
    * super's cells (ties to the lower cell id — array_sort on
    * (d2, cell) structs). O(√cells) distance loops per vector instead
    * of O(cells); all loop-shaped higher-order functions, so the
    * generated code stays small at any router size.
    */
  private[graft] def routeCellExpr(routerCol: Column,
                                   v: Column = col("v")): Column = {
    val sd = transform(routerCol, s =>
      aggregate(zip_with(v, s.getField("_1"), (x, w) => (x - w) * (x - w)),
        lit(0.0), (a, y) => a + y))
    val cells = element_at(routerCol,
      array_position(sd, array_min(sd)).cast("int")).getField("_3")
    val scored = transform(cells, c =>
      struct(
        aggregate(zip_with(v, c.getField("_2"), (x, w) => (x - w) * (x - w)),
          lit(0.0), (a, y) => a + y).as("d2"),
        c.getField("_1").as("cell")))
    element_at(transform(array_sort(scored), x => x.getField("cell")), 1)
  }

  /** The `nprobe` nearest cells of `v` through the router, ranked by
    * cosine (dot/|c| — |v| is a positive per-row constant): rank the
    * supers, gather the cells of the top `min(nSupers, max(2, nprobe))`
    * supers, rank only those. With one super (flat/legacy router) this
    * is exactly the old single-level multi-probe expression — same
    * scoring, same (score desc, cell asc) tie order.
    */
  private[graft] def routeProbeExpr(routerCol: Column, router: RouterSupers,
                                    nprobe: Int,
                                    v: Column = col("v")): Column = {
    val sprobe = math.min(router.size, math.max(2, nprobe))
    val ss = transform(routerCol, (s, i) =>
      struct(
        (-aggregate(zip_with(v, s.getField("_1"), (x, w) => x * w),
          lit(0.0), (a, y) => a + y) / s.getField("_2")).as("ns"),
        i.as("pos")))
    val cand = flatten(transform(
      slice(array_sort(ss), 1, sprobe),
      x => element_at(routerCol,
        (x.getField("pos") + 1).cast("int")).getField("_3")))
    val scored = transform(cand, c =>
      struct(
        (-aggregate(zip_with(v, c.getField("_2"), (x, w) => x * w),
          lit(0.0), (a, y) => a + y) / c.getField("_3")).as("ns"),
        c.getField("_1").as("cell")))
    transform(slice(array_sort(scored), lit(1), lit(nprobe)),
      x => x.getField("cell"))
  }

  /** Driver-side Lloyd's over one super-cell's SAMPLE slice — the
    * second-level fits are many and tiny (sample/ksuper points,
    * cells/ksuper centers each), where an MLlib job per fit would pay
    * ksuper job-scheduling round-trips for milliseconds of arithmetic.
    * Deterministic: seeded init over vec_id-sorted points; an emptied
    * cluster keeps its previous center.
    */
  private def localKMeans(pts: Array[Array[Double]], k: Int, seed: Long,
                          iters: Int = 10): Array[Array[Double]] = {
    val dim = pts.head.length
    val rnd = new scala.util.Random(seed)
    val centers = rnd.shuffle(pts.indices.toVector).take(k)
      .map(i => pts(i).clone).toArray
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k, dim)(0.0)
      val cnt = new Array[Long](k)
      pts.foreach { p =>
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < k) {
          var d = 0.0; var j = 0
          while (j < dim) { val t = p(j) - centers(c)(j); d += t * t; j += 1 }
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += p(j); j += 1 }
        cnt(best) += 1
      }
      var c = 0
      while (c < k) {
        if (cnt(c) > 0) {
          var j = 0
          while (j < dim) { centers(c)(j) = sums(c)(j) / cnt(c); j += 1 }
        }
        c += 1
      }
      it += 1
    }
    centers
  }

  /** The un-memoized quantiser core over ANY (vec_id, v) relation —
    * train on the capped deterministic sample, assign the full set.
    * Returns (assigned, centersDf = (cell, center, super)). Flat at or
    * below [[FlatCellsMax]] cells; two-level above it (see there):
    * one MLlib fit for ≈√cells super-centers, then per-super local
    * Lloyd's over the sample slice, then ONE linear corpus pass
    * assigning through the router expression — no per-vector
    * all-cells ranking anywhere.
    * Both returned frames are materialized (the assignment is cached
    * and counted); callers that don't memoize unpersist when done.
    */
  private[pipeline] def trainAssignOf(vecs: DataFrame,
                                      cells: Int): (DataFrame, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = vecs.sparkSession
    val all = vecs.cache()
    // deterministic hash sample: keep ≈MaxTrainVectors rows however
    // large the corpus (xxhash64(vec_id) is a fixed uniform map, so
    // the training set is stable across runs and partitionings; no
    // global sort, one column-pruned count). n·h < n·1e6·(cap/n)
    // stays within int64 for any realistic corpus (h < 1e6).
    val n = all.count()
    val sampled0 =
      if (n <= MaxTrainVectors) all
      else all.filter(
        pmod(xxhash64(col("vec_id")), lit(1000000L)) * n
          < lit(1000000L) * MaxTrainVectors)
    // pin the training set to a FIXED deterministic partition layout
    // before fit (the quality_classifier discipline): kmeans|| init
    // samples per partition and treeAggregate sums in partition
    // order, and the scan's layout is NOT a function of the data —
    // split packing breaks equal-file-size ties by directory listing
    // order (measured: two byte-identical cloned index dirs trained
    // to entirely different centers). Fixed count + hash-on-key +
    // in-partition sort makes the centers a function of the DATA
    // only — which is also what the rebuild-equals-fresh-build spec
    // actually asserts.
    val sampled = sampled0
      .repartition(8, col("vec_id")).sortWithinPartitions("vec_id")
    if (cells <= FlatCellsMax) {
      val train = sampled.withColumn("fv", array_to_vector(col("v")))
      val model = new KMeans().setK(cells).setSeed(42L).setMaxIter(10)
        .setFeaturesCol("fv").setPredictionCol("cell")
        .fit(train)
      // assignment runs over the FULL corpus — one map pass against
      // the (tiny) trained model, the part of IVF that IS linear
      val assigned = model
        .transform(all.withColumn("fv", array_to_vector(col("v"))))
        .select("vec_id", "v", "cell").cache()
      assigned.count() // materialize BEFORE dropping the training
      all.unpersist() // cache, or the first consumer re-scans parquet
      val centers = model.clusterCenters.zipWithIndex.map { case (c, i) =>
        (i, c.toArray.toSeq, 0)
      }.toSeq
      (assigned, spark.createDataFrame(centers).toDF("cell", "center", "super"))
    } else {
      val ksuper = math.max(2, math.ceil(math.sqrt(cells.toDouble)).toInt)
      val subPerSuper = math.max(1, math.ceil(cells.toDouble / ksuper).toInt)
      val train = sampled.withColumn("fv", array_to_vector(col("v")))
      val superModel = new KMeans().setK(ksuper).setSeed(42L).setMaxIter(10)
        .setFeaturesCol("fv").setPredictionCol("sup")
        .fit(train)
      // the SAMPLE (bounded ≤ MaxTrainVectors) comes to the driver
      // once, partitioned by super — the corpus never does
      val samplePts = superModel.transform(train)
        .select(col("sup"), col("vec_id").cast("long").as("vec_id"), col("v"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
      val bySuper = samplePts.groupBy(_._1)
      val centerRows = scala.collection.mutable.ArrayBuffer.empty[(Int, Seq[Double], Int)]
      var nextId = 0
      (0 until ksuper).foreach { s =>
        val pts = bySuper.getOrElse(s, Array.empty).sortBy(_._2).map(_._3)
        if (pts.nonEmpty) {
          localKMeans(pts, math.min(subPerSuper, pts.length), seed = 42L + s)
            .foreach { c => centerRows += ((nextId, c.toSeq, s)); nextId += 1 }
        }
      }
      val router = routerOf(centerRows.toArray)
      val (frame, rcol) = attachRouter(all, router)
      val assigned = frame
        .select(col("vec_id"), col("v"), routeCellExpr(rcol).as("cell"))
        .cache()
      assigned.count()
      all.unpersist()
      (assigned,
        spark.createDataFrame(centerRows.toSeq).toDF("cell", "center", "super"))
    }
  }

  /** Per-label centroid components as exact integers: each float
    * component is floored to micro-units (IEEE double ×1e6 + floor —
    * bit-identical across engines, unlike a float mean), then summed
    * per (label, dim) with the count alongside, so any consumer can
    * form the mean at full precision. Plan shape: the ×64 posexplode
    * is immediately partial-aggregated map-side — only
    * |labels × dims| rows cross the shuffle, never the exploded
    * corpus. This is the cluster-statistics pass an IVF index
    * maintenance job runs at 100 TB.
    */
  def embeddingCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")))
      .select(col("label"), col("pos").as("dim"),
        floor(col("col").cast("double") * lit(1000000.0))
          .cast("long").as("mu"))
      .groupBy("label", "dim")
      .agg(sum("mu").as("sum_mu"), count(lit(1)).as("n"))
      .orderBy("label", "dim")

  /** Embedding outlier flags — the index-hygiene pass a vector-store
    * build runs before IVF training: vectors far from their label
    * centroid (corrupt encodes, mislabeled rows) are flagged so the
    * quantiser never trains on them. A vector is an outlier when its
    * squared centroid distance exceeds 4× the label's mean squared
    * distance (≈ 2× the RMS radius).
    *
    * Exactness discipline: components quantise to milli-units
    * (floor(x·1000) — bit-identical across engines), the centroid
    * uses TRUNCATING integer division (Spark `div` == DuckDB `//`,
    * both toward zero — verified on negatives), and the threshold is
    * the division-free integer comparison `d2·n > 4·Σd2`, so the
    * operator is oracle-exact despite the float inputs. Magnitudes:
    * |xm| ≤ ~1e3 ⇒ d2 ≤ 64·(2e3)² ≈ 2.6e8 ⇒ d2·n safe in int64 to
    * ~1e10 vectors (ANSI would raise, not wrap, beyond).
    *
    * Plan shape: per-(label, dim) sums ride the [[embeddingCentroids]]
    * posexplode + map-side partial agg (|labels × dims| rows cross the
    * shuffle); the centroid ARRAYS broadcast back and the per-vector
    * distance is a zip_with loop — the corpus is scanned twice, never
    * exploded through a shuffle.
    */
  def embeddingOutliers(spark: SparkSession, dir: String,
                        scale: Long = 1000L): DataFrame =
    embeddingOutliersOf(Tables.embeddings(spark, dir), scale)

  /** [[embeddingOutliers]] over any (vec_id, embedding, label) frame. */
  private[graft] def embeddingOutliersOf(emb: DataFrame,
                                         scale: Long = 1000L): DataFrame = {
    val xm = emb
      .select(col("vec_id"), col("label"),
        expr(s"transform(embedding, e -> " +
          s"CAST(floor(CAST(e AS DOUBLE) * $scale) AS BIGINT))").as("xm"))
    val cents = xm
      .select(col("label"), posexplode(col("xm")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(sum("v").as("sv"), count(lit(1)).as("cnt"))
      .withColumn("cm", expr("sv div cnt"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(dim, cm))), " +
        "s -> s.cm)").as("cm_arr"))
    val d2 = xm.join(broadcast(cents), Seq("label"))
      .select(col("vec_id"), col("label"),
        expr("aggregate(zip_with(xm, cm_arr, (x, c) -> (x - c) * (x - c)), " +
          "CAST(0 AS BIGINT), (a, y) -> a + y)").as("d2"))
    val radius = d2.groupBy("label")
      .agg(sum("d2").as("sd2"), count(lit(1)).as("n"))
    d2.join(broadcast(radius), Seq("label"))
      .select(col("vec_id"), col("label"), col("d2"),
        when(col("d2") * col("n") > lit(4L) * col("sd2"), 1L)
          .otherwise(0L).as("is_outlier"))
      .orderBy("vec_id")
  }

  /** Scalar (int8) quantization export of the embedding corpus — the
    * compression pass a vector store runs before shipping an index:
    * each dimension is affinely mapped onto 0..255 against the
    * corpus-wide per-dimension [min, max] range (per-dim ranges, not
    * a global one: dimensions with narrow dynamic range would
    * otherwise collapse to a handful of codes). Emitted exploded as
    * (vec_id, dim, code) plus the per-dim range in micro-units, so a
    * consumer can reconstruct `x ≈ mn + code·(mx−mn)/255`.
    *
    * Exactness discipline: values quantise to micro-units
    * (floor(x·1e6), bit-identical across engines), and the code is
    * the division-free integer expression
    * `((v − mn)·255) div (mx − mn)` — truncating int64 division on
    * both engines, no float rounding anywhere past the first floor.
    *
    * Plan shape: the per-dim range is a posexplode + map-side partial
    * min/max (shuffle carries |dims| keys), broadcast back as one
    * dims-length array; the encode itself is a pure per-split
    * transform loop — two linear scans, nothing corpus-sized is
    * shuffled at any scale.
    */
  def embeddingQuantize(spark: SparkSession, dir: String): DataFrame = {
    val xm = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        expr("transform(embedding, e -> " +
          "CAST(floor(CAST(e AS DOUBLE) * 1000000) AS BIGINT))").as("xm"))
    val ranges = xm
      .select(posexplode(col("xm")).as(Seq("dim", "v")))
      .groupBy("dim")
      .agg(min("v").as("mn"), max("v").as("mx"))
      .groupBy()
      .agg(expr("transform(array_sort(collect_list(struct(dim, mn, mx))), " +
        "s -> struct(s.mn, s.mx))").as("rng"))
    xm.join(broadcast(ranges))
      .select(col("vec_id"), posexplode(col("xm")).as(Seq("dim", "v")),
        col("rng"))
      .select(col("vec_id"), col("dim").cast("integer").as("dim"),
        col("v"),
        element_at(col("rng"), col("dim") + 1).getField("mn").as("mn"),
        element_at(col("rng"), col("dim") + 1).getField("mx").as("mx"))
      .select(col("vec_id"), col("dim"),
        when(col("mx") > col("mn"),
          expr("(v - mn) * 255 div (mx - mn)")).otherwise(0L).as("code"),
        col("mn"), col("mx"))
      .orderBy("vec_id", "dim")
  }

  /** IVF-PQ approximate top-k — the memory-scale path IVF alone
    * doesn't give: at 100 TB the raw vectors (256 B each at dim 64
    * float32) don't fit hot storage, so the scan runs on PRODUCT-
    * QUANTIZED codes (`m`=8 sub-vectors × 4-bit codebooks = 8 bytes
    * per vector, a 32× compression) and only the re-rank touches raw
    * vectors.
    *
    * Pipeline (the standard IVFADC layout):
    *  1. coarse cells from the shared [[ivfAssign]] quantiser;
    *  2. per-subspace codebooks: `m` seeded KMeans fits (`ksub`
    *     centroids over `dim/m` dims) on the SAME bounded hash sample
    *     discipline as the coarse quantiser — training never scans
    *     the corpus;
    *  3. encoding: one map pass, each normalized sub-vector to its
    *     nearest centroid id (codebooks are plan literals — no join,
    *     no UDF, stays in codegen);
    *  4. query time: per query one `m × ksub` LUT of sub-dot-products
    *     (asymmetric distance computation), broadcast with the probe
    *     list; every vector in a probed cell is scored by `m` array
    *     lookups — never a full-width dot product;
    *  5. the ADC scan carries ONLY (q_id, n_id, codes): the raw
    *     vector (64 doubles ≈ 512 B vs the 8-byte code row) never
    *     rides the per-query ranking shuffle — that width reduction
    *     IS the operator's premise. The top `rerank` winners per
    *     query (a few hundred rows) then join BACK to the vector
    *     table by `n_id` for the EXACT cosine; top-k of that is the
    *     answer.
    *
    * *Rows-only* (KMeans codebooks are engine-specific); recall@10 vs
    * [[bruteTopK]] is gated in AnnSpec.
    */
  def ivfPqTopK(spark: SparkSession, dir: String,
                nQueries: Int = 5, k: Int = 10,
                cells: Int = 16, nprobe: Int = 4,
                m: Int = 8, ksub: Int = 16, rerank: Int = 40,
                literalBudget: Int = MaxPlanLiteralDoubles): DataFrame = {
    val (assigned, centersDf) = ivfAssign(spark, dir, cells)
    val codebooks = pqCodebooksFor(spark, dir, cells, m, ksub)
    val encoded = ivfPqEncodeOf(normalized(assigned), codebooks, m,
      literalBudget = literalBudget)
    ivfPqProbePlan(encoded, centersDf,
      assigned.select(col("vec_id"), col("v")), codebooks,
      nQueries, k, nprobe, m, ksub, rerank, literalBudget)
  }

  /** Persist the IVFADC (q_id, n_id) frontier — the search's one
    * engine-specific product (PQ codebooks shape the approx scores
    * that pick it) — at the `ann_ivf_pq` gate path, once per session.
    * Given the frontier, the exact re-rank is pure portable algebra
    * (exact cosine, rank by cos desc / n_id), which the DuckDB oracle
    * re-derives from the corpus parquet.
    */
  private def ivfPqGateWrite(spark: SparkSession, dir: String,
                             nQueries: Int, cells: Int, nprobe: Int,
                             m: Int, ksub: Int, rerank: Int): Unit = {
    Gate.once(spark, "ann_ivf_pq", dir) { g =>
      val (assigned, centersDf) = ivfAssign(spark, dir, cells)
      val codebooks = pqCodebooksFor(spark, dir, cells, m, ksub)
      val encoded = ivfPqEncodeOf(normalized(assigned), codebooks, m)
      ivfPqFrontier(encoded, centersDf,
          assigned.select(col("vec_id"), col("v")), codebooks,
          nQueries, nprobe, m, ksub, rerank)
        .coalesce(1).write.mode("overwrite").parquet(s"$g/frontier")
    }
    ()
  }

  /** [[ivfPqTopK]] + the `ann_ivf_pq` gate artifact. */
  def ivfPqTopKGate(spark: SparkSession, dir: String,
                    nQueries: Int = 5, k: Int = 10,
                    cells: Int = 16, nprobe: Int = 4,
                    m: Int = 8, ksub: Int = 16, rerank: Int = 40): DataFrame = {
    ivfPqGateWrite(spark, dir, nQueries, cells, nprobe, m, ksub, rerank)
    ivfPqTopK(spark, dir, nQueries, k, cells, nprobe, m, ksub, rerank)
  }

  /** [[ivfPqTopKIndexed]] + the shared `ann_ivf_pq` gate artifact
    * (output identical to the in-memory form — same centers, same
    * codebooks, same codes, PipelineSpec-asserted — so the indexed
    * gate row shares ann_ivf_pq's oracle).
    */
  def ivfPqTopKIndexedGate(spark: SparkSession, dir: String,
                           nQueries: Int = 5, k: Int = 10,
                           cells: Int = 16, nprobe: Int = 4,
                           m: Int = 8, ksub: Int = 16, rerank: Int = 40): DataFrame = {
    ivfPqGateWrite(spark, dir, nQueries, cells, nprobe, m, ksub, rerank)
    ivfPqTopKIndexed(spark, dir, nQueries, k, cells, nprobe, m, ksub, rerank)
  }

  /** Plan-literal budget, in doubles: lookup grids at or under this
    * size ride the plan as `typedLit` arrays (zero-join, codegen'd
    * `element_at`); past it they switch to a one-row BROADCAST
    * relation cross-joined into the scan — the array then ships once
    * per executor as a broadcast block instead of being serialized
    * into every task's plan and chewed by Janino. The shipped
    * defaults (m=8, ksub=16 → SDC grid 2 k doubles) stay literal;
    * production-grade codebooks (m=64, ksub=256 → 4.2 M doubles ≈
    * 32 MB) cross the bound and degrade gracefully instead of
    * regressing plan compile time. Result equality across both paths
    * is spec-pinned at a forced zero budget.
    */
  val MaxPlanLiteralDoubles: Int = 1 << 16

  /** A flat double lookup grid as (frame-to-scan, grid column):
    * literal under `budget`, broadcast one-row relation above it.
    */
  private def attachGrid(df: DataFrame, grid: Seq[Double], name: String,
                         budget: Int): (DataFrame, Column) =
    if (grid.size <= budget) (df, typedLit(grid))
    else {
      val sq = df.sparkSession
      import sq.implicits._
      (df.crossJoin(broadcast(Seq(Tuple1(grid)).toDF(name))), col(name))
    }

  /** [[attachGrid]] for the nested per-subspace codebook array
    * (m × ksub × sub doubles).
    */
  private def attachBooks(df: DataFrame,
                          codebooks: Array[Array[Array[Double]]],
                          name: String, budget: Int): (DataFrame, Column) = {
    val nested = codebooks.map(_.map(_.toSeq).toSeq).toSeq
    val size = codebooks.map(_.map(_.length).sum).sum
    if (size <= budget) (df, typedLit(nested))
    else {
      val sq = df.sparkSession
      import sq.implicits._
      (df.crossJoin(broadcast(Seq(Tuple1(nested)).toDF(name))), col(name))
    }
  }

  /** Unit-normalize once: cosine == dot on normalized vectors, which
    * is what the PQ codebooks and LUTs quantize.
    */
  private def normalized(vecs: DataFrame): DataFrame =
    vecs.withColumn("nrm",
        expr("sqrt(greatest(aggregate(v, 0D, (a, y) -> a + y * y), 1e-12))"))
      .withColumn("vn", expr("transform(v, x -> x / nrm)"))
      .drop("nrm")

  /** codebooks(s)(c) = centroid c of subspace s — driver-side plan
    * literals (m × ksub × sub doubles ≈ 1 KB), memoized like the
    * coarse quantiser: the index is TRAINED once and QUERIED many
    * times (retraining per query would dominate every search).
    * Training runs on the bounded hash sample (same discipline as
    * [[ivfAssign]]: training never scans the corpus).
    */
  private def pqCodebooksFor(spark: SparkSession, dir: String, cells: Int,
                             m: Int, ksub: Int): Array[Array[Array[Double]]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val dim = 64
    require(dim % m == 0, "m must divide the embedding dimension")
    val sub = dim / m
    graft.Memo.once(pqCodebooks,
      (spark.sparkContext.applicationId, dir, cells, m, ksub), {
        val normed = normalized(ivfAssign(spark, dir, cells)._1)
        val n = normed.count()
        val train0 =
          if (n <= MaxTrainVectors) normed
          else normed.filter(
            pmod(xxhash64(col("vec_id")), lit(1000000L)) * n
              < lit(1000000L) * MaxTrainVectors)
        // same fixed-layout discipline as trainAssignOf: the
        // sub-quantiser fits must be a function of the data, not of
        // the upstream frame's partition layout
        val train = train0
          .repartition(8, col("vec_id")).sortWithinPartitions("vec_id")
          .select(
          (0 until m).map(s =>
            array_to_vector(expr(s"slice(vn, ${s * sub + 1}, $sub)")).as(s"s$s")): _*)
          .cache()
        // the m sub-quantiser fits are INDEPENDENT (separate columns
        // of the same cached frame, separate seeds) and each is a
        // chain of small driver-coordinated jobs — overlapping them
        // from a bounded pool (guide §2.6) back-fills the per-
        // iteration driver round-trips; per-fit seeds and data are
        // unchanged, so the coefficients are bit-identical to the
        // serial loop
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(4, m))
        val books =
          try (0 until m).map { s =>
            pool.submit(new java.util.concurrent.Callable[Array[Array[Double]]] {
              override def call(): Array[Array[Double]] =
                new KMeans().setK(ksub).setSeed(42L + s).setMaxIter(10)
                  .setFeaturesCol(s"s$s").setPredictionCol("c")
                  .fit(train).clusterCenters.map(_.toArray)
            })
          }.map(_.get()).toArray
          finally pool.shutdown()
        train.unpersist()
        books
      })
  }

  /** Encode: codes[s] = argmin_c ||vn_sub - centroid||² as a pure
    * expression over literal centroids (ties break to the lower id,
    * matching the LUT's element_at semantics).
    *
    * The codebooks enter the plan as ONE nested array literal and
    * all distances/dot-products are higher-order-function loops over
    * it. The earlier form unrolled every centroid polynomial into
    * the projection (ksub × sub literal terms per subspace, ~2k ops)
    * — Janino then died with "Code grows beyond 64 KB" and, worse,
    * the failed compile was retried on EVERY execution before the
    * interpreted fallback ran, costing ~5 s per pass on a 2k-row
    * corpus. Loop-shaped expressions keep the generated method a few
    * hundred bytes regardless of m/ksub/sub, so the same code scales
    * to production codebook sizes (m=64, ksub=256) where unrolling
    * could never compile.
    *
    * Returns the codes-only scan relation (vec_id, cell, code0..):
    * no vector column may enter the ADC stage (asserted in
    * PipelineSpec) — at 100 TB this schema is the difference between
    * scanning 8 B/vector and 512 B/vector.
    */
  private def ivfPqEncodeOf(normed: DataFrame,
                            codebooks: Array[Array[Array[Double]]],
                            m: Int,
                            cellCol: Column = col("cell"),
                            literalBudget: Int = MaxPlanLiteralDoubles): DataFrame = {
    val sub = 64 / m
    val (frame, books) = attachBooks(normed, codebooks, "pq_books", literalBudget)
    def subSlice(vec: Column, s: Int): Column =
      slice(vec, s * sub + 1, sub)
    // dists(s) = per-centroid squared L2 of subspace s
    def subDists(vec: Column, s: Int): Column =
      transform(element_at(books, lit(s + 1)), c =>
        aggregate(zip_with(subSlice(vec, s), c, (x, w) => (x - w) * (x - w)),
          lit(0.0), (a, y) => a + y))
    val codeCols = (0 until m).map { s =>
      val d = subDists(col("vn"), s)
      // argmin with ties to the lower id (array_position = first hit),
      // matching the LUT's element_at semantics
      (array_position(d, array_min(d)) - 1).cast("int").as(s"code$s")
    }
    frame.select((Seq(col("vec_id"), cellCol.as("cell")) ++ codeCols): _*)
  }

  /** The IVFADC search plan over any (codes, centers, vectors,
    * codebooks) — shared by the in-memory [[ivfPqTopK]] and the
    * persisted-index [[ivfPqTopKIndexed]], so the two are the same
    * plan over different leaves (result identity asserted in
    * PipelineSpec):
    *  - per query one `m × ksub` LUT of sub-dot-products (asymmetric
    *    distance computation), broadcast with the probe list; every
    *    vector in a probed cell is scored by `m` array lookups —
    *    never a full-width dot product;
    *  - the ADC scan carries ONLY (q_id, n_id, codes): the raw
    *    vector (64 doubles ≈ 512 B vs the 8-byte code row) never
    *    rides the per-query ranking shuffle — that width reduction
    *    IS the operator's premise. The top `rerank` winners per
    *    query (a few hundred rows) then join BACK to the vector
    *    table by `n_id` for the EXACT cosine; top-k of that is the
    *    answer.
    */
  private def ivfPqProbePlan(encoded: DataFrame, centersDf: DataFrame,
                             vecs: DataFrame,
                             codebooks: Array[Array[Array[Double]]],
                             nQueries: Int, k: Int, nprobe: Int,
                             m: Int, ksub: Int, rerank: Int,
                             literalBudget: Int = MaxPlanLiteralDoubles): DataFrame =
    pqExactRerank(vecs,
      ivfPqFrontier(encoded, centersDf, vecs, codebooks, nQueries, nprobe,
        m, ksub, rerank, literalBudget),
      nQueries, k)

  /** The IVFADC candidate stage — everything up to (and including)
    * the ADC top-`rerank` cut, emitting the (q_id, n_id) frontier the
    * exact re-rank then scores. Split out so the gate path can
    * PERSIST the frontier (the operator's one engine-specific
    * product: PQ codebooks shape the approx scores) and re-rank from
    * the read-back — which is exactly what the DuckDB oracle does.
    */
  private def ivfPqFrontier(encoded: DataFrame, centersDf: DataFrame,
                            vecs: DataFrame,
                            codebooks: Array[Array[Array[Double]]],
                            nQueries: Int, nprobe: Int,
                            m: Int, ksub: Int, rerank: Int,
                            literalBudget: Int = MaxPlanLiteralDoubles): DataFrame = {
    val sub = 64 / m
    // queries: normalized view of the tiny query slice + flat ADC LUT
    // against every centroid — lut[s*ksub + c] = <qn_sub, centroid(s)(c)>
    val queries = normalized(vecs.filter(col("vec_id") < nQueries))
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("vn").as("qn"))
    val (qFrame, books) = attachBooks(queries, codebooks, "pq_books", literalBudget)
    val withLut = qFrame.withColumn("lut",
      flatten(transform(sequence(lit(0), lit(m - 1)), s =>
        transform(element_at(books, s + 1), c =>
          aggregate(
            zip_with(slice(col("qn"), s * lit(sub) + 1, lit(sub)), c,
              (x, w) => x * w),
            lit(0.0), (a, y) => a + y)))))
    val wProbe = Window.partitionBy("q_id").orderBy(col("ccos").desc, col("cell"))
    val probes = withLut.crossJoin(broadcast(centersDf))
      .withColumn("ccos", cosine_sim(col("qv"), col("center")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select("q_id", "lut", "cell")
    // ADC scan over probed cells (m array lookups per vector) on
    // codes only, top `rerank` by approx score — nothing wider than
    // (q_id, n_id, approx) crosses the ranking shuffle
    val adc = (0 until m)
      .map(s => s"element_at(lut, $s * $ksub + code$s + 1)").mkString(" + ")
    val wAdc = Window.partitionBy("q_id").orderBy(col("approx").desc, col("n_id"))
    encoded.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), expr(adc).as("approx"))
      .withColumn("ar", row_number().over(wAdc))
      .filter(col("ar") <= rerank)
      .select("q_id", "n_id")
  }

  /** The exact re-rank stage of the IVFADC search: ONLY the
    * ~nQueries × rerank frontier pairs rehydrate raw vectors — the
    * tiny winner set broadcasts into the vector relation, query
    * vectors broadcast alongside. Shared by [[ivfPqProbePlan]] and
    * the gate path (re-rank over the PERSISTED frontier), so the
    * persisted (q_id, n_id) relation is by construction the candidate
    * set the answer was ranked from.
    */
  private def pqExactRerank(vecs: DataFrame, winners: DataFrame,
                            nQueries: Int, k: Int): DataFrame = {
    val wExact = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    val queries = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    vecs.select(col("vec_id").as("n_id"), col("v"))
      .join(broadcast(winners), Seq("n_id"))
      .join(broadcast(queries), Seq("q_id"))
      .select(col("q_id"), col("n_id"),
        cosine_sim(col("qv"), col("v")).as("cos"))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id")
      .orderBy("q_id", "rank")
  }

  def ivfTopK(spark: SparkSession, dir: String,
              nQueries: Int = 5, k: Int = 10,
              cells: Int = 16, nprobe: Int = 4): DataFrame = {
    val (assigned, centersDf) = ivfAssign(spark, dir, cells)
    ivfProbePlan(assigned, centersDf, nQueries, k, nprobe)
  }

  /** The per-query probe list: each query's `nprobe` nearest cells by
    * center cosine (ties to the lower cell id) — shared by
    * [[ivfProbePlan]] and the gate-artifact writers, so the persisted
    * (q_id, cell) relation is BY CONSTRUCTION the probe set the
    * search ran with.
    */
  private def probesOf(assigned: DataFrame, centersDf: DataFrame,
                       nQueries: Int, nprobe: Int): DataFrame = {
    val queries = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val wProbe = Window.partitionBy("q_id")
      .orderBy(col("ccos").desc, col("cell"))
    queries.crossJoin(broadcast(centersDf))
      .withColumn("ccos", cosine_sim(col("qv"), col("center")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select("q_id", "qv", "cell")
  }

  /** Persist an IVF search's engine-specific structure — the
    * (vec_id, cell) assignments and the per-query (q_id, cell) probe
    * list — at the fixed gate path `op`: the KMeans cells stay
    * engine-specific, but given these two relations the DuckDB oracle
    * re-derives the ENTIRE search (exact cosine over probed cells,
    * rank by cos desc / n_id) from the corpus parquet, flipping the
    * gate from rows-only to hash-exact.
    */
  private def ivfGateWrite(spark: SparkSession, op: String, dir: String,
                           assigned: DataFrame, centersDf: DataFrame,
                           nQueries: Int, nprobe: Int): Unit = {
    Gate.once(spark, op, dir) { g =>
      assigned.select("vec_id", "cell")
        .coalesce(1).write.mode("overwrite").parquet(s"$g/assigned")
      probesOf(assigned, centersDf, nQueries, nprobe).select("q_id", "cell")
        .coalesce(1).write.mode("overwrite").parquet(s"$g/probes")
    }
    ()
  }

  /** [[ivfTopK]] + the `ann_ivf` gate artifact (assignments + probe
    * lists persisted once per session; same memoized quantiser, so
    * the search output is exactly what the oracle re-derives).
    */
  def ivfTopKGate(spark: SparkSession, dir: String,
                  nQueries: Int = 5, k: Int = 10,
                  cells: Int = 16, nprobe: Int = 4): DataFrame = {
    val (assigned, centersDf) = ivfAssign(spark, dir, cells)
    ivfGateWrite(spark, "ann_ivf", dir, assigned, centersDf, nQueries, nprobe)
    ivfProbePlan(assigned, centersDf, nQueries, k, nprobe)
  }

  /** [[ivfTopKIndexed]] + the shared `ann_ivf` gate artifact (output
    * is identical to [[ivfTopK]] — same centers, same probe order,
    * AnnSpec-asserted — so the indexed gate row shares ann_ivf's
    * oracle).
    */
  def ivfTopKIndexedGate(spark: SparkSession, dir: String,
                         nQueries: Int = 5, k: Int = 10,
                         cells: Int = 16, nprobe: Int = 4): DataFrame = {
    annIvfGateArtifact(spark, dir, nQueries, cells, nprobe)
    ivfTopKIndexed(spark, dir, nQueries, k, cells, nprobe)
  }

  /** Write the shared `ann_ivf` gate artifact without running the
    * search — for gate rows (`ann_ivf_indexed`, `ann_stream`) whose
    * output is row-identical to `ann_ivf` (spec-asserted) and which
    * therefore share its oracle.
    */
  private[graft] def annIvfGateArtifact(spark: SparkSession, dir: String,
                                        nQueries: Int = 5, cells: Int = 16,
                                        nprobe: Int = 4): Unit = {
    val (assigned, centersDf) = ivfAssign(spark, dir, cells)
    ivfGateWrite(spark, "ann_ivf", dir, assigned, centersDf, nQueries, nprobe)
  }

  /** The IVF search plan over any (assignments, centers) pair — shared
    * by the in-memory [[ivfTopK]] and the persisted-index
    * [[ivfTopKIndexed]], so the two are the same plan over different
    * leaves (and the spec can assert result identity).
    */
  private def ivfProbePlan(assigned: DataFrame, centersDf: DataFrame,
                           nQueries: Int, k: Int, nprobe: Int): DataFrame = {
    val probes = probesOf(assigned, centersDf, nQueries, nprobe)
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine_sim(col("qv"), col("v")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id")
      .orderBy("q_id", "rank")
  }

  /** Full-corpus kNN JOIN: the top-`k` cosine neighbours of EVERY
    * vector (not just a query set) — the kNN-graph builder behind
    * SemDeDup-style semantic curation, cluster-quality audits and
    * graph-based label propagation. Exact all-pairs is N² by
    * definition, so candidates come from symmetric multi-probe IVF
    * blocking: each vector enters its `nprobe` nearest cells (ranked
    * in codegen over the literal centers — no model state, no
    * vector-carrying rank shuffle), and only same-cell pairs are
    * scored. A true neighbour is missed only if the two vectors share
    * none of their probe cells (recall gated in PipelineSpec).
    *
    * Plan shape — IVF blocking, PQ candidate scoring, exact re-rank:
    * the cell shuffle carries (vec_id, cell, 8 PQ codes) — never the
    * raw vector (≈64× narrower; at 100 TB the candidate shuffle width
    * IS the operator's cost), candidate pairs are scored by m
    * symmetric-distance table lookups (SDC: the literal centroid ×
    * centroid dot grid — the join analogue of ivfPqProbePlan's
    * per-query ADC LUT), and only the top-`rerank` frontier per query
    * rehydrates raw vectors for the exact cosine that ranks the final
    * top-k. Pair work stays bounded by cell occupancy × nprobe²: the
    * cell count GROWS with the corpus (`max(cellsMin, N/256)` —
    * constant ~256 target occupancy; a fixed cell count would quietly
    * go quadratic the moment the corpus outgrew it), with N read from
    * parquet footers (metadata — no count() job), and KMeans training
    * stays bounded on the capped deterministic sample. With `rerank` ≥
    * a query's candidate count the result is value-identical to exact
    * cosine over all candidates ([[knnJoinExactCand]], spec-asserted).
    * *Rows-only* (KMeans cells are engine-specific).
    *
    * CANDIDATE REPRESENTATION IS SELECTED BY CORPUS SIZE (from the
    * same footer-derived count that sizes the cells): below
    * `pqThreshold` vectors the exact-candidates form wins — its one
    * cell shuffle beats PQ's extra frontier + re-rank stages while
    * everything fits comfortably — and above it the PQ form's ~64×
    * narrower shuffle takes over. Measured crossover trend on one
    * 32-core node (KnnCrossover, min-of-two warm): PQ/exact =
    * 2.1–3.0 at 0.5 M vectors (run-condition spread), 1.58 at 5 M —
    * the gap closes with scale,
    * extrapolating to parity around ~10⁸ vectors locally; a real
    * cluster pays network for every shuffle byte, so the default
    * threshold sits at 50 M. Both forms share the IVF blocking and
    * the recall gate; PipelineSpec pins each form explicitly and
    * asserts their value identity at full frontier.
    */
  def knnJoin(spark: SparkSession, dir: String,
              k: Int = 5, cellsMin: Int = 16, nprobe: Int = 2,
              m: Int = 8, ksub: Int = 16, rerank: Int = 128,
              literalBudget: Int = MaxPlanLiteralDoubles,
              pqThreshold: Long = KnnPqThresholdVectors): DataFrame = {
    val nVecs = graft.sources.StorageStats.parquetRowCount(
      spark, s"$dir/embeddings.parquet")
    if (nVecs < pqThreshold) knnJoinExactCand(spark, dir, k, cellsMin, nprobe)
    else knnJoinPq(spark, dir, k, cellsMin, nprobe, m, ksub, rerank,
      literalBudget)
  }

  /** Corpus size (vectors) above which [[knnJoin]] switches from
    * exact-candidates to PQ codes on the candidate shuffle.
    */
  val KnnPqThresholdVectors: Long = 50L * 1000 * 1000

  /** The PQ-codes candidate scorer — [[knnJoin]]'s large-corpus arm
    * (see the selection note there).
    */
  private[graft] def knnJoinPq(spark: SparkSession, dir: String,
                               k: Int = 5, cellsMin: Int = 16,
                               nprobe: Int = 2, m: Int = 8, ksub: Int = 16,
                               rerank: Int = 128,
                               literalBudget: Int = MaxPlanLiteralDoubles): DataFrame = {
    // corpus size from parquet FOOTERS (metadata, no count() job) —
    // in production this scalar comes off the table manifest
    val n = graft.sources.StorageStats.parquetRowCount(
      spark, s"$dir/embeddings.parquet")
    val cells = math.max(cellsMin, (n / 256L).toInt)
    val (assigned, centersDf) = ivfAssign(spark, dir, cells)
    val codebooks = pqCodebooksFor(spark, dir, cells, m, ksub)
    val router = routerFromCenters(centersDf)
    // candidate relation: (vec_id, probe cell, 8 PQ codes) — the raw
    // vector NEVER enters the pair join; each row is ~8 B of codes vs
    // 512 B of doubles, so the cell shuffle (the operator's dominant
    // movement) is ~64× narrower than the exact-candidates form.
    // Probing routes two-level (supers first) — O(√cells) per vector.
    val (rframe, rcol) = attachRouter(normalized(assigned.drop("cell")),
      router, literalBudget)
    val probed = ivfPqEncodeOf(rframe, codebooks, m,
      explode(routeProbeExpr(rcol, router, nprobe)), literalBudget)
    // symmetric distance tables (SDC): per subspace the centroid ×
    // centroid dot-product grid — m·ksub² doubles, a flat plan
    // literal while under the budget and a one-row broadcast relation
    // past it (32 MB at production m=64/ksub=256 must not ride every
    // task's serialized plan); a candidate pair is scored by m array
    // lookups, never a full-width dot product (the join analogue of
    // ivfPqProbePlan's per-query ADC LUT, which would cost a 1 KB LUT
    // column per ROW when every vector is a query)
    val sdcGrid = (for {
      s <- 0 until m; a <- 0 until ksub; b <- 0 until ksub
    } yield codebooks(s)(a).zip(codebooks(s)(b)).map { case (x, y) => x * y }.sum).toSeq
    val joined = probed.as("a")
      .join(probed.as("b"), col("a.cell") === col("b.cell") &&
        col("a.vec_id") =!= col("b.vec_id"))
    val (scored, sdc) = attachGrid(joined, sdcGrid, "sdc_grid", literalBudget)
    val approx = (0 until m).map { s =>
      element_at(sdc,
        (lit(s * ksub * ksub) + col(s"a.code$s") * lit(ksub) +
          col(s"b.code$s") + lit(1)).cast("int"))
    }.reduce(_ + _)
    val cand = scored
      .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("n_id"),
        approx.as("approx"))
      // a pair sharing several probe cells appears once per cell;
      // approx is pair-deterministic, so max() is just the dedup
      .groupBy("q_id", "n_id").agg(max("approx").as("approx"))
    // top `rerank` frontier per query by approximate score — only
    // these rehydrate raw vectors for the exact cosine, so the
    // full-width rows number N·rerank instead of N·candidates
    val wA = Window.partitionBy("q_id").orderBy(col("approx").desc, col("n_id"))
    val frontier = cand.withColumn("fr", row_number().over(wA))
      .filter(col("fr") <= rerank)
      .select("q_id", "n_id")
    val vecs = assigned.select(col("vec_id"), col("v"))
    val exact = frontier
      .join(vecs.select(col("vec_id").as("n_id"), col("v").as("nv")), Seq("n_id"))
      .join(vecs.select(col("vec_id").as("q_id"), col("v").as("qv")), Seq("q_id"))
      .select(col("q_id"), col("n_id"),
        cosine_sim(col("qv"), col("nv")).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id")
      .orderBy("q_id", "rank")
  }

  /** The exact-candidates scorer (exact cosine over EVERY same-cell
    * pair, full vectors riding the cell shuffle) — [[knnJoin]]'s
    * small-corpus arm (measured faster below the selection threshold;
    * see the selection note there) and the equality reference for the
    * PQ arm: with a frontier wide enough to hold a query's whole
    * candidate set the two are value-identical by construction, and
    * PipelineSpec asserts exactly that.
    */
  private[graft] def knnJoinExactCand(spark: SparkSession, dir: String,
                                      k: Int = 5, cellsMin: Int = 16,
                                      nprobe: Int = 2): DataFrame =
    knnExactFromProbed(knnProbed(spark, dir, cellsMin, nprobe), k)

  /** The symmetric multi-probe (vec_id, v, cell) relation behind the
    * exact-candidates kNN arm — its (vec_id, cell) projection is the
    * gate artifact: persisted, the oracle re-derives candidates
    * (same-cell pairs), exact cosine and the final per-query ranking.
    */
  private def knnProbed(spark: SparkSession, dir: String,
                        cellsMin: Int, nprobe: Int): DataFrame = {
    val n = graft.sources.StorageStats.parquetRowCount(
      spark, s"$dir/embeddings.parquet")
    val cells = math.max(cellsMin, (n / 256L).toInt)
    val (assigned, centersDf) = ivfAssign(spark, dir, cells)
    val router = routerFromCenters(centersDf)
    val (rframe, rcol) = attachRouter(assigned.drop("cell"), router)
    rframe.select(col("vec_id"), col("v"),
      explode(routeProbeExpr(rcol, router, nprobe)).as("cell"))
  }

  /** [[knnJoin]] + the `knn_join` gate artifact. Only the
    * exact-candidates arm persists (every gate/bench scale selects it
    * — the PQ arm starts at [[KnnPqThresholdVectors]] vectors, where
    * no oracle runs); the footer-derived arm selection is unchanged.
    */
  def knnJoinGate(spark: SparkSession, dir: String,
                  k: Int = 5, cellsMin: Int = 16, nprobe: Int = 2,
                  pqThreshold: Long = KnnPqThresholdVectors): DataFrame = {
    val nVecs = graft.sources.StorageStats.parquetRowCount(
      spark, s"$dir/embeddings.parquet")
    if (nVecs < pqThreshold) {
      val probed = knnProbed(spark, dir, cellsMin, nprobe)
      Gate.once(spark, "knn_join", dir)(g =>
        probed.select("vec_id", "cell")
          .coalesce(1).write.mode("overwrite").parquet(s"$g/probed"))
      knnExactFromProbed(probed, k)
    } else knnJoinPq(spark, dir, k, cellsMin, nprobe)
  }

  private def knnExactFromProbed(probed: DataFrame, k: Int): DataFrame = {
    val cand = probed.as("a")
      .join(probed.as("b"), col("a.cell") === col("b.cell") &&
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("n_id"),
        cosine_sim(col("a.v"), col("b.v")).as("cos"))
      .groupBy("q_id", "n_id").agg(max("cos").as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id")
      .orderBy("q_id", "rank")
  }

  /** Persist the shared IVF quantiser as a parquet index:
    * `assigned/` = (vec_id, v, cell) partitioned BY CELL — so a probe
    * of `nprobe` cells is a partition-pruned read touching only those
    * directories, the file-layout analogue of an inverted list —
    * and `centers/` = the (cell, center) model. Same
    * persist-at-layout-time discipline as [[Dedup.bandIndexWriteOf]]:
    * at 100 TB the corpus is assigned once, and every later search /
    * incremental-dedup job probes the artifact without re-training or
    * re-assigning anything.
    */
  def ivfIndexWrite(spark: SparkSession, dir: String, outDir: String,
                    cells: Int = 16): Unit = {
    val (assigned, centersDf) = ivfAssign(spark, dir, cells)
    writeIndexParts(assigned, centersDf, outDir)
  }

  /** Write the three index relations of a trained quantiser — shared
    * by fresh build ([[ivfIndexWrite]]) and [[ivfIndexRebuild]]'s
    * staging pass. `probed/` is the dedup-grade inverted list: each
    * vector listed under its [[IndexNprobe]] nearest cells
    * (multi-probe INDEXING, the storage-for-recall trade IVF dedup
    * needs at low thresholds — a probe misses a vector only if the
    * probe cells and all its index cells are disjoint).
    */
  private def writeIndexParts(assigned: DataFrame, centersDf: DataFrame,
                              outDir: String): Unit = {
    assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$outDir/assigned")
    centersDf.write.mode("overwrite").parquet(s"$outDir/centers")
    val router = routerFromCenters(centersDf)
    val (rframe, rcol) = attachRouter(assigned.drop("cell"), router)
    rframe.select(col("vec_id"), col("v"),
        explode(routeProbeExpr(rcol, router, IndexNprobe)).as("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$outDir/probed")
  }

  /** How many cells each vector is indexed under in the persisted
    * `probed/` inverted list (multi-probe indexing).
    */
  val IndexNprobe = 2

  // blocking memo (Memo.once): index-family queries share these
  // artifacts and may warm concurrently — a check-then-act flag would
  // let the second caller read a half-written index
  private val builtIvfIndexes =
    scala.collection.concurrent.TrieMap.empty[String, Unit]

  /** [[ivfTopK]] against the PERSISTED index (built once per session;
    * the production artifact is written once at corpus layout).
    * Identical output to the in-memory form — same centers, same
    * probe order, same exact-cosine ranking — which AnnSpec asserts.
    */
  def ivfTopKIndexed(spark: SparkSession, dir: String,
                     nQueries: Int = 5, k: Int = 10,
                     cells: Int = 16, nprobe: Int = 4): DataFrame = {
    val idx = ivfIndexFor(spark, dir, cells)
    ivfProbePlan(
      spark.read.parquet(s"$idx/assigned"),
      spark.read.parquet(s"$idx/centers"), nQueries, k, nprobe)
  }

  private[graft] def ivfIndexFor(spark: SparkSession, dir: String,
                                 cells: Int): String = {
    val idx = graft.sources.TmpDir.scoped("ivfindex",
      spark.sparkContext.applicationId, s"$dir:$cells")
    graft.Memo.once(builtIvfIndexes, idx,
      ivfIndexWrite(spark, dir, idx, cells))
    idx
  }

  /** Nightly IVF index maintenance: append a vector batch to the
    * persisted index WITHOUT retraining and WITHOUT touching any
    * existing file — new part files land under the batch's cell
    * directories, everything already committed stays byte-identical
    * (spec-asserted). Assignment routes through the persisted centers'
    * router ([[routeCellExpr]] — the quantiser's own euclidean-argmin
    * rule, two-level when the index is, so an appended vector lands
    * exactly where an index rebuild would put it); `probed/`
    * membership uses the same multi-probe cosine ranking the index was
    * built with. Centers drift as the corpus grows is the operator's
    * known debt — production re-trains on a cadence and rebuilds,
    * exactly like any IVF deployment.
    */
  def ivfIndexAppend(spark: SparkSession, idx: String,
                     batch: DataFrame): Unit = {
    val router = routerFromCenters(spark.read.parquet(s"$idx/centers"))
    val (af, ac) = attachRouter(batch, router)
    af.select(col("vec_id"), col("v"), routeCellExpr(ac).as("cell"))
      .write.mode("append").partitionBy("cell")
      .parquet(s"$idx/assigned")
    val (pf, pc) = attachRouter(batch, router)
    pf.select(col("vec_id"), col("v"),
        explode(routeProbeExpr(pc, router, IndexNprobe)).as("cell"))
      .write.mode("append").partitionBy("cell")
      .parquet(s"$idx/probed")
  }

  // blocking memo (Memo.once): index-family queries share these
  // artifacts and may warm concurrently — a check-then-act flag would
  // let the second caller read a half-written index
  private val builtAppendIndexes =
    scala.collection.concurrent.TrieMap.empty[String, Unit]

  /** The append gate's fixture + search: clone the corpus index (a
    * production append mutates in place; the clone keeps the memoized
    * base index pristine for its other consumers), append a
    * re-ingested-duplicates batch (`vec_id % 11 == 0`, shifted ids,
    * identical vectors — the nightly arrival every dedup-less ingest
    * produces), and search it. The duplicates surface as cos≈1
    * neighbours of their originals — PipelineSpec asserts the rank-1
    * hit, assignment identity with the originals' cells, and that
    * append left every pre-existing file untouched.
    */
  def ivfTopKAppended(spark: SparkSession, dir: String,
                      nQueries: Int = 5, k: Int = 10,
                      cells: Int = 16, nprobe: Int = 4): DataFrame = {
    val idx = appendedIndexFor(spark, dir, cells)
    ivfProbePlan(
      spark.read.parquet(s"$idx/assigned"),
      spark.read.parquet(s"$idx/centers"), nQueries, k, nprobe)
  }

  /** [[ivfTopKAppended]] + its gate artifact: the APPENDED index's
    * assignments and probe lists persist at the fixed gate path, and
    * the oracle reconstructs the appended vector set itself (the
    * fixture batch is `vec_id % 11 = 0` shifted by 1e6 with identical
    * vectors — derivable from the corpus parquet), then re-derives the
    * search exactly like `ann_ivf`'s gate.
    */
  def ivfTopKAppendedGate(spark: SparkSession, dir: String,
                          nQueries: Int = 5, k: Int = 10,
                          cells: Int = 16, nprobe: Int = 4): DataFrame = {
    val idx = appendedIndexFor(spark, dir, cells)
    val assigned = spark.read.parquet(s"$idx/assigned")
    val centersDf = spark.read.parquet(s"$idx/centers")
    ivfGateWrite(spark, "ann_index_append", dir, assigned, centersDf,
      nQueries, nprobe)
    ivfProbePlan(assigned, centersDf, nQueries, k, nprobe)
  }

  private[graft] def appendedIndexFor(spark: SparkSession, dir: String,
                                      cells: Int): String = {
    val src = ivfIndexFor(spark, dir, cells)
    val idx = graft.sources.TmpDir.scoped("ivfappend",
      spark.sparkContext.applicationId, s"$dir:$cells")
    graft.Memo.once(builtAppendIndexes, idx, {
      cloneIndex(spark, src, idx)
      val batch = spark.read.parquet(s"$src/assigned")
        .filter(pmod(col("vec_id"), lit(11)) === 0)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"), col("v"))
      ivfIndexAppend(spark, idx, batch)
    })
    idx
  }

  /** Copy an index's three relations (fixture plumbing: production
    * rebuild/append mutate in place; specs and gate fixtures clone so
    * the memoized base index stays pristine for its other consumers).
    *
    * Filesystem-level recursive copy, not a read→write re-encode: a
    * clone's contract is byte-identical relations under a new root,
    * and the three Spark jobs this replaces re-shuffled and re-coded
    * every cell directory (measured as the bulk of
    * `ann_index_append`'s 28 s cold build — the suite's single worst
    * fixture). A production clone is likewise a file-level copy (or a
    * storage snapshot), never a decode/encode pass.
    */
  private[graft] def cloneIndex(spark: SparkSession, src: String,
                                dst: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val srcPath = new org.apache.hadoop.fs.Path(src)
    val dstPath = new org.apache.hadoop.fs.Path(dst)
    val fs = srcPath.getFileSystem(conf)
    Seq("assigned", "probed", "centers").foreach { sub =>
      val d = new org.apache.hadoop.fs.Path(dstPath, sub)
      fs.delete(d, true)
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new org.apache.hadoop.fs.Path(srcPath, sub),
        fs, d, false /* deleteSource */, true /* overwrite */, conf)
    }
  }

  private val RebuildStage = ".rebuild_stage"
  private val RebuildTrash = ".rebuild_trash"

  /** Cadence rebuild of a persisted IVF index — the operator that
    * RETIRES [[ivfIndexAppend]]'s documented centers-drift debt:
    * retrain the coarse quantiser on the index's CURRENT corpus (the
    * capped deterministic sample, exactly like a fresh build),
    * re-assign every vector, re-derive the multi-probe inverted list,
    * and commit the three relations by the PartitionSwap staged-
    * rename protocol so searchers see the old index until the swap
    * and the new one after — never a mix, with every crash window
    * recoverable ([[graft.sources.PartitionSwap.recover]] runs
    * first, so a rebuild killed mid-commit completes or rolls back
    * on the next invocation).
    *
    * Scale shape: one training sample, one linear re-assign pass, two
    * partitioned writes — the same cost as the original build, paid
    * on the rebuild cadence; consumers cut over atomically per
    * relation (assigned → centers → probed, so a reader pinning the
    * directory set mid-swap can at worst mix new assignments with old
    * centers for the probe ORDER — recall-neutral, since ranking is
    * exact cosine over the probed rows). Search parity with a
    * from-scratch build on the same corpus is spec-asserted.
    */
  def ivfIndexRebuild(spark: SparkSession, idx: String,
                      cells: Int = 16): Unit = {
    val root = new org.apache.hadoop.fs.Path(idx)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sources.PartitionSwap.recover(fs, root, RebuildStage, RebuildTrash)
    val current = spark.read.parquet(s"$idx/assigned").select("vec_id", "v")
    val (assigned, centersDf) = trainAssignOf(current, cells)
    writeIndexParts(assigned, centersDf, s"$idx/$RebuildStage")
    Seq("assigned", "centers", "probed").foreach { sub =>
      graft.sources.PartitionSwap.commit(fs, root, sub, RebuildStage, RebuildTrash)
    }
    fs.delete(new org.apache.hadoop.fs.Path(root, RebuildStage), true)
    fs.delete(new org.apache.hadoop.fs.Path(root, RebuildTrash), true)
    assigned.unpersist()
  }

  // blocking memo (Memo.once): index-family queries share these
  // artifacts and may warm concurrently — a check-then-act flag would
  // let the second caller read a half-written index
  private val builtRebuiltIndexes =
    scala.collection.concurrent.TrieMap.empty[String, Unit]

  /** The rebuild gate's lifecycle fixture + search: clone the
    * APPENDED index (build → append — the drifted state every nightly
    * ingest accumulates), rebuild it in place, and search the result.
    * PipelineSpec asserts parity with a from-scratch build over the
    * same vector set and that no stage/trash residue survives.
    */
  def ivfTopKRebuilt(spark: SparkSession, dir: String,
                     nQueries: Int = 5, k: Int = 10,
                     cells: Int = 16, nprobe: Int = 4): DataFrame = {
    val idx = rebuiltIndexFor(spark, dir, cells)
    ivfProbePlan(
      spark.read.parquet(s"$idx/assigned"),
      spark.read.parquet(s"$idx/centers"), nQueries, k, nprobe)
  }

  /** [[ivfTopKRebuilt]] + its gate artifact — same discipline as the
    * append gate: the REBUILT index's (retrained) assignments and
    * probe lists persist, the oracle re-derives the search over the
    * same appended vector set.
    */
  def ivfTopKRebuiltGate(spark: SparkSession, dir: String,
                         nQueries: Int = 5, k: Int = 10,
                         cells: Int = 16, nprobe: Int = 4): DataFrame = {
    val idx = rebuiltIndexFor(spark, dir, cells)
    val assigned = spark.read.parquet(s"$idx/assigned")
    val centersDf = spark.read.parquet(s"$idx/centers")
    ivfGateWrite(spark, "ann_index_rebuild", dir, assigned, centersDf,
      nQueries, nprobe)
    ivfProbePlan(assigned, centersDf, nQueries, k, nprobe)
  }

  private[graft] def rebuiltIndexFor(spark: SparkSession, dir: String,
                                     cells: Int): String = {
    val src = appendedIndexFor(spark, dir, cells)
    val idx = graft.sources.TmpDir.scoped("ivfrebuild",
      spark.sparkContext.applicationId, s"$dir:$cells")
    graft.Memo.once(builtRebuiltIndexes, idx, {
      cloneIndex(spark, src, idx)
      ivfIndexRebuild(spark, idx, cells)
    })
    idx
  }

  /** Persist the full IVF-PQ index — the artifact a 100 TB vector
    * store actually serves searches from, where [[ivfPqTopK]]'s
    * session-memoized codebooks are only the local stand-in:
    * `codes/` = (vec_id, code0..code{m-1}) partitioned BY CELL (the
    * 8-byte-per-vector scan relation; the directory layout is the
    * inverted list, so an nprobe probe is a partition-pruned read
    * that never touches 512-byte raw rows), `codebooks/` = (s, c, w)
    * centroid rows (m × ksub × dim/m doubles ≈ 8 KB — read and
    * folded back into plan literals at query time), and `centers/` =
    * the coarse quantiser. Raw vectors stay in the corpus table —
    * only the re-rank's ~rerank winners per query ever read them.
    */
  def ivfPqIndexWrite(spark: SparkSession, dir: String, outDir: String,
                      cells: Int = 16, m: Int = 8, ksub: Int = 16): Unit = {
    val (assigned, centersDf) = ivfAssign(spark, dir, cells)
    val codebooks = pqCodebooksFor(spark, dir, cells, m, ksub)
    ivfPqEncodeOf(normalized(assigned), codebooks, m)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$outDir/codes")
    val rows = for {
      s <- codebooks.indices
      c <- codebooks(s).indices
    } yield (s, c, codebooks(s)(c).toSeq)
    spark.createDataFrame(rows).toDF("s", "c", "w")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/codebooks")
    centersDf.write.mode("overwrite").parquet(s"$outDir/centers")
  }

  // blocking memo (Memo.once): index-family queries share these
  // artifacts and may warm concurrently — a check-then-act flag would
  // let the second caller read a half-written index
  private val builtPqIndexes =
    scala.collection.concurrent.TrieMap.empty[String, Unit]

  /** [[ivfPqTopK]] against the PERSISTED index (built once per
    * session; the production artifact is written once at corpus
    * layout): codebooks rehydrate from parquet into the same plan
    * literals, the ADC scan reads the cell-partitioned `codes/`
    * relation, and only the re-rank touches the corpus vectors.
    * Identical output to the in-memory form — same centers, same
    * codebooks (doubles round-trip parquet exactly), same integer
    * codes — which PipelineSpec asserts.
    */
  def ivfPqTopKIndexed(spark: SparkSession, dir: String,
                       nQueries: Int = 5, k: Int = 10,
                       cells: Int = 16, nprobe: Int = 4,
                       m: Int = 8, ksub: Int = 16, rerank: Int = 40): DataFrame = {
    val idx = ivfPqIndexFor(spark, dir, cells, m, ksub)
    val codebooks: Array[Array[Array[Double]]] =
      spark.read.parquet(s"$idx/codebooks").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
        .groupBy(_._1).toArray.sortBy(_._1)
        .map(_._2.sortBy(_._2).map(_._3))
    ivfPqProbePlan(
      spark.read.parquet(s"$idx/codes"),
      spark.read.parquet(s"$idx/centers"),
      vectors(spark, dir), codebooks,
      nQueries, k, nprobe, m, ksub, rerank)
  }

  private[graft] def ivfPqIndexFor(spark: SparkSession, dir: String,
                                   cells: Int, m: Int, ksub: Int): String = {
    val idx = graft.sources.TmpDir.scoped("ivfpqindex",
      spark.sparkContext.applicationId, s"$dir:$cells:$m:$ksub")
    graft.Memo.once(builtPqIndexes, idx,
      ivfPqIndexWrite(spark, dir, idx, cells, m, ksub))
    idx
  }
}
