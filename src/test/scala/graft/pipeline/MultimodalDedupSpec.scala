package graft.pipeline

import graft.SparkSpec

/** Gates for payload-level multimodal dedup:
  *
  *  - `mm_dedup_exact` groups are verified by ACTUAL byte equality
  *    (brute-force pairwise compare of the collected payload table)
  *    and must contain every planted exact clone;
  *  - `mm_dedup_near` must equal the brute-force Hamming ≤ k pair
  *    set over the signature table (the multi-index bucketing is an
  *    optimization, never a semantic) and must find every planted
  *    near clone;
  *  - [[Multimodal.blockSig]] properties are pinned with controlled
  *    payloads where the expected signature is derivable by hand.
  */
class MultimodalDedupSpec extends SparkSpec {

  test("blockSig: uniform payload is all-zero; one hot block flips " +
       "exactly its own bit; identical payloads agree") {
    val uniform = Array.fill[Byte](640)(7)
    assert(Multimodal.blockSig(uniform) == 0L)
    // bump block 3 hard: its mean rises above the overall mean, and
    // every other block's strict compare stays false (their sums are
    // unchanged while the total grew) -> exactly bit 3 set
    val hot = uniform.clone()
    (30 until 40).foreach(i => hot(i) = 127)
    assert(Multimodal.blockSig(hot) == (1L << 3))
    assert(Multimodal.blockSig(hot) == Multimodal.blockSig(hot.clone()))
    // degenerate sizes: empty and shorter-than-64 payloads are legal
    assert(Multimodal.blockSig(Array.empty[Byte]) == 0L)
    val tiny = Array[Byte](1, 9, 1)
    assert(Multimodal.blockSig(tiny) == Multimodal.blockSig(tiny.clone()))
  }

  test("mm_dedup_exact: every reported group is byte-identical, every " +
       "planted clone is reported, keeper is the min doc") {
    val payloads = Multimodal.mmDedupTable(spark, sf).collect()
      .map { case (id, p) => id -> p }.toMap
    val groups = Multimodal.mmDedupExact(spark, sf).collect()
    assert(groups.nonEmpty)
    val reported = scala.collection.mutable.Set.empty[Long]
    groups.foreach { g =>
      val keep = g.getAs[Long]("keep_doc")
      val drops = g.getAs[String]("drop_docs").split(',').map(_.toLong)
      assert(g.getAs[Long]("n_docs") == drops.length + 1)
      assert(drops.forall(_ > keep))
      drops.foreach { d =>
        assert(java.util.Arrays.equals(payloads(keep), payloads(d)),
          s"group of $keep claims $d but bytes differ")
      }
      reported += keep
      reported ++= drops
    }
    // planted exact clones all appear in some group
    payloads.keys.filter(id =>
      id < Multimodal.ExactCloneBase && id % 17 == 0).foreach { id =>
      assert(reported(id) && reported(id + Multimodal.ExactCloneBase),
        s"planted clone pair of $id missing")
    }
    // and nothing byte-unique is reported: reported size == total
    // docs participating in a byte-identical group (brute force)
    val byBytes = payloads.toSeq
      .groupBy { case (_, p) => p.toSeq }
      .values.filter(_.size > 1).flatMap(_.map(_._1)).toSet
    assert(reported.toSet == byBytes)
  }

  test("mm_dedup_near equals the brute-force Hamming pair set and " +
       "finds every planted near clone") {
    val maxHamming = 3
    val sigs = Multimodal.mmDedupTable(spark, sf).collect()
      .map { case (id, p) => id -> Multimodal.blockSig(p) }
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= maxHamming
    } yield (a, b, h.toLong)).toSet
    val got = Multimodal.mmDedupNear(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number]("hamming").longValue)).toSet
    assert(got == brute)
    // planted near clones (3 bytes bumped by 1) are within distance
    sigs.toMap.keys.filter(id =>
      id < Multimodal.ExactCloneBase && id % 13 == 0).foreach { id =>
      assert(got.exists { case (a, b, _) =>
        a == id && b == id + Multimodal.NearCloneBase },
        s"planted near pair of $id missing")
    }
  }
}
