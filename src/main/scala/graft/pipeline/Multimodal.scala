package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2E `mm_decode`): treat media as
  * an opaque `binary` payload column plus a typed metadata struct, and
  * run decode/feature-extraction as a BATCHED per-partition pass.
  *
  * Three REAL dependency-free codec paths — header parsers for the
  * three public container formats the fixture synthesizes:
  *
  *  - PNG (ISO/IEC 15948): signature + IHDR big-endian dims;
  *  - JPEG (ITU-T T.81): marker-segment scan to the SOF0/1/2 frame
  *    header, big-endian dims;
  *  - WAV (RIFF, Microsoft/IBM): chunk scan to `fmt `/`data`,
  *    little-endian sample rate / block align / data size → frame
  *    (sample) count.
  *
  * PIXEL decode / resampling stays out of scope (no image/audio
  * codecs in this image) — dimension/frame planning, batching and
  * schema are the Spark-side plumbing that transfers to a real codec.
  * The gate fixture writes headers whose dimensions DIFFER from the
  * metadata struct (width+13, height+7), so the hash gate fails if
  * the parsers stop being load-bearing and decode falls back to
  * metadata.
  */
object Multimodal {

  case class MmMeta(format: String, width: Int, height: Int)
  case class MmRecord(doc_id: Long, payload: Array[Byte], meta: MmMeta)
  case class MmFeatures(doc_id: Long, format: String, width: Int,
                        height: Int, n_bytes: Long, first_byte: Int,
                        byte_sum: Long, parsed: Boolean, frames: Long)

  /** Header dims are deliberately OFFSET from the metadata struct so
    * a silent parser→metadata fallback cannot hash-match the oracle.
    */
  val WOff = 13
  val HOff = 7

  /** Synthesise the multimodal table from `documents`: a REAL
    * container header (PNG / JPEG SOF0 / WAV RIFF, by `doc_id % 3`)
    * followed by the UTF-8 text as the body bytes. In production this
    * is a parquet table with a real binary column — same schema, same
    * decode path.
    */
  def mmTable(spark: SparkSession, dir: String): Dataset[MmRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val body = text.getBytes("UTF-8")
        val w = (nChars % 640 + 1).toInt
        val h = (nChars * 7 % 480 + 1).toInt
        val (fmt, header) = (id % 3) match {
          case 0 => ("png", pngHeader(w + WOff, h + HOff))
          case 1 => ("jpeg", jpegHeader(w + WOff, h + HOff))
          case _ => ("wav", wavHeader(body.length))
        }
        MmRecord(id, header ++ body, MmMeta(fmt, w, h))
      }
  }

  val batchSize = 64

  // ---- header synthesis (the fixture writer) ----

  private[pipeline] def pngHeader(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(33) // big-endian by default
    bb.put(pngSignature)
    bb.putInt(13); bb.put("IHDR".getBytes("US-ASCII"))
    bb.putInt(w); bb.putInt(h)
    bb.put(Array[Byte](8, 2, 0, 0, 0)) // depth/color/compress/filter/interlace
    // CRC left zero: the parser (like dimension sniffers generally)
    // reads the IHDR fields, not the chunk checksum
    bb.array()
  }

  private[pipeline] def jpegHeader(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(21)
    bb.put(Array(0xff, 0xd8).map(_.toByte)) // SOI
    bb.put(Array(0xff, 0xc0).map(_.toByte)) // SOF0 (baseline DCT)
    bb.putShort(17) // segment length: 2 + 1 + 2 + 2 + 1 + 3·3
    bb.put(8.toByte) // precision
    bb.putShort(h.toShort); bb.putShort(w.toShort) // lines, samples/line
    bb.put(3.toByte) // components
    bb.put(Array[Byte](1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 2))
    bb.array()
  }

  private[pipeline] def wavHeader(dataLen: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(1) // channels
    bb.putInt(8000) // sample rate
    bb.putInt(8000) // byte rate = rate · channels · bits/8
    bb.putShort(1) // block align
    bb.putShort(8) // bits per sample
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    bb.array()
  }

  // ---- header parsers (the real codec paths) ----

  private val pngSignature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG header parse (ISO/IEC 15948 — 8-byte signature then the IHDR
    * chunk, whose width/height are big-endian u32 at byte offsets
    * 16/20). Returns None for anything that isn't a well-formed PNG
    * prefix.
    */
  def pngDims(b: Array[Byte]): Option[(Int, Int)] = {
    def u32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    if (b.length >= 24 &&
        java.util.Arrays.equals(b, 0, 8, pngSignature, 0, 8) &&
        u32(8) == 13L && // IHDR chunk length is always 13 (§11.2.2)
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val (w, h) = (u32(16), u32(20))
      // spec: dimensions are 1 .. 2^31-1; anything else is malformed →
      // metadata fallback, never a negative/zero dimension downstream
      if (w >= 1 && w <= Int.MaxValue && h >= 1 && h <= Int.MaxValue)
        Some((w.toInt, h.toInt))
      else None
    } else None
  }

  /** JPEG frame-dimension parse (ITU-T T.81): walk the marker-segment
    * stream from SOI to the first start-of-frame header (SOF0/1/2 —
    * baseline, extended sequential, progressive), whose big-endian
    * u16 lines/samples-per-line sit at segment offsets 3/5. Skips
    * other segments by their declared length, as any real sniffer
    * must (EXIF, quant tables, Huffman tables precede the frame
    * header in wild files). None for malformed streams.
    */
  def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    def u16(o: Int): Int = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var i = 2
    while (i + 3 < b.length && (b(i) & 0xff) == 0xff) {
      val marker = b(i + 1) & 0xff
      if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
        if (i + 8 >= b.length) return None
        val h = u16(i + 5)
        val w = u16(i + 7)
        return if (w >= 1 && h >= 1) Some((w, h)) else None
      }
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
      else i += 2 + u16(i + 2) // skip segment by declared length
    }
    None
  }

  case class WavInfo(sampleRate: Int, channels: Int, blockAlign: Int,
                     dataBytes: Long) {
    /** Frame (sample-block) count — the container-true figure frame
      * sampling schedules on.
      */
    def frames: Long = dataBytes / math.max(blockAlign, 1)
  }

  /** WAV/RIFF header parse: verify RIFF/WAVE, then scan (id, size)
    * chunks for `fmt ` (sample rate / channels / block align,
    * little-endian) and `data` (payload size). None unless both
    * chunks are present and well-formed.
    */
  def wavInfo(b: Array[Byte]): Option[WavInfo] = {
    def tag(o: Int): String =
      if (o + 4 <= b.length) new String(b, o, 4, "US-ASCII") else ""
    def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    if (b.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None
    var data: Option[Long] = None
    while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(i)
      val size = u32(i + 4)
      if (id == "fmt " && size >= 16 && i + 8 + 16 <= b.length)
        fmt = Some((u32(i + 12).toInt, u16(i + 10), u16(i + 20)))
      if (id == "data") data = Some(size)
      // chunks are word-aligned: odd sizes carry a pad byte. A chunk
      // size that doesn't fit the remaining buffer (or whose Int
      // truncation would step zero/backwards — e.g. 0xFFFFFFF8) marks
      // the stream malformed: stop scanning rather than loop forever
      // on adversarial input.
      if (size < 0 || size > b.length - i - 8) i = b.length
      else i += 8 + size.toInt + (size.toInt & 1)
    }
    for ((rate, ch, align) <- fmt; d <- data)
      yield WavInfo(rate, ch, align, d)
  }

  /** Batch decoder: REAL header parse per the declared format
    * (dims for png/jpeg, frame count for wav), metadata fallback with
    * `parsed = false` for malformed payloads. Features are computed
    * batch-at-a-time — the shape a vectorised decoder needs (codec
    * setup amortised per batch, not per row).
    */
  def decodeStub(batch: Seq[MmRecord]): Seq[MmFeatures] =
    batch.map { r =>
      var sum = 0L
      var i = 0
      while (i < r.payload.length) { sum += r.payload(i) & 0xff; i += 1 }
      val (w, h, parsed, frames) = r.meta.format match {
        case "png" => pngDims(r.payload) match {
          case Some((pw, ph)) => (pw, ph, true, 1L)
          case None => (r.meta.width, r.meta.height, false, 1L)
        }
        case "jpeg" => jpegDims(r.payload) match {
          case Some((pw, ph)) => (pw, ph, true, 1L)
          case None => (r.meta.width, r.meta.height, false, 1L)
        }
        case _ => wavInfo(r.payload) match {
          case Some(wi) => (r.meta.width, r.meta.height, true, wi.frames)
          case None => (r.meta.width, r.meta.height, false, 0L)
        }
      }
      MmFeatures(r.doc_id, r.meta.format, w, h,
        r.payload.length.toLong,
        if (r.payload.nonEmpty) r.payload(0) & 0xff else -1,
        sum, parsed, frames)
    }

  /** The batched decode pass: `mapPartitions` + `grouped(batchSize)`
    * keeps rows streaming (no whole-partition materialisation) while
    * giving the decoder real batches.
    */
  def decode(spark: SparkSession, dir: String): DataFrame =
    decodeRecords(mmTable(spark, dir))

  /** Aspect-preserving resize planning over the PARSED header
    * dimensions (not the metadata struct): compute the output
    * dimensions for fitting each image inside `maxW`×`maxH` (scale
    * down only, never up) with exact integer math — `out_w = w·s,
    * out_h = h·s` for the binding axis. The pixel resampling itself
    * belongs to the codec (out of scope in this image); the dimension
    * plan is what the pipeline schedules batches and shards by, and
    * is oracle-exact. One batched decode pass, then a codegen'd map.
    */
  def resizePlan(spark: SparkSession, dir: String,
                 maxW: Int = 224, maxH: Int = 224): DataFrame =
    decodeRecords(mmTable(spark, dir), ordered = false)
      .select("doc_id", "format", "width", "height")
      .filter(col("format").isin("png", "jpeg"))
      // binding axis: scale = min(maxW/w, maxH/h, 1) as exact rationals
      .withColumn("fit_w",
        expr(s"width * $maxH >= height * $maxW")) // width is the binding axis
      .withColumn("out_w", expr(
        s"CAST(CASE WHEN width <= $maxW AND height <= $maxH THEN width " +
          s"WHEN fit_w THEN $maxW " +
          s"ELSE (width * $maxH) div height END AS INT)"))
      .withColumn("out_h", expr(
        s"CAST(CASE WHEN width <= $maxW AND height <= $maxH THEN height " +
          s"WHEN fit_w THEN (height * $maxW) div width " +
          s"ELSE $maxH END AS INT)"))
      .select("doc_id", "format", "width", "height", "out_w", "out_h")
      .orderBy("doc_id")

  /** Frame sampling: pick `n` evenly-spaced frame indices per media
    * payload — the standard video/audio subsampling pass before
    * feature extraction. The frame total now comes from the REAL
    * container header (the WAV `data` chunk size over the block
    * align, via the decode pass), scheduled in 1024-sample windows;
    * offsets are `i·frames div n`, exact integer math mirrored by the
    * oracle. Explode keeps it one row per (doc, frame) — the unit a
    * distributed feature extractor maps over.
    */
  def frameSample(spark: SparkSession, dir: String, n: Int = 4): DataFrame =
    decodeRecords(mmTable(spark, dir), ordered = false)
      .filter(col("format") === "wav" && col("parsed"))
      // container-true sample count → 1024-sample scheduling windows
      .withColumn("frames", expr("frames div 1024 + 1"))
      .select(col("doc_id"), col("frames"),
        explode(expr(s"transform(sequence(0, ${n - 1}), " +
          s"i -> (i * frames) div $n)")).as("frame_idx"))
      .distinct()
      .orderBy("doc_id", "frame_idx")

  /** The batched decode pass over any MmRecord Dataset. */
  def decodeRecords(records: Dataset[MmRecord],
                    ordered: Boolean = true): DataFrame = {
    import records.sparkSession.implicits._
    val out = records
      .mapPartitions(_.grouped(batchSize).flatMap(g => decodeStub(g)))
      .toDF()
    if (ordered) out.orderBy("doc_id") else out
  }

  // ---- payload-level dedup (SURVEY §2E mm_dedup_exact / mm_dedup_near) ----

  /** Fixed gate location for the payload table (per-user scratch,
    * same discipline as StorageStats.GatePath / Bpe.StorePath: the
    * DuckDB oracle runs after the session exits and reads the SAME
    * parquet bytes, so exact dedup is gated on the artifact, not on a
    * re-synthesis).
    */
  val MmGatePath: String = new java.io.File(
    sys.props.getOrElse("java.io.tmpdir", "/tmp"),
    "graft_mm_payload_gate_" +
      sys.props.getOrElse("user.name", "anon").replaceAll("[^A-Za-z0-9_.-]", "_")
  ).getPath

  /** Id offsets of the planted replicas (fixture authoring: the raw
    * corpus has no byte-identical payloads, so the dedup surface
    * plants deterministic clones the way every dedup fixture in this
    * repo does — the ORACLE never sees the synthesis, only the
    * persisted payload bytes).
    */
  val ExactCloneBase = 1000000000L
  val NearCloneBase = 2000000000L

  /** The payload corpus for dedup: every mmTable record, plus an
    * exact byte clone for `doc_id % 17 == 0` (id + [[ExactCloneBase]])
    * and a near clone for `doc_id % 13 == 0` (id + [[NearCloneBase]],
    * three body bytes bumped — byte-similar, not byte-identical).
    */
  def mmDedupTable(spark: SparkSession, dir: String): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    mmTable(spark, dir).flatMap { r =>
      val base = Seq((r.doc_id, r.payload))
      val exact = if (r.doc_id % 17 == 0)
        Seq((r.doc_id + ExactCloneBase, r.payload)) else Seq.empty
      val near = if (r.doc_id % 13 == 0) {
        val p = r.payload.clone()
        var i = p.length / 2
        val until = math.min(p.length, i + 3)
        while (i < until) { p(i) = (p(i) + 1).toByte; i += 1 }
        Seq((r.doc_id + NearCloneBase, p))
      } else Seq.empty
      base ++ exact ++ near
    }
  }

  /** `mm_dedup_exact`: byte-exact payload dedup — md5 over the
    * payload bytes (as their canonical hex form, the digest both
    * engines expose), duplicate groups keyed by hash with the lowest
    * doc as keeper. The hash groupBy is one shuffle of
    * (digest, doc_id) pairs — payload BYTES never shuffle, which is
    * the property that matters when payloads are MBs: digests are
    * computed scan-side, the exchange carries 32-byte keys. The
    * payload table is persisted first so the oracle digests the same
    * artifact.
    */
  def mmDedupExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mmDedupTable(spark, dir).toDF("doc_id", "payload")
      .write.mode("overwrite").parquet(MmGatePath)
    val hashed = spark.read.parquet(MmGatePath)
      .select(col("doc_id"), md5(hex(col("payload"))).as("payload_hash"))
    val groups = hashed.groupBy("payload_hash")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc"))
      .filter(col("n_docs") > 1)
    hashed.join(groups, Seq("payload_hash"))
      .filter(col("doc_id") =!= col("keep_doc"))
      .groupBy("payload_hash", "n_docs", "keep_doc")
      .agg(array_join(expr("transform(sort_array(collect_list(doc_id)), " +
        "i -> cast(i as string))"), ",").as("drop_docs"))
      .orderBy("payload_hash")
  }

  /** 64-block byte signature of a payload (blockhash-style, Yang et
    * al.'s block mean hash reduced to bytes so it needs no pixel
    * decode): split the byte stream into 64 contiguous blocks, bit i
    * set iff block i's mean byte value STRICTLY exceeds the whole
    * payload's mean — compared in exact integer cross-multiplication
    * (`sum_i · n > total · len_i`), so the signature is deterministic
    * on any engine. Byte-identical payloads share signatures; small
    * edits disturb only the touched blocks' bits.
    */
  def blockSig(b: Array[Byte], blocks: Int = 64): Long = {
    val n = b.length
    if (n == 0) return 0L
    var total = 0L
    val sums = new Array[Long](blocks)
    val lens = new Array[Int](blocks)
    var i = 0
    while (i < n) {
      val blk = (i.toLong * blocks / n).toInt
      total += b(i) & 0xff
      sums(blk) += b(i) & 0xff
      lens(blk) += 1
      i += 1
    }
    var sig = 0L
    var blk = 0
    while (blk < blocks) {
      if (sums(blk) * n > total * lens(blk)) sig |= 1L << blk
      blk += 1
    }
    sig
  }

  /** `mm_dedup_near`: payload near-dup pairs — [[blockSig]] per
    * payload (one scan-side map, no bytes shuffled), then the SAME
    * multi-index pigeonhole Hamming search as `dedup_simhash`
    * ([[Dedup.hammingPairs]]): C(blocks, maxHamming) bucket keys per
    * doc, bucket self-join, exact bit_count verify. Output is exactly
    * the Hamming ≤ `maxHamming` pair set. Rows-only at the driver
    * gate (signature layout is engine-specific); MultimodalDedupSpec
    * gates it against a brute-force Hamming scan and the planted
    * near-clone pairs.
    */
  def mmDedupNear(spark: SparkSession, dir: String,
                  maxHamming: Int = 3, blocks: Int = 5): DataFrame =
    Dedup.hammingPairs(mmSigs(spark, dir), maxHamming, blocks)

  private def mmSigs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mmDedupTable(spark, dir)
      .map { case (id, p) => (id, blockSig(p)) }
      .toDF("doc_id", "sig")
  }

  /** [[mmDedupNear]] with the payload signatures PERSISTED at the
    * fixed gate path — the same hamming-from-persisted-sigs discipline
    * as `dedup_simhash`: the blockhash fold stays engine-specific, the
    * pair set is exactly hamming ≤ `maxHamming` over the persisted
    * 64-bit values, which the oracle re-derives with
    * `bit_count(xor(...))` from the same parquet.
    */
  def mmDedupNearGate(spark: SparkSession, dir: String,
                      maxHamming: Int = 3, blocks: Int = 5): DataFrame = {
    val p = Gate.once(spark, "mm_dedup_near", dir)(g =>
      mmSigs(spark, dir).write.mode("overwrite").parquet(s"$g/sigs"))
    Dedup.hammingPairs(spark.read.parquet(s"$p/sigs"), maxHamming, blocks)
  }
}
