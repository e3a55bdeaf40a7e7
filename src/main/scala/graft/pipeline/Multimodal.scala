package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2E `mm_decode`): treat media as
  * an opaque `binary` payload column plus a typed metadata struct, and
  * run decode/feature-extraction as a BATCHED per-partition pass.
  *
  * The decode itself is a STUB (no image/audio codecs in this image):
  * [[decodeStub]] derives deterministic "features" from the raw bytes.
  * Everything around it — the schema, the Dataset encoders, the
  * partition-level batching (the shape a vectorised decoder needs:
  * amortise model/codec setup per batch, not per row) — is real and
  * is what transfers to a 100 TB run with a real codec dropped in.
  */
object Multimodal {

  case class MmMeta(format: String, width: Int, height: Int)
  case class MmRecord(doc_id: Long, payload: Array[Byte], meta: MmMeta)
  case class MmFeatures(doc_id: Long, format: String, width: Int,
                        height: Int, n_bytes: Long, first_byte: Int,
                        byte_sum: Long)

  /** Synthesise the multimodal table from `documents`: UTF-8 bytes as
    * the payload, deterministic metadata. In production this is a
    * parquet table with a real binary column — same schema.
    */
  def mmTable(spark: SparkSession, dir: String): Dataset[MmRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        struct(
          expr("CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' " +
            "ELSE 'wav' END").as("format"),
          (col("n_chars") % 640 + 1).cast("int").as("width"),
          ((col("n_chars") * 7) % 480 + 1).cast("int").as("height")).as("meta"))
      .as[MmRecord]
  }

  val batchSize = 64

  private val pngSignature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** One REAL codec path, dependency-free: PNG header parse (public
    * format, ISO/IEC 15948 — 8-byte signature then the IHDR chunk,
    * whose width/height are big-endian u32 at byte offsets 16/20).
    * Returns None for anything that isn't a well-formed PNG prefix.
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

  /** Batch decoder: a real header parse where the payload is a real
    * PNG (`pngDims`), the deterministic byte-feature STUB otherwise
    * (no other codecs in this image). Either way the features are
    * computed batch-at-a-time — the shape a vectorised decoder needs.
    */
  def decodeStub(batch: Seq[MmRecord]): Seq[MmFeatures] =
    batch.map { r =>
      var sum = 0L
      var i = 0
      while (i < r.payload.length) { sum += r.payload(i) & 0xff; i += 1 }
      val (w, h) =
        (if (r.meta.format == "png") pngDims(r.payload) else None)
          .getOrElse((r.meta.width, r.meta.height))
      MmFeatures(r.doc_id, r.meta.format, w, h,
        r.payload.length.toLong,
        if (r.payload.nonEmpty) r.payload(0) & 0xff else -1,
        sum)
    }

  /** The batched decode pass: `mapPartitions` + `grouped(batchSize)`
    * keeps rows streaming (no whole-partition materialisation) while
    * giving the decoder real batches.
    */
  def decode(spark: SparkSession, dir: String): DataFrame =
    decodeRecords(mmTable(spark, dir))

  /** Aspect-preserving resize planning: compute the output dimensions
    * for fitting each image inside `maxW`×`maxH` (scale down only,
    * never up) with exact integer math — `out_w = w·s, out_h = h·s`
    * for the binding axis. The pixel resampling itself belongs to the
    * codec (stubbed in this image); the dimension plan is what the
    * pipeline schedules batches and shards by, and is oracle-exact.
    * Pure map, codegen'd.
    */
  def resizePlan(spark: SparkSession, dir: String,
                 maxW: Int = 224, maxH: Int = 224): DataFrame = {
    import spark.implicits._
    mmTable(spark, dir).toDF()
      .select(col("doc_id"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"))
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
  }

  /** Frame sampling: pick `n` evenly-spaced frame indices per media
    * payload — the standard video/audio subsampling pass before
    * feature extraction. Frame count is derived from the payload size
    * (1 KiB frames — a documented stand-in for the container's real
    * frame index, which the stubbed codec can't read); offsets are
    * `i·frames div n`, exact integer math mirrored by the oracle.
    * Explode keeps it one row per (doc, frame) — the unit a
    * distributed feature extractor maps over.
    */
  def frameSample(spark: SparkSession, dir: String, n: Int = 4): DataFrame = {
    import spark.implicits._
    mmTable(spark, dir).toDF()
      .select(col("doc_id"), col("meta.format").as("format"),
        length(col("payload")).cast("long").as("n_bytes"))
      .filter(col("format") === "wav")
      .withColumn("frames", expr("n_bytes div 1024 + 1"))
      .select(col("doc_id"), col("frames"),
        explode(expr(s"transform(sequence(0, ${n - 1}), " +
          s"i -> (i * frames) div $n)")).as("frame_idx"))
      .distinct()
      .orderBy("doc_id", "frame_idx")
  }

  /** The batched decode pass over any MmRecord Dataset. */
  def decodeRecords(records: Dataset[MmRecord]): DataFrame = {
    import records.sparkSession.implicits._
    records
      .mapPartitions(_.grouped(batchSize).flatMap(g => decodeStub(g)))
      .toDF()
      .orderBy("doc_id")
  }
}
