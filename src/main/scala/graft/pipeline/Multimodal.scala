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
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some((u32(16).toInt, u32(20).toInt))
    else None
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

  /** The batched decode pass over any MmRecord Dataset. */
  def decodeRecords(records: Dataset[MmRecord]): DataFrame = {
    import records.sparkSession.implicits._
    records
      .mapPartitions(_.grouped(batchSize).flatMap(g => decodeStub(g)))
      .toDF()
      .orderBy("doc_id")
  }
}
