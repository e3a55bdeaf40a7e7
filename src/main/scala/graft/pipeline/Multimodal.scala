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

  /** STUB decoder — stands in for image/audio decode + feature
    * extraction. Deterministic on the payload bytes so the pipeline is
    * testable end-to-end; a real implementation would decode `batch`
    * with a codec initialised once per batch.
    */
  def decodeStub(batch: Seq[MmRecord]): Seq[MmFeatures] =
    batch.map { r =>
      var sum = 0L
      var i = 0
      while (i < r.payload.length) { sum += r.payload(i) & 0xff; i += 1 }
      MmFeatures(r.doc_id, r.meta.format, r.meta.width, r.meta.height,
        r.payload.length.toLong,
        if (r.payload.nonEmpty) r.payload(0) & 0xff else -1,
        sum)
    }

  /** The batched decode pass: `mapPartitions` + `grouped(batchSize)`
    * keeps rows streaming (no whole-partition materialisation) while
    * giving the decoder real batches.
    */
  def decode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mmTable(spark, dir)
      .mapPartitions(_.grouped(batchSize).flatMap(g => decodeStub(g)))
      .toDF()
      .orderBy("doc_id")
  }
}
