package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted-band-index contract of [[Dedup.incrementalDedupIndexedOf]]:
  * the nightly probe must read ONLY the index artifact and the day batch —
  * corpus text is shingled and signed exactly once, at index write time.
  */
class IncrementalIndexSpec extends SparkSpec {

  private def normedDocs: DataFrame =
    graft.Tables.documents(spark, sf01)
      .select(col("doc_id"), col("lang"), col("source"),
        TextAnalysis.normText(col("text")).as("txt"))

  test("persisted band index reproduces the inline answer without re-reading corpus text") {
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_bandindex_test").toString
    val batchDir = java.nio.file.Files
      .createTempDirectory("graft_bandindex_batch").toString
    val isNew = col("doc_id") % 7 === 0
    Dedup.bandIndexWriteOf(normedDocs.filter(!isNew), idxDir)
    normedDocs.filter(isNew).write.mode("overwrite").parquet(batchDir)

    val indexed = Dedup.incrementalDedupIndexedOf(
      spark, spark.read.parquet(batchDir), idxDir)

    // every file the probe plan touches lives under the index artifact
    // or the batch — the corpus parquet never appears
    val files = indexed.inputFiles
    assert(files.nonEmpty)
    val foreign = files.filterNot(f =>
      f.contains(idxDir) || f.contains(batchDir))
    assert(foreign.isEmpty, s"probe read outside index+batch: ${foreign.mkString(", ")}")

    val inline = Dedup.incrementalDedup(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaIndex = indexed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaIndex.nonEmpty, "cross-split dup families must survive the split")
    assert(viaIndex == inline,
      s"missed=${(inline -- viaIndex).size} extra=${(viaIndex -- inline).size}")
  }

  test("streaming probe equals the batch indexed answer") {
    val stream = graft.streaming.StreamOps
      .dedupIncrementalStream(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Dedup.incrementalDedup(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stream.nonEmpty)
    assert(stream == batch,
      s"missed=${(batch -- stream).size} extra=${(stream -- batch).size}")
  }
}
