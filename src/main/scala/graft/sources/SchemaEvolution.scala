package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Schema-evolution reads: a 100 TB corpus is written over months by
  * evolving writers, so the reader MUST reconcile files whose schemas
  * differ by added columns (the only evolution treated as safe here:
  * renames/retypes need a rewrite, adds don't). Spark's per-file
  * schema reconciliation (`mergeSchema`) fills absent columns with
  * NULL — this module pins that contract with a gate query and a
  * plan-shape spec, because silent schema drift is how corpora rot:
  *
  *  - merged read = union of column sets, NULL where a file predates
  *    a column (never a positional mis-bind);
  *  - predicates and pruning on COMMON columns still reach every
  *    file's scan (evolution must not cost pushdown);
  *  - new-column predicates skip old files entirely (NULL never
  *    matches, and row groups without the column are pruned).
  *
  * Cost note: `mergeSchema` reads every file footer at planning time
  * — fine per partition, wrong as a whole-table default at 100 TB.
  * Production keeps the authoritative merged schema in a catalog (or
  * the manifest discipline of [[StatsPruning]]) and passes it
  * explicitly; the reconciliation SEMANTICS pinned here are the same.
  */
object SchemaEvolution {

  /** Two writer generations under one table root: v1 files carry
    * (doc_id, lang, source); v2 files add `n_tokens`. Deterministic
    * split (even ids = v1, odd = v2) so the oracle can rebuild the
    * merged result from the raw table.
    */
  def writeGenerations(spark: SparkSession, dir: String,
                       outDir: String): Unit = {
    val docs = Tables.documents(spark, dir)
    docs.filter(col("doc_id") % 2 === 0)
      .select("doc_id", "lang", "source")
      .write.mode("overwrite").parquet(s"$outDir/gen=1")
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("lang"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .write.mode("overwrite").parquet(s"$outDir/gen=2")
  }

  /** The reconciled reader: merged schema, NULL-filled absences. */
  def evolvedRead(spark: SparkSession, outDir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(outDir)

  /** The gate query: write both generations, read merged, emit every
    * row with an explicit presence flag — NULL-fill semantics are the
    * thing under test, so they are in the output, not just implied.
    */
  def evolutionReport(spark: SparkSession, dir: String): DataFrame = {
    val tmp = TmpDir.scoped("schemaevo",
      spark.sparkContext.applicationId, dir)
    writeGenerations(spark, dir, tmp)
    evolvedRead(spark, tmp)
      .select(col("doc_id"), col("lang"),
        when(col("n_tokens").isNotNull, 1L).otherwise(0L).as("has_tokens"),
        coalesce(col("n_tokens"), lit(-1L)).as("n_tokens"))
      .orderBy("doc_id")
  }
}
