package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared frame-materialization helper for iterative/multi-branch
  * plans: eager localCheckpoint behind a fresh-leaf frame (row RDD +
  * schema), so
  *  - a frame consumed by several branches or loop iterations is
  *    computed ONCE per invocation (never re-derived per consumer —
  *    at 100 TB each re-derivation is a full corpus pass), and
  *  - carried size estimates reset to leaf defaults (a bare
  *    localCheckpoint preserves origin stats, which SQUARE per round
  *    in self-join loops — see [[Components]]'s cut note).
  * Blocks are MEMORY_AND_DISK and freed by the ContextCleaner once
  * the invocation's result is unreachable; nothing persists across
  * invocations, so every bench/oracle sample still computes from the
  * parquet inputs.
  */
object Frames {
  def materialize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.createDataFrame(df.rdd, df.schema).localCheckpoint(true)
  }
}
