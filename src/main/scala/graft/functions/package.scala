package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.call_function

/** Column-API entry points for graft's native Catalyst expressions.
  *
  * Resolution goes through the session FunctionRegistry (populated by
  * [[graft.GraftExtensions]], installed by [[graft.GraftSession]]) via
  * the public `call_function` API — the catalyst-internal
  * Expression→Column constructors are `private[sql]`.
  */
package object functions {

  /** [[graft.functions.RollingHash]] as a Column function. */
  def rolling_hash(c: Column): Column = call_function("rolling_hash", c)

  /** [[graft.functions.CosineSimilarity]] as a Column function. */
  def cosine_sim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** [[graft.functions.SortedIntersectCount]] as a Column function. */
  def sorted_intersect_count(a: Column, b: Column): Column =
    call_function("sorted_intersect_count", a, b)

  /** [[graft.functions.SortedIntersectAtLeast]] as a Column function. */
  def sorted_intersect_atleast(a: Column, b: Column, needed: Column): Column =
    call_function("sorted_intersect_atleast", a, b, needed)

  /** [[graft.functions.HyperplaneBuckets]] as a Column function. */
  def hyperplane_buckets(v: Column, tables: Int, bits: Int): Column =
    call_function("hyperplane_buckets", v,
      org.apache.spark.sql.functions.lit(tables),
      org.apache.spark.sql.functions.lit(bits))

  /** [[graft.functions.CdcChunks]] as a Column function. */
  def cdc_chunks(c: Column, divisor: Int = 64, minSize: Int = 24,
                 maxSize: Int = 256): Column =
    call_function("cdc_chunks", c,
      org.apache.spark.sql.functions.lit(divisor),
      org.apache.spark.sql.functions.lit(minSize),
      org.apache.spark.sql.functions.lit(maxSize))

  /** [[graft.functions.SimHashAgg]] as an aggregate Column function. */
  def simhash_agg(tokenHash: Column): Column =
    call_function("simhash_agg", tokenHash)

  /** [[graft.functions.WinnowFps]] as a Column function. */
  def winnow_fps(txt: Column, k: Int, w: Int): Column =
    call_function("winnow_fps", txt,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(w))

  /** [[graft.functions.MisraGriesAgg]] as an aggregate Column function. */
  def misra_gries(item: Column, capacity: Int): Column =
    call_function("misra_gries", item,
      org.apache.spark.sql.functions.lit(capacity))

  /** [[graft.functions.BpeEncodeExpr]] as a Column function: the
    * merge list travels as a serialized literal (hex tokens, so the
    * wire format is unambiguous).
    */
  def bpe_encode(text: Column, merges: Seq[(String, String)]): Column =
    call_function("bpe_encode", text,
      org.apache.spark.sql.functions.lit(BpeEncodeExpr.serializeMerges(merges)))

  /** [[graft.functions.BloomAgg]] as an aggregate Column function. */
  def bloom_agg(key: Column, numBits: Int, numHashes: Int): Column =
    call_function("bloom_agg", key,
      org.apache.spark.sql.functions.lit(numBits),
      org.apache.spark.sql.functions.lit(numHashes))

  /** [[graft.functions.MinHashSignature]] as a Column function. */
  def minhash_signature(sh: Column, numPerm: Int): Column =
    call_function("minhash_signature", sh,
      org.apache.spark.sql.functions.lit(numPerm))
}
