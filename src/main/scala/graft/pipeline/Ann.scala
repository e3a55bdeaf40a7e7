package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.cosine_sim

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

  /** Deterministic ±1 hyperplane component for (table, bit, dim) —
    * a splitmix64-style avalanche, reproducible everywhere.
    */
  def hyperplaneSign(table: Int, bit: Int, dim: Int): Double = {
    var z = (table.toLong * 1000003L + bit.toLong * 8191L + dim.toLong + 0x9e3779b97f4a7c15L)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^= (z >>> 31)
    if ((z & 1L) == 0L) 1.0 else -1.0
  }

  /** Bucket id per (vector, table): `bits` sign bits of hyperplane
    * dot products packed into an int.
    */
  private def bucketCol(tables: Int, bits: Int, dim: Int): Seq[Column] =
    (0 until tables).map { t =>
      val bucket = (0 until bits).map { j =>
        val hp = array((0 until dim).map(d => lit(hyperplaneSign(t, j, d))): _*)
        when(cosine_sim(col("v"), hp) > 0, lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _)
      struct(lit(t).as("t"), bucket.as("bucket")).as(s"tb$t")
    }

  /** LSH-bucketed approximate top-k: 16 tables × 6 random-hyperplane
    * bits (for a ~0.4-cos neighbour, P(bit agree) ≈ 0.63, so per-table
    * hit ≈ 0.63⁶ ≈ 0.06 and 16 tables give ≈ 0.65 recall; `bits`
    * scales with log N in production to keep buckets O(1)). Candidates
    * = vectors sharing any (table, bucket) with the query; exact
    * cosine + rank only within candidates. At 100 TB the explode side
    * shuffles on (table, bucket) — linear, and bucket occupancy (not
    * N²) bounds the join.
    */
  def lshTopK(spark: SparkSession, dir: String,
              nQueries: Int = 5, k: Int = 10,
              tables: Int = 16, bits: Int = 6, dim: Int = 64): DataFrame = {
    val all = vectors(spark, dir)
    val buckets = all
      .select(col("vec_id"), col("v"),
        explode(array(bucketCol(tables, bits, dim): _*)).as("tb"))
      .select(col("vec_id"), col("v"),
        col("tb.t").as("t"), col("tb.bucket").as("bucket"))
    val qb = buckets.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("t"), col("bucket"))
    val candidates = buckets.join(broadcast(qb), Seq("t", "bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("qv"), col("vec_id").as("n_id"), col("v"))
      .dropDuplicates("q_id", "n_id")
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    candidates
      .select(col("q_id"), col("n_id"), cosine_sim(col("qv"), col("v")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id")
      .orderBy("q_id", "rank")
  }
}
