package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Bench-scale data provisioning: replicate the sf0.1 testdata N× into
  * a scratch directory so the bench can be run at ~sf1 (TESTDATA.md
  * ships sf ≤ 0.1). NOT a data generator for correctness runs — the
  * gate always runs on the driver's own testdata; this exists solely
  * to measure how query time scales with input size.
  *
  * Each copy shifts every key (primary and foreign together) by
  * `copy × stride`, so join fan-outs and group cardinalities scale
  * linearly like a real bigger deployment. Content columns that feed
  * SIMILARITY operators are perturbed per copy — documents through a
  * per-copy alphabet rotation (destroys cross-copy shingle overlap
  * while preserving length, token structure and within-copy duplicate
  * clusters), embeddings through a per-copy circular dimension shift
  * (cross-copy cosine ≈ noise) — because a verbatim 10× copy would
  * give every document 9 exact clones and inflate the PAIR OUTPUT
  * ~100×: a data-semantics artifact, not an engine cost, and it would
  * make per-query scaling unreadable.
  *
  * Usage: `runMain graft.tools.ScaleUp <srcSfDir> <outDir> <copies>`
  */
object ScaleUp {

  private val alpha = "abcdefghijklmnopqrstuvwxyz"

  private def rot(s: String, i: Int): String =
    s.drop(i) + s.take(i)

  /** One table copy with keys shifted and content perturbed. */
  private def shifted(df: DataFrame, name: String, copy: Int): DataFrame = {
    val c = copy.toLong
    def shift(col0: String, stride: Long): DataFrame => DataFrame =
      _.withColumn(col0, col(col0) + lit(c * stride))
    val keyShifts: Seq[DataFrame => DataFrame] = name match {
      case "customer" => Seq(shift("c_custkey", 1000000L))
      case "orders" => Seq(shift("o_orderkey", 10000000L),
        shift("o_custkey", 1000000L))
      case "lineitem" => Seq(shift("l_orderkey", 10000000L),
        shift("l_partkey", 1000000L), shift("l_suppkey", 100000L))
      case "part" => Seq(shift("p_partkey", 1000000L))
      case "supplier" => Seq(shift("s_suppkey", 100000L))
      case "events" => Seq(shift("event_id", 100000000L),
        shift("user_id", 1000000L))
      case "documents" => Seq(
        shift("doc_id", 10000000L),
        // copy 0 is the original; every later copy applies a rotation
        // by k1 = (copy-1) % 25 + 1 ∈ [1,25], COMPOSED (for copies
        // beyond 25) with a reversed-alphabet rotation indexed by
        // k2 = (copy-1)/25 % 26. Rotations alone cycle with period
        // 25, so copy i and i+25 would be verbatim cross-copy clones;
        // the composite maps are distinct dihedral-group permutations
        // (rotation vs reflection·rotation), so no two copies below
        // 25·26 = 650 share a text transform, and none is the
        // identity. Beyond 650 copies the family cycles — regenerate
        // with a wider alphabet before benching at that scale.
        _.withColumn("text", {
          val k1 = if (copy == 0) 0 else (copy - 1) % 25 + 1
          val k2 = if (copy == 0) 0 else ((copy - 1) / 25) % 26
          val once = translate(col("text"), alpha + alpha.toUpperCase,
            rot(alpha, k1) + rot(alpha, k1).toUpperCase)
          if (k2 == 0) once
          else translate(once, alpha + alpha.toUpperCase,
            rot(alpha.reverse, k2) + rot(alpha.reverse, k2).toUpperCase)
        }))
      case "embeddings" => Seq(
        shift("vec_id", 10000000L),
        // circular shift clamped to the runtime dimension: for
        // copy >= 1 the shift is (copy-1) % (dim-1) + 1 ∈ [1, dim-1] —
        // never 0 (identity) and never > dim (negative slice length).
        // The family cycles with period dim-1 (63 at dim 64): copies
        // i and i+63 get identical embedding transforms — fine at
        // bench scales (≤ 10 copies), regenerate differently beyond
        _.withColumn("embedding",
          if (copy == 0) col("embedding")
          else expr(
            s"concat(slice(embedding, ((${copy - 1}) % (size(embedding) - 1)) + 2, " +
              s"size(embedding) - (((${copy - 1}) % (size(embedding) - 1)) + 1)), " +
              s"slice(embedding, 1, ((${copy - 1}) % (size(embedding) - 1)) + 1))")))
      case _ => Seq() // dims (region/nation): identical copies are wrong
      // — they are key-unique; handled below by emitting copy 0 only
    }
    keyShifts.foldLeft(df)((d, f) => f(d))
  }

  /** Tables whose rows are key-unique dims: replicate would duplicate
    * keys, so only copy 0 is emitted (their size is irrelevant to
    * bench scaling anyway).
    */
  private val dimOnly = Set("region", "nation")

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, copiesStr) = args
    val copies = copiesStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark: SparkSession =
      GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.names.foreach { name =>
      val src = spark.read.parquet(s"$srcDir/$name.parquet")
      val n = if (dimOnly(name)) 1 else copies
      val out = (0 until n).map(shifted(src, name, _)).reduce(_ union _)
      out.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scaleup] $name x$n")
    }
    spark.stop()
  }
}
