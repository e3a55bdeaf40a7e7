package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftSession
import graft.pipeline.Ann

/** Recall-at-scale probe for the two-level (hierarchical) IVF router
  * (r11 verdict Missing #4): the r11 router was WALL-measured at sf10
  * but its recall axis ran only at gate scale, and a hierarchical
  * quantiser can lose recall through coarse-routing errors (the right
  * cell hides under a super the query doesn't probe). This tool
  * measures recall@k against exact brute force at any scale:
  *
  *  - `ivf_recall`   — [[Ann.ivfTopK]] at the kNN family's
  *    constant-occupancy cell count (max(16, N/256) — two-level above
  *    64 cells), nprobe 4, over `nQueries` sampled queries;
  *  - `knn_recall`   — the registered [[Ann.knnJoin]] output (its
  *    footer-selected arm, k=5, nprobe=2) for the same queries.
  *
  * Exact reference: [[Ann.bruteTopK]] over the same query slice —
  * nQueries × N cosines, cheap for a probe (200 × 2·10⁵ = 4·10⁷ at
  * sf10). Queries are `vec_id < nQueries`, the same deterministic
  * slice every ANN gate uses.
  *
  * Usage: `runMain graft.tools.RouterRecall <sfDir> [nQueries] [k]`
  * → one JSON line.
  */
object RouterRecall {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nQueries = if (args.length > 1) args(1).toInt else 200
    val k = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession =
      GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = graft.sources.StorageStats.parquetRowCount(
      spark, s"$dir/embeddings.parquet")
    val cells = math.max(16, (n / 256L).toInt)

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    def f3(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))

    val bruteK = pairs(Ann.bruteTopK(spark, dir, nQueries, k))
    val ivf = pairs(Ann.ivfTopK(spark, dir, nQueries, k, cells, nprobe = 4))
    val ivfRecall = ivf.count(bruteK).toDouble / bruteK.size

    val brute5 = pairs(Ann.bruteTopK(spark, dir, nQueries, 5))
    val knn = pairs(Ann.knnJoin(spark, dir)
      .filter(org.apache.spark.sql.functions.col("q_id") < nQueries))
    val knnRecall = knn.count(brute5).toDouble / brute5.size

    println(s"""{"metric":"router_recall","dir":"$dir","n_vectors":$n,"cells":$cells,"two_level":${cells > Ann.FlatCellsMax},"n_queries":$nQueries,"k":$k,"ivf_recall":${f3(ivfRecall)},"knn_k5_recall":${f3(knnRecall)}}""")
    spark.stop()
  }
}
