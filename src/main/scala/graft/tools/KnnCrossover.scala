package graft.tools

import graft.GraftSession

/** The knn_join crossover probe (r9 verdict ask): time the shipped
  * PQ-codes form ([[graft.pipeline.Ann.knnJoin]]) against the
  * pre-r9 exact-candidates form ([[graft.pipeline.Ann.knnJoinExactCand]])
  * on the SAME data — the whole justification for the PQ rewrite is
  * that code-width candidate shuffles win as data grows, and that
  * claim needs measurements at more than one scale.
  *
  * Usage: `runMain graft.tools.KnnCrossover <sfDir> [passes]` —
  * one warmup + `passes` timed runs per form (min reported), noop
  * sink (full execution, no collect). Output: one JSON line.
  */
object KnnCrossover {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def f2(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
    def time(fn: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def best(name: String, fn: => org.apache.spark.sql.DataFrame): Double = {
      val warm = time(fn)
      val timed = (1 to passes).map(_ => time(fn))
      println(s"""{"metric":"knn_form","form":"$name","warm":${f2(warm)},"timed":[${timed.map(f2).mkString(",")}]}""")
      timed.min
    }
    val pq = best("pq_codes", graft.pipeline.Ann.knnJoinPq(spark, dir))
    val exact = best("exact_cand",
      graft.pipeline.Ann.knnJoinExactCand(spark, dir))
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    println(s"""{"metric":"knn_crossover","sf":"$dir","pq_sec":${f2(pq)},"exact_sec":${f2(exact)},"pq_over_exact":${f2(pq / exact)},"load_avg":${os.getSystemLoadAverage},"passes":$passes}""")
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
  }
}
