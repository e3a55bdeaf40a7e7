package graft.tools

import org.apache.spark.sql.DataFrame

import graft.GraftSession

/** Ad-hoc plan/stage profiler: `runMain graft.tools.Profile <what> <sfDir>`.
  * Prints timing for the named experiment — a scratchpad for perf work,
  * not part of the driver contract.
  */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("ngram")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.functions._

    what match {
      case "ngram" =>
        val g = graft.Tables.documents(spark, dir)
          .select(col("doc_id"), col("lang"), col("source"),
            graft.pipeline.TextAnalysis.normText(col("text")).as("txt"))
          .withColumn("sh", array_sort(graft.pipeline.Dedup.shingles("txt")))
          .select(col("doc_id"), col("lang"), col("source"), col("sh"),
            size(col("sh")).as("nsh"))
        time("g materialize")(noop(g))
        val a = g.as("a")
        val b = g.as("b")
        val joined = a.join(b, col("a.lang") === col("b.lang") &&
          col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id"))
        time("join count only")(println("pairs=" +
          joined.select(col("a.doc_id")).count()))
        time("join + merge intersect")(noop(
          joined.select(sorted_intersect_count(col("a.sh"), col("b.sh"))
            .as("i"))))
        time("full ngramJaccardPairs")(noop(
          graft.pipeline.Dedup.ngramJaccardPairs(spark, dir, 6500)))
      case "explain_ngram" =>
        graft.pipeline.Dedup.ngramJaccardPairs(spark, dir, 6500).explain("formatted")
      case "explain" =>
        val name = args(2)
        graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
      case other =>
        val df = graft.SparkEntry.queries(other)(spark, dir)
        time(other)(noop(df))
        time(other + " (2nd)")(noop(df))
    }
    spark.stop()
  }
}
