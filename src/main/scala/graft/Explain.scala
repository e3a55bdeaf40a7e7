package graft

/** Plan-inspection utility: `runMain graft.Explain <sfDir> <query>...`
  * prints the formatted physical plan and two timed noop-sink runs
  * per named [[SparkEntry.queries]] entry (first run includes codegen
  * warmup — read the second number).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(s"==== $n ====")
      df.explain("formatted")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[$n run $i] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
