package graft

/** Benchmark main: runs every registered query on
  * `SPARK_GRAFT_SF_DIR`, materialising results through the noop sink
  * (full execution, no driver collect, no count()-style column
  * pruning), and prints ONE JSON line with per-query seconds. Failed
  * queries get `-1` timing plus an entry in `"errors"` — a broken
  * query must never masquerade as a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm up: file listing + footer reads + codegen/JIT paths, so the
    // alphabetically-first query doesn't absorb session startup cost
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())

    var errors = List.empty[(String, String)]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def run(): Unit =
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val ok =
        try { run(); true } // untimed: JIT + codegen cache for this shape
        catch { case e: Throwable =>
          errors ::= name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          false
        }
      // min of two timed runs: robust against transient host contention
      def timed(): Double = {
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }
      name -> (if (ok) math.min(timed(), timed()) else -1.0)
    }

    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.reverse
      .map { case (k, v) => "\"" + k + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
