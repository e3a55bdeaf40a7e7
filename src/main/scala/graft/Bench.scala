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
    // optional name filter for targeted perf iteration (unset = full
    // set, which is what the driver runs)
    val only: Set[String] = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
    def run(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // pass 0, untimed: JIT + codegen cache per query shape
    val ok = queries.map { case (name, fn) =>
      name -> (try { run(fn); true }
        catch { case e: Throwable =>
          errors ::= name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          false
        })
    }.toMap
    // Two timed passes over the WHOLE set, min per query. Interleaving
    // beats back-to-back min-of-two: a transient host-load spike
    // inflates one pass, not both timings of whichever query it
    // happened to land on (round-2 bench pinned a spike on the two
    // queries that ran first; both bench sub-1 s in isolation).
    // timed passes catch per-query too: a transient failure (flaky
    // streaming restart, disk hiccup) must cost that query its timing,
    // not abort the whole bench and discard every other result
    def timedPass(): Map[String, Double] = queries.map { case (name, fn) =>
      name -> (if (!ok(name)) -1.0
      else try {
        val t0 = System.nanoTime()
        run(fn)
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          if (!errors.exists(_._1 == name))
            errors ::= name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          -1.0
      })
    }.toMap
    val p1 = timedPass()
    val p2 = timedPass()
    val results = queries.map { case (name, _) =>
      // min of the passes that succeeded; -1 only if both failed
      name -> ((p1(name), p2(name)) match {
        case (a, b) if a >= 0 && b >= 0 => math.min(a, b)
        case (a, b) => math.max(a, b)
      })
    }
    // contract: errors lists exactly the queries with -1 timing — a
    // query that recovered in the other pass reports its timing and
    // is NOT an error
    val failed = results.collect { case (n, v) if v < 0 => n }.toSet
    errors = errors.filter { case (n, _) => failed(n) }

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
    // run conditions, so cross-round drift is attributable: an 18%
    // uniform shift with equal load/cpus is code, with higher load is
    // environment (r5's drift was indistinguishable without this)
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val env = s""""env":{"load_avg":${os.getSystemLoadAverage},""" +
      s""""cpus_avail":${os.getAvailableProcessors},""" +
      s""""spark_cpus":$cpus,"passes":2,"warmup_passes":1,""" +
      s""""jvm":"${esc(System.getProperty("java.version"))}"}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir",$env}""")
    spark.stop()
  }
}
