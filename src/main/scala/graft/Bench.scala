package graft

/** Benchmark main: runs every registered query on
  * `SPARK_GRAFT_SF_DIR`, materialising results through the noop sink
  * (full execution, no driver collect, no count()-style column
  * pruning).
  *
  * Output protocol (all lines are self-contained JSON):
  *  - one `{"metric":"query_time",...}` line per query per pass, AS IT
  *    COMPLETES — a killed or timed-out run still leaves per-query
  *    data in whatever tail survives (the r6 driver bench hit its
  *    timeout and the old single-println design lost every number);
  *  - one `{"metric":"baseline_ratio",...}` line comparing min-of-
  *    passes per query against BASELINE.md's standing numbers (when
  *    the file is readable), with the >2× regression list — the
  *    standing regression criterion, checked mechanically in-repo;
  *  - LAST, the aggregate `{"metric":"total",...}` line in the same
  *    shape as always (per-query min seconds, errors, env).
  *
  * Failed queries get `-1` timing plus an entry in `"errors"` — a
  * broken query must never masquerade as a fast one.
  */
object Bench {

  /** Timed passes over the full set (min per query). Constants, and
    * the env block derives from them — a filtered or re-configured
    * run must never be indistinguishable from the standard protocol.
    */
  val TimedPasses = 2
  val WarmupPasses = 1

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      }

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

    // one pass over the set, emitting a progress line per query; pass
    // 0 is the untimed JIT/codegen warmup (its seconds are printed for
    // observability but never aggregated)
    def pass(p: Int, skip: Set[String]): Map[String, Double] =
      queries.map { case (name, fn) =>
        val sec: Double =
          if (skip(name)) -1.0
          else try {
            val t0 = System.nanoTime()
            run(fn)
            (System.nanoTime() - t0) / 1e9
          } catch {
            case e: Throwable =>
              if (!errors.exists(_._1 == name))
                errors ::= name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
              -1.0
          }
        println(s"""{"metric":"query_time","query":"$name","pass":$p,"sec":$sec}""")
        name -> sec
      }.toMap

    val warm = pass(0, Set.empty)
    val failedWarm = queries.collect { case (n, _) if warm(n) < 0 => n }.toSet
    // Two timed passes over the WHOLE set, min per query. Interleaving
    // beats back-to-back min-of-two: a transient host-load spike
    // inflates one pass, not both timings of whichever query it
    // happened to land on (round-2 bench pinned a spike on the two
    // queries that ran first; both bench sub-1 s in isolation).
    // timed passes catch per-query too: a transient failure (flaky
    // streaming restart, disk hiccup) must cost that query its timing,
    // not abort the whole bench and discard every other result
    val timed = (1 to TimedPasses).map(p => pass(p, failedWarm))
    val results = queries.map { case (name, _) =>
      // min of the passes that succeeded; -1 only if all failed
      val ok = timed.map(_(name)).filter(_ >= 0)
      name -> (if (ok.isEmpty) -1.0 else ok.min)
    }
    // contract: errors lists exactly the queries with -1 timing — a
    // query that recovered in the other pass reports its timing and
    // is NOT an error
    val failed = results.collect { case (n, v) if v < 0 => n }.toSet
    errors = errors.filter { case (n, _) => failed(n) }

    // standing regression criterion (BASELINE.md): each query within
    // 2× of its baseline under comparable load. Emitted as its own
    // line so a round's verdict can name regressions mechanically;
    // sub-second queries are job-overhead-dominated and excluded from
    // the flag list (the criterion weights absolute deltas there).
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_BASELINE", "BASELINE.md")
    val baseline: Map[String, Double] =
      try {
        val row = """\|\s*`([a-z0-9_]+)`\s*\|\s*([0-9.]+)\s*""".r
        // ISO-8859-1: decodes any byte sequence (the table rows we
        // parse are ASCII; prose around them may not be)
        scala.io.Source.fromFile(baselinePath, "ISO-8859-1").getLines()
          .flatMap(l => row.findAllMatchIn(l).map(m => m.group(1) -> m.group(2).toDouble))
          .toMap
      } catch { case _: Throwable => Map.empty }
    if (baseline.nonEmpty) {
      val ratios = results.collect {
        case (n, v) if v >= 0 && baseline.contains(n) =>
          (n, v, baseline(n), v / baseline(n))
      }
      val flagged = ratios.filter { case (_, v, b, r) => r > 2.0 && (v max b) >= 1.0 }
      val rj = ratios.map { case (n, _, _, r) => "\"" + n + "\":" + f"$r%.2f" }
        .mkString("{", ",", "}")
      val fj = flagged.map { case (n, v, b, _) => "\"" + n + "\":\"" + f"$v%.2f vs $b%.2f" + "\"" }
        .mkString("{", ",", "}")
      println(s"""{"metric":"baseline_ratio","baseline":"${esc(baselinePath)}","compared":${ratios.length},"over_2x":${flagged.length},"flagged":$fj,"ratios":$rj}""")
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.reverse
      .map { case (k, v) => "\"" + k + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // run conditions, so cross-round drift is attributable: an 18%
    // uniform shift with equal load/cpus is code, with higher load is
    // environment (r5's drift was indistinguishable without this).
    // queries_run + filtered make a SPARK_GRAFT_QUERIES run
    // distinguishable from the full protocol.
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val env = s""""env":{"load_avg":${os.getSystemLoadAverage},""" +
      s""""cpus_avail":${os.getAvailableProcessors},""" +
      s""""spark_cpus":$cpus,"passes":$TimedPasses,"warmup_passes":$WarmupPasses,""" +
      s""""queries_run":${queries.length},"filtered":${only.nonEmpty},""" +
      s""""jvm":"${esc(System.getProperty("java.version"))}"}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir",$env}""")
    spark.stop()
  }
}
