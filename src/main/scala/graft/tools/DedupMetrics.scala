package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.GraftSession

/** Per-stage WORK accounting for the dedup family across scale
  * decades (r10 verdict ask #4): the sf1→sf10 wall ratios (13–19×
  * for 10× data) conflate genuine work growth with machine
  * saturation, and wall clock alone cannot separate them. This probe
  * runs `dedup_lsh_verify` and `dedup_keep` under a stage listener
  * and reports, per phase:
  *
  *  - shuffle bytes/records written and read (summed over stages,
  *    plus the top stages by write volume) — the scale-invariant
  *    "how much data moved" number;
  *  - the analytic candidate volume (band buckets, Σ C(occ,2)
  *    candidate pairs, max bucket occupancy) and the verified pair /
  *    edge counts — the "how much pair work existed" numbers.
  *
  * If records/bytes grow ~linearly per decade while wall grows
  * super-linearly, the gap is saturation (32 cores absorbing 10× the
  * partitions), not algorithmic blow-up; if candidate pairs grow
  * super-linearly, the banding needs an occupancy cap. Output: JSON
  * lines, one per phase + one summary.
  *
  * Usage: `runMain graft.tools.DedupMetrics <sfDir> [bucketCap]` —
  * with a cap, a third phase runs the occupancy-capped listing
  * (hub stars for over-cap buckets) and reports the capped analytic
  * candidate volume Σ (occ ≤ cap ? C(occ,2) : occ−1) next to the
  * uncapped bound, so the knob's listing-cost reduction is measured,
  * not asserted.
  */
object DedupMetrics {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cap = args.drop(1).headOption.map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    val stages =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.synchronized {
          val m = sc.stageInfo.taskMetrics
          stages += ((sc.stageInfo.stageId,
            sc.stageInfo.name.takeWhile(_ != '\n').take(60),
            m.shuffleWriteMetrics.bytesWritten,
            m.shuffleWriteMetrics.recordsWritten,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleReadMetrics.recordsRead))
        }
    })

    def f2(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))

    def phase(name: String)(body: => Unit): Unit = {
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are posted asynchronously — give the bus a
      // moment to drain (the private waitUntilEmpty is inaccessible;
      // stage-completed events trail the job end by milliseconds)
      Thread.sleep(500)
      val snap = stages.synchronized(stages.toList)
      val swB = snap.map(_._3).sum; val swR = snap.map(_._4).sum
      val srB = snap.map(_._5).sum; val srR = snap.map(_._6).sum
      val top = snap.sortBy(-_._3).take(5).map { case (id, n, b, r, _, _) =>
        s"""{"stage":$id,"name":"${n.replace("\"", "'")}","write_bytes":$b,"write_records":$r}"""
      }.mkString("[", ",", "]")
      println(s"""{"metric":"dedup_phase","phase":"$name","sf":"$dir","wall_sec":${f2(wall)},"stages":${snap.length},"shuffle_write_bytes":$swB,"shuffle_write_records":$swR,"shuffle_read_bytes":$srB,"shuffle_read_records":$srR,"top_write_stages":$top}""")
    }

    phase("lsh_verify") {
      graft.pipeline.Dedup.lshJaccardPairs(spark, dir, minBp = 6500)
        .write.format("noop").mode("overwrite").save()
    }
    phase("keep_drop") {
      graft.pipeline.Dedup.keepDrop(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    cap.foreach { c =>
      phase(s"lsh_verify_cap$c") {
        graft.pipeline.Dedup
          .lshJaccardPairs(spark, dir, minBp = 6500, bucketCap = Some(c))
          .write.format("noop").mode("overwrite").save()
      }
    }

    // analytic candidate volume — the work bound the banding promises
    val capExpr = cap match {
      case Some(c) => expr(
        s"sum(if(occ <= $c, occ * (occ - 1) div 2, occ - 1))")
      case None => expr("cast(null as bigint)")
    }
    val occ = graft.pipeline.Dedup.bandKeysOf(spark, dir)
      .groupBy("bh").agg(count(lit(1)).as("occ"))
      .agg(count(lit(1)).as("buckets"),
        sum(expr("occ * (occ - 1) div 2")).as("cand_pairs"),
        max("occ").as("max_occ"),
        capExpr.as("cand_pairs_capped"))
      .head()
    val verified = graft.pipeline.Dedup
      .lshJaccardPairs(spark, dir, minBp = 6500).count()
    val edges = graft.pipeline.Dedup.unionEdges(spark, dir).count()
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val capped = if (occ.isNullAt(3)) "null" else occ.getLong(3).toString
    println(s"""{"metric":"dedup_work","sf":"$dir","band_buckets":${occ.getLong(0)},"candidate_pairs":${occ.getLong(1)},"max_bucket_occupancy":${occ.getLong(2)},"candidate_pairs_capped":$capped,"bucket_cap":${cap.getOrElse("null")},"verified_pairs":$verified,"union_edges":$edges,"load_avg":${os.getSystemLoadAverage},"cpus":$cpus}""")
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
  }
}
