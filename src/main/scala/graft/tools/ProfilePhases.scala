package graft.tools

import org.apache.spark.sql.DataFrame

import graft.{GraftSession, SparkEntry, Tables}

/** Scratch measurement main for the optimization round: times named
  * sub-phases of the heavy queries so wall-clock can be attributed to
  * a specific pass (guide §1 — measure first, attribute, then fix).
  * Not part of the driver contract.
  */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = if (args.length > 1) args(1) else "dedup"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach(n => Tables.load(spark, dir, n).count())

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[phase] $name%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    what match {
      case "dedup" =>
        import graft.pipeline.Dedup
        // warm the session artifacts the way the bench warmup does
        t("warm:dedup_band_stats")(noop(Dedup.dedupBandStats(spark, dir)))
        t("warm:full dedup_keep")(noop(SparkEntry.queries("dedup_keep")(spark, dir)))
        (1 to 2).foreach { i =>
          t(s"$i:lshJaccardPairs(6500)")(noop(Dedup.lshJaccardPairs(spark, dir, 6500)))
          t(s"$i:winnowPairs")(noop(Dedup.winnowPairs(spark, dir)))
          t(s"$i:embeddingPairs")(noop(Dedup.embeddingPairs(spark, dir, threshold = 0.45)))
          t(s"$i:unionEdges(noCdc,noIvf)")(noop(Dedup.unionEdges(spark, dir, includeCdc = false, embIvf = false)))
          t(s"$i:dedup_keep full")(noop(SparkEntry.queries("dedup_keep")(spark, dir)))
          t(s"$i:dedup_clusters full")(noop(SparkEntry.queries("dedup_clusters")(spark, dir)))
        }
      case "lsh2" =>
        import org.apache.spark.sql.functions._
        import graft.functions._
        val normed = Tables.documents(spark, dir).select(col("doc_id"), col("lang"), col("source"),
          graft.pipeline.TextAnalysis.normText(col("text")).as("txt"))
        (1 to 2).foreach { i =>
          val g = graft.operators.Frames.materialize(
            normed.withColumn("sh", array_sort(graft.pipeline.Dedup.shingles("txt")))
              .select(col("doc_id"), col("lang"), col("source"), col("sh"),
                size(col("sh")).as("nsh"),
                minhash_signature(col("sh"), 64).as("sig")))
          println(f"[phase] $i:materialize-g done")
          val rows = 2
          val bandCols = (0 until 32).map { bnd =>
            val slice = (0 until rows).map(r => expr(s"element_at(sig, ${bnd * rows + r + 1})"))
            xxhash64((Seq(col("lang"), col("source"), lit(bnd)) ++ slice): _*)
          }
          val keyed = g.select(col("doc_id"), explode(array(bandCols: _*)).as("bh"))
          val cand = keyed.as("ka")
            .join(keyed.as("kb").hint("shuffle_hash"),
              col("ka.bh") === col("kb.bh") && col("ka.doc_id") < col("kb.doc_id"))
            .select(col("ka.doc_id").as("doc_a"), col("kb.doc_id").as("doc_b"))
          t(s"$i:cand join (pre-distinct)")(noop(cand))
          t(s"$i:cand distinct")(noop(cand.distinct()))
          t(s"$i:full lshJaccardPairs")(noop(graft.pipeline.Dedup.lshJaccardPairs(spark, dir, 6500)))
        }
      case "lsh" =>
        import org.apache.spark.sql.functions._
        import graft.functions._
        val docs = Tables.documents(spark, dir)
        val normed = docs.select(col("doc_id"), col("lang"), col("source"),
          graft.pipeline.TextAnalysis.normText(col("text")).as("txt"))
        def signed = normed.withColumn("sh", array_sort(graft.pipeline.Dedup.shingles("txt")))
          .select(col("doc_id"), col("lang"), col("source"), col("sh"),
            size(col("sh")).as("nsh"),
            minhash_signature(col("sh"), 64).as("sig"))
        (1 to 2).foreach { i =>
          t(s"$i:normed only")(noop(normed))
          t(s"$i:shingles+sort (no sig)")(noop(
            normed.withColumn("sh", array_sort(graft.pipeline.Dedup.shingles("txt")))
              .select(col("doc_id"), col("sh"))))
          t(s"$i:signedDocs (sig)")(noop(signed))
          t(s"$i:lshJaccardPairs full")(noop(
            graft.pipeline.Dedup.lshJaccardPairs(spark, dir, 6500)))
          t(s"$i:winnowPairs full")(noop(graft.pipeline.Dedup.winnowPairs(spark, dir)))
        }
      case "snap" =>
        t("warm:snapshot_upsert")(noop(SparkEntry.queries("snapshot_upsert")(spark, dir)))
        (1 to 3).foreach { i =>
          t(s"$i:snapshot_upsert")(noop(SparkEntry.queries("snapshot_upsert")(spark, dir)))
        }
        t("warm:compliance_delete")(noop(SparkEntry.queries("compliance_delete")(spark, dir)))
        (1 to 2).foreach { i =>
          t(s"$i:compliance_delete")(noop(SparkEntry.queries("compliance_delete")(spark, dir)))
          t(s"$i:corpus_upsert")(noop(SparkEntry.queries("corpus_upsert")(spark, dir)))
          t(s"$i:compact_partition")(noop(SparkEntry.queries("compact_partition")(spark, dir)))
          t(s"$i:snapshot_compact")(noop(SparkEntry.queries("snapshot_compact")(spark, dir)))
        }
      case q =>
        t(s"warm:$q")(noop(SparkEntry.queries(q)(spark, dir)))
        (1 to 3).foreach(i => t(s"$i:$q")(noop(SparkEntry.queries(q)(spark, dir))))
    }
    spark.stop()
  }
}
