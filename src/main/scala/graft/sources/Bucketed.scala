package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Bucketed fact tables — the co-located-join layout (SURVEY §4): both
  * sides written `bucketBy(n, key).sortBy(key)`, so every subsequent
  * join or aggregation on the key plans WITHOUT an Exchange on either
  * input. At 100 TB the one-time layout cost is repaid by every query;
  * BucketedJoinSpec asserts the shuffle-free plan, and the
  * `q_bucket_join` gate entry proves the bucketed path returns results
  * identical to the plain-parquet oracle.
  */
object Bucketed {

  /** Write lineitem/orders bucketed on the order key (idempotent per
    * (session, sf dir) — Bench's repeated passes reuse the tables).
    * Table names carry a dir digest so different scale factors in one
    * JVM can't collide; a stale same-name warehouse dir from an
    * earlier JVM is deleted first (saveAsTable refuses to overwrite a
    * path the in-memory catalog has no entry for).
    */
  def ensureTables(spark: SparkSession, dir: String,
                   buckets: Int = 8): (String, String) = {
    val suf = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    // bucket count is part of the identity: asking for a different
    // count must never silently reuse a differently-bucketed table
    val li = s"li_bkt_${suf}_$buckets"
    val ord = s"ord_bkt_${suf}_$buckets"
    if (!spark.catalog.tableExists(li) || !spark.catalog.tableExists(ord)) {
      // reclaim EVERY orphaned bucketed artifact, not just the two
      // names being (re)created: earlier JVMs (or other bucket
      // counts) leave li_bkt_*/ord_bkt_* dirs the in-memory catalog
      // has forgotten — without the sweep they accumulate forever
      val warehouse = new java.io.File("spark-warehouse")
      val stale = Option(warehouse.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory &&
          (f.getName.startsWith("li_bkt_") || f.getName.startsWith("ord_bkt_")) &&
          !spark.catalog.tableExists(f.getName))
      (stale.map(_.getName) ++ Seq(li, ord)).distinct.foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new java.io.File(s"spark-warehouse/$t")
        if (loc.exists()) {
          val walk = java.nio.file.Files.walk(loc.toPath)
          try {
            walk.sorted(java.util.Comparator.reverseOrder())
              .forEach(p => java.nio.file.Files.delete(p))
          } finally walk.close()
        }
      }
      Tables.lineitem(spark, dir).write
        .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(li)
      Tables.orders(spark, dir).write
        .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(ord)
    }
    (li, ord)
  }

  /** Revenue-per-status over the bucketed join — the query whose plan
    * has no Exchange below the join (both sides pre-partitioned and
    * pre-sorted on the key by the layout).
    */
  def bucketJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val (li, ord) = ensureTables(spark, dir)
    spark.table(li)
      .join(spark.table(ord), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(graft.analytics.Analytics.sumMicros(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }
}
