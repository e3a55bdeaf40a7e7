package graft

import org.apache.spark.sql.functions._

/** The 100 TB co-located-join strategy (SURVEY §4): bucketing both
  * fact tables on the join key lets Spark plan a SortMergeJoin with NO
  * Exchange on either side — at scale this is the difference between
  * joining in place and re-shuffling 100 TB.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed fact tables join without a shuffle") {
    // saveAsTable writes to the default warehouse dir (./spark-warehouse,
    // gitignored); Bucketed.ensureTables handles the stale-dir and
    // per-sf-dir naming concerns
    val (li, ord) = graft.sources.Bucketed.ensureTables(spark, sf)
    val joined = spark.table(li)
      .join(spark.table(ord), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(sum(col("l_quantity").cast("decimal(38,6)")).as("q"))
    // disable broadcast for this check: force the merge-join path that a
    // fact-fact join takes at scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      // the join itself must not introduce exchanges on its inputs: the
      // only allowed Exchange is the post-join aggregation shuffle
      val joinPart = p.substring(p.indexOf("Join"))
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey"), p)
      assert(!joinPart.contains("Exchange hashpartitioning(o_orderkey"), p)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (64 * 1024 * 1024).toString)
    }
  }
}
