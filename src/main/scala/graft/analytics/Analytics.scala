package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Analytics core (SURVEY §2D): pond's query engine generalised to
  * arbitrary star-schema analytics, written Spark-first.
  *
  * Numeric convention (SURVEY §6): every aggregated measure is cast to
  * DECIMAL(38,6) before summing — decimal addition is exact and
  * order-independent, so results hash-match the DuckDB oracle
  * regardless of partitioning / shuffle order. Doubles are only summed
  * inside ordered window frames (sequential on both engines).
  */
object Analytics {

  /** Emit an exact DECIMAL(38,6) sum as integer micro-units (×1e6,
    * BIGINT). The summation stays decimal — exact and
    * order-independent under any partitioning — but the *output*
    * column is a plain long: parquet decimal128 and DuckDB decimals
    * canonicalize differently in the correctness gate's hasher, while
    * int64 is representation-stable everywhere. A DECIMAL(38,6)×1e6
    * is exactly integral, so the cast loses nothing. (Range note: long
    * micro-units cap at ±9.2e12 whole units — plenty for the gate's
    * scale factors; a 100 TB deployment reporting larger totals would
    * keep the decimal column instead.)
    */
  private def micros(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (c * lit(1000000L)).cast("long")

  /** Exact micro-unit SUM with the aggregation running on LONGS: the
    * decimal(38,6) quantization (the rounding contract shared with the
    * oracle) happens per row, ×1e6 makes it exactly integral, and the
    * sum itself is plain int64 — whole-stage-codegen-friendly, an
    * 8-byte aggregation buffer instead of decimal128, and identical to
    * sum-then-scale by distributivity over exact integers. This is the
    * hot-path formulation for the scan-heavy aggregates (q1 etc.).
    *
    * Overflow is LOUD, never silent: [[graft.GraftSession]] pins
    * `spark.sql.ansi.enabled=true`, so a sum past ±9.2e18 micro-units
    * (±9.2e12 whole units) raises ArithmeticException instead of
    * wrapping. A deployment that legitimately exceeds that total
    * switches the affected query to a DECIMAL(38,6) accumulator with
    * the ×1e6 BIGINT cast moved to the final column.
    */
  private[graft] def sumMicros(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum((c.cast("decimal(38,6)") * lit(1000000L)).cast("long"))

  /** TPC-H Q1 shape: scan-heavy grouped aggregation, fully
    * partial-aggregated map-side (4 running sums + count per group,
    * 6 groups total → shuffle traffic is bytes, not rows).
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumMicros(col("l_quantity")).as("sum_qty"),
        sumMicros(col("l_extendedprice")).as("sum_base_price"),
        sumMicros(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3 shape: 3-way join + agg + top-N. The plan to check for:
    * broadcast of the filtered customer side is NOT wanted here
    * (customer is the big-ish probe); the top-N must be
    * TakeOrderedAndProject, not a global sort.
    */
  def q3TopN(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
    val orders = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val lineitem = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
      .agg(sumMicros(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: multi-way join where region/nation are broadcast
    * dims (verified in PlanSpec) — the log side never shuffles for
    * them.
    */
  def q5Join(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
    val customer = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val lineitem = Tables.lineitem(spark, dir)
    val supplier = Tables.supplier(spark, dir)
    customer
      .join(orders, col("c_custkey") === col("o_custkey"))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sumMicros(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Window functions: rank + running total per user over events.
    * Running sums are decimal → exact regardless of engine. One
    * shuffle on user_id; windows evaluate within partitions.
    */
  def qWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts_us"), col("value"))
      .withColumn("rn", row_number().over(w))
      .withColumn("running_value",
        micros(sum(col("value").cast("decimal(38,6)"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0))))
      .select("event_id", "user_id", "ts_us", "rn", "running_value")
      .orderBy("user_id", "rn")
  }

  /** RANGE-frame window — the time-based sibling of [[qWindow]]'s
    * ROWS frame: per record, bytes served by its site in the trailing
    * hour (closed interval [t−1h, t]). RANGE frames include all rows
    * whose ORDER BY key falls in the value interval, so ties on the
    * key get identical frames — deterministic under duplicate
    * timestamps where a ROWS frame would not be. One shuffle on site;
    * the frame is evaluated with a sliding aggregate inside each
    * partition, never a self-join.
    */
  def qWindowRange(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("site").orderBy(col("timestamp"))
      .rangeBetween(-3600000000L, 0)
    graft.logs.LogView(spark, dir)
      .select(col("event_id"), col("site"), col("timestamp"),
        col("traffic_sent"))
      .withColumn("trailing_bytes", sum("traffic_sent").over(w))
      .select("event_id", "site", "timestamp", "trailing_bytes")
      .orderBy("event_id")
  }

  /** Exact distinct-count per group. (The HLL variant is
    * `q_approx_distinct`, rows-only — sketch internals differ across
    * engines by design.)
    */
  def qDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** approx_count_distinct (HyperLogLog++): the 100 TB path for
    * distinct counting — no exact-distinct shuffle explosion.
    * Rows-only check: HLL estimates are engine-specific.
    */
  def qApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct("user_id", 0.02).as("n_users_approx"))
      .orderBy("event_type")

  /** Anti join (NOT EXISTS): customers with no urgent order. Plans as
    * a hash anti-join on custkey with the filter pushed below the
    * join; at scale the orders side reduces to distinct keys first.
    */
  def qExists(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Event funnel: users who signed up, and of those, who purchased at
    * or after their first signup. Two small aggs + one join on
    * user_id.
    */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("ts_us"))
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts_us").as("signup_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(max("ts_us").as("last_purchase_us"))
    signups.join(purchases, Seq("user_id"), "left")
      .agg(
        count(lit(1)).as("n_signup_users"),
        count(when(col("last_purchase_us") >= col("signup_us"), 1))
          .as("n_converted"))
  }

  /** Gap-based sessionization over events per user (30-minute idle,
    * generalising pond's visitor tracking — reference
    * client/VisitorTracker.hxx:16-27). Session-level output. One
    * shuffle on user_id.
    */
  def qSessionize(spark: SparkSession, dir: String, gapUs: Long = 30L * 60 * 1000000): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"))
      .withColumn("gap", col("ts_us") - lag("ts_us", 1).over(byUser))
      .withColumn("is_new", when(col("gap").isNull || col("gap") >= gapUs, 1).otherwise(0))
      .withColumn("session_seq",
        sum("is_new").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
        (max("ts_us") - min("ts_us")).as("duration_us"))
      .orderBy("user_id", "session_seq")
  }

  /** JSON property extraction + aggregation: `props.k` is parsed with
    * `get_json_object` (codegen'd path expression, no UDF) and
    * bucketed.
    */
  def qJson(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"),
        col("value"))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"),
        sumMicros(col("value")).as("sum_value"))
      .orderBy("k_bucket")

  /** The finest-grain aggregate that ROLLUP/CUBE re-aggregate from.
    * Grouping sets in Spark plan as an Expand that multiplies every
    * INPUT row by the number of grouping sets before the shuffle — ×3
    * (rollup) / ×4 (cube) the scan volume at 100 TB. Since the
    * measures are associative (sums of sums, sums of counts),
    * aggregating to the base grain FIRST shrinks the Expand's input
    * from the fact table to |distinct groups| rows, with an exactly
    * identical result.
    */
  private def flagStatusBase(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sumMicros(col("l_quantity")).as("part_qty"),
        count(lit(1)).as("part_n"))

  /** Hierarchical aggregation (ROLLUP): per (flag, status), per flag,
    * grand total — re-aggregated from [[flagStatusBase]].
    */
  def qRollup(spark: SparkSession, dir: String): DataFrame =
    flagStatusBase(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum("part_qty").as("sum_qty"), sum("part_n").as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** CUBE: all grouping-set combinations of (returnflag, linestatus) —
    * the drill-down companion to [[qRollup]].
    */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    flagStatusBase(spark, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(sum("part_qty").as("sum_qty"), sum("part_n").as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Pivot: per-user event-type counts as columns. The pivot values
    * are PINNED (never inferred) — inference would need an extra
    * distinct pass over 100 TB and make the schema data-dependent.
    * Plans as a single groupBy with one conditional count per pinned
    * value — partial-aggregatable, one shuffle on user_id.
    */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("view", "click", "purchase", "signup", "error")
    Tables.events(spark, dir)
      .groupBy("user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0, types)
      .orderBy("user_id")
  }

  /** As-of join: for every purchase, the most recent 'view' by the
    * same user at or before the purchase (attribution).
    *
    * Spark-first implementation: UNION the two event sets tagged, one
    * shuffle on user_id, then `last(ignoreNulls)` over the time-ordered
    * window carries the latest view timestamp forward — O(n log n)
    * within partitions, no join explosion, no range join. (The DuckDB
    * oracle uses its native ASOF JOIN — an independent implementation
    * of the same semantics.) View rows sort before purchases at the
    * same microsecond (tag 0 < 1), making the match inclusive.
    */
  def qAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us"), lit(0).as("tag"),
        lit(null).cast("long").as("event_id"), col("ts_us").as("view_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), lit(1).as("tag"),
        col("event_id"), lit(null).cast("long").as("view_us"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    views.unionByName(purchases)
      .withColumn("last_view_us", last("view_us", ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select("event_id", "user_id", "ts_us", "last_view_us")
      .orderBy("event_id")
  }

  /** Semi join (EXISTS): orders placed by BUILDING-segment customers,
    * counted per priority. LeftSemi keeps only the probe side's
    * columns, so Spark builds the hash table from the key column
    * alone — at 100 TB the build side is |matching customers| keys,
    * comfortably broadcast-able, and no customer attribute ever
    * crosses the shuffle (unlike an inner-join-then-drop, which
    * also multiplies rows on duplicate keys — semi can't).
    */
  def qSemi(spark: SparkSession, dir: String): DataFrame = {
    val building = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    Tables.orders(spark, dir)
      .join(broadcast(building), col("o_custkey") === col("c_custkey"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** Anti join — the NOT EXISTS complement of [[qSemi]]: customers
    * that have never placed an URGENT order, counted per market
    * segment (the bare no-orders-at-all form is empty on this data —
    * every customer orders — so the priority filter keeps the gate
    * non-vacuous at every SF). The fact side streams through a LEFT
    * ANTI against the broadcast distinct key set of urgent orders'
    * customers; like the semi join, nothing fact-sized is shuffled
    * when the key side broadcasts, and on a real cluster a
    * non-broadcastable key side degrades to a co-partitioned shuffled
    * anti join, never a cross product.
    */
  def qAnti(spark: SparkSession, dir: String): DataFrame = {
    val orderCust = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
    Tables.customer(spark, dir)
      .join(broadcast(orderCust), col("c_custkey") === col("o_custkey"),
        "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        min("c_custkey").as("min_custkey"))
      .orderBy("c_mktsegment")
  }

  /** Iterative link-graph ranking (PageRank power iteration, damping
    * 0.85, `iters` unrolled rounds) over the referer→host click graph
    * — the "which of my properties do referrers actually feed"
    * question, and the engine's demonstration of iterative-join
    * (Pregel-style) algebra. Ranks are exact integer micro-units:
    * each round is `150000 + (850 · Σ_in (rank·w div outw)) div 1000`
    * — truncating int64 division at every step (Spark `div` == DuckDB
    * `//`), so the fixpoint trajectory is bit-identical across
    * engines and the gate is a hash gate, no float tolerance.
    * Dangling nodes contribute nothing (rank leaks, as in the
    * un-normalised PageRank variant) — deterministic on both engines.
    *
    * Plan shape: the corpus-sized work is the one edge-extraction
    * aggregate; the per-round relations are GRAPH-sized (nodes,
    * edges), and because every round references the same edge
    * subtree, Spark plans ONE edge exchange reused across rounds
    * (ReusedExchange). At 100 TB the edge list would be checkpointed
    * once (the [[graft.operators.Components]] discipline) and each
    * round is a co-partitioned join on the node key — O(iters)
    * graph-sized shuffles, corpus scanned once.
    */
  def linkRank(spark: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    // edges/nodes are consumed by every iteration of the loop below —
    // materialized ONCE (fresh-leaf localCheckpoint) instead of
    // re-deriving the scan + aggregate + window per iteration
    val edges = graft.operators.Frames.materialize(
      graft.logs.LogView(spark, dir)
        .filter(col("referer").isNotNull)
        .select(regexp_extract(col("referer"), "://([^/]+)", 1).as("src"),
          col("host").as("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        .withColumn("outw", sum("w").over(Window.partitionBy("src"))))
    val nodes = graft.operators.Frames.materialize(
      edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node")))
        .distinct())
    var rank = nodes.withColumn("rank_mu", lit(1000000L))
    for (_ <- 1 to iters) {
      val contrib = edges.join(rank, col("src") === col("node"))
        .select(col("dst"), expr("rank_mu * w div outw").as("c"))
        .groupBy("dst").agg(sum("c").as("contrib"))
      rank = nodes.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          expr("150000L + (850L * coalesce(contrib, 0L)) div 1000L")
            .as("rank_mu"))
    }
    rank.orderBy(col("rank_mu").desc, col("node"))
  }

  /** GROUPING SETS with explicitly chosen sets — per flag and per
    * status, but NOT the cross grain or the grand total (what ROLLUP /
    * CUBE can't express). Pre-aggregated from [[flagStatusBase]] like
    * its siblings, so the Expand multiplies |distinct groups| rows,
    * not the fact table. `grouping_id` disambiguates the (flag, NULL)
    * vs (NULL, status) rows the way the SQL standard does.
    */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    flagStatusBase(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"),
        sum("part_qty").as("sum_qty"), sum("part_n").as("n"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Correlated aggregate (TPC-H Q17 shape): revenue of lineitems
    * whose quantity is below 0.2× the average quantity of their part.
    * The per-part average is a self-aggregation joined back — the
    * decorrelated plan Catalyst would produce from the subquery, but
    * written directly so the join is explicit. The 0.2×avg threshold
    * is exact integer algebra: `qty < 0.2 * (sum/n)` ⟺
    * `5 * n * qty_mu < sum_mu` over micro-unit longs — no division,
    * no float, identical in both engines. Per-part sums are bounded
    * (|parts| rows) → the joined-back side aggregates map-side and
    * broadcasts at any scale where |parts| ≪ |lineitem|.
    */
  def qCorrelated(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_returnflag"),
        micros(col("l_quantity").cast("decimal(38,6)")).as("qty_mu"),
        micros(col("l_extendedprice").cast("decimal(38,6)")).as("price_mu"))
    val perPart = li.groupBy(col("l_partkey").as("p_key"))
      .agg(sum("qty_mu").as("sum_mu"), count(lit(1)).as("n_li"))
    li.join(broadcast(perPart), col("l_partkey") === col("p_key"))
      .filter(col("qty_mu") * lit(5L) * col("n_li") < col("sum_mu"))
      .groupBy("l_returnflag")
      .agg(sum("price_mu").as("below_avg_revenue_mu"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** Set operation (INTERSECT): customers active in both 1995 and
    * 1996. INTERSECT plans as a left-semi aggregate over the two
    * key sets — each branch reduces to distinct keys before the
    * shuffle, so the exchanged volume is |active customers|, not
    * |orders|, per branch.
    */
  def qIntersect(spark: SparkSession, dir: String): DataFrame =
    activeIn(spark, dir, 1995).intersect(activeIn(spark, dir, 1996))
      .orderBy("o_custkey")

  /** Set operation (EXCEPT): customers active in 1995 who did NOT
    * return in 1996 — churn. Same distinct-keys-per-branch shape as
    * [[qIntersect]], planned as a left-anti aggregate.
    */
  def qExcept(spark: SparkSession, dir: String): DataFrame =
    activeIn(spark, dir, 1995).except(activeIn(spark, dir, 1996))
      .orderBy("o_custkey")

  /** The SQL-text front end: the engine's tables exposed as views and
    * queried with plain SQL, including a correlated EXISTS that
    * Catalyst decorrelates into the same semi join [[qSemi]] builds
    * by hand — the surface a BI tool or notebook user actually
    * touches. The oracle is the near-verbatim same SQL in DuckDB.
    */
  def qSqlExists(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_v")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n
        |FROM customer_v c
        |WHERE EXISTS (SELECT 1 FROM orders_v o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 300000)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  private def activeIn(spark: SparkSession, dir: String,
                       year: Int): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
      .select(col("o_custkey"))
}
