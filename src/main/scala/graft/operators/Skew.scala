package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed shuffle joins (SURVEY §4).
  *
  * AQE's skew-join split handles most skew at runtime, but it only
  * fires for sort-merge joins and can't help when the join is
  * bucketed/pinned or the skew is in the build side of a shuffled
  * hash join. The classic remedy is explicit: break each hot key into
  * `salts` sub-keys on the big side, replicate the small side once
  * per salt, and join on (key, salt) — every reducer then holds at
  * most 1/`salts` of a hot key's rows, at the cost of `salts`× the
  * small side (fine: it is small by definition).
  *
  * Result set is provably identical to the unsalted join (each big
  * row meets each matching small row exactly once — for its own
  * salt). SkewSpec asserts equality and the salted key in the plan.
  */
object Skew {

  /** Inner-join `big` ⋈ `small` on `keys`, salted. `saltFrom` is any
    * deterministic big-side expression with per-row spread (a row id,
    * the full row hash) — NOT a random: determinism keeps retries and
    * speculative tasks consistent.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFrom: Column, salts: Int = 16): DataFrame = {
    require(salts > 0)
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "saltedJoin reserves the _salt column name; rename it on the inputs")
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(saltFrom), lit(salts.toLong)).cast("int"))
    val replicatedSmall = small.withColumn("_salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    saltedBig.join(replicatedSmall, keys :+ "_salt").drop("_salt")
  }
}
