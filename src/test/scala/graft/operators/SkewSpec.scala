package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted join equals the plain join on a 90%-one-key skew") {
    import spark.implicits._
    // 9000 rows of the hot key, 1000 spread over 10 cold keys
    val big = ((1 to 9000).map(i => (i.toLong, "hot")) ++
      (1 to 1000).map(i => (i.toLong + 9000, s"cold_${i % 10}")))
      .toDF("row_id", "k")
    val small = (Seq("hot") ++ (0 until 10).map(i => s"cold_$i"))
      .zipWithIndex.map { case (k, w) => (k, w * 10) }
      .toDF("k", "weight")
    val plain = big.join(small, Seq("k"))
      .select("row_id", "k", "weight").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val salted = Skew.saltedJoin(big, small, Seq("k"), col("row_id"))
      .select("row_id", "k", "weight").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(salted == plain)
    assert(salted.size == 10000)
  }

  test("the physical join key carries the salt") {
    import spark.implicits._
    val big = (1 to 100).map(i => (i.toLong, "k1")).toDF("row_id", "k")
    val small = Seq(("k1", 1)).toDF("k", "w")
    val p = Skew.saltedJoin(big, small, Seq("k"), col("row_id"), salts = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("_salt"), p)
  }
}
