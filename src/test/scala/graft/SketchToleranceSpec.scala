package graft

import org.apache.spark.sql.functions._

import graft.analytics.Analytics
import graft.logs.{LogView, Shaping}

/** ±ε gates for the two operators whose driver gate is rows-only
  * BECAUSE they are sketches (t-digest percentiles, HLL distinct):
  * their values are engine-specific, so the DuckDB hash compare
  * cannot apply — but each sketch carries a PUBLISHED error bound,
  * and these tests enforce it against the exact in-repo counterpart
  * on the same data. A sketch drifting outside its documented bound
  * (bad merge, wrong accuracy knob, regression in the percentile
  * array plumbing) fails here even though the driver gate can't see
  * it.
  */
class SketchToleranceSpec extends SparkSpec {

  test("approx_percentile stays within its rank-error bound of the exact percentiles") {
    // approx_percentile(_, _, accuracy=1000) guarantees rank error
    // ≤ 1/accuracy = 0.001·n. Gate at ±2% RANK (20× slack for
    // interpolation-vs-nearest-rank definitional skew on small
    // per-site groups): the approx value at quantile q must lie
    // within the exact [q-0.02, q+0.02] value envelope per site.
    val log = LogView(spark, sf01)
    val qs = Seq(0.5, 0.95, 0.99)
    val eps = 0.02
    val lo = qs.map(q => math.max(0.0, q - eps))
    val hi = qs.map(q => math.min(1.0, q + eps))
    val envelope = log.groupBy("site").agg(
      expr(s"percentile(duration_us, array(${lo.mkString(",")}))").as("lo"),
      expr(s"percentile(duration_us, array(${hi.mkString(",")}))").as("hi"))
    val approx = Shaping.durationQuantilesApprox(log)
    val joined = approx.join(envelope, "site").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val lo = r.getAs[scala.collection.Seq[Double]]("lo")
      val hi = r.getAs[scala.collection.Seq[Double]]("hi")
      val vals = Seq(r.getAs[Number]("p50_us").doubleValue(),
        r.getAs[Number]("p95_us").doubleValue(),
        r.getAs[Number]("p99_us").doubleValue())
      qs.indices.foreach { i =>
        assert(vals(i) >= lo(i) - 1 && vals(i) <= hi(i) + 1,
          s"site=${r.getString(0)} q=${qs(i)}: approx ${vals(i)} outside exact rank envelope [${lo(i)}, ${hi(i)}]")
      }
    }
  }

  test("approx_count_distinct stays within 3×rsd of the exact distinct count") {
    // HLL++ at rsd=0.02: the estimate is within 3σ = 6% of the true
    // cardinality with ~99.7% probability; the data and seed are
    // fixed, so this is a deterministic regression gate, not a flaky
    // probabilistic one.
    val exact = Analytics.qDistinct(spark, sf01)
      .select(col("event_type"), col("n_users"))
    val approx = Analytics.qApproxDistinct(spark, sf01)
    val joined = approx.join(exact, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val est = r.getAs[Long]("n_users_approx").toDouble
      val tru = r.getAs[Long]("n_users").toDouble
      val relErr = math.abs(est - tru) / tru
      assert(relErr <= 0.06,
        s"event_type=${r.getString(0)}: HLL estimate $est vs exact $tru (rel err $relErr > 0.06)")
    }
  }
}
