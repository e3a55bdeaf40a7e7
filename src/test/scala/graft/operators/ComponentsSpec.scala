package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {

  test("components: chain, triangle and singleton resolve to min labels") {
    import spark.implicits._
    // chain 1-2-3-4-5 (diameter 4 — exercises pointer jumping),
    // triangle 10-11-12, singleton 20
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("a", "b")
    val nodes = (Seq(20L) ++ (1L to 5L) ++ (10L to 12L)).toDF("node")
    val got = Components.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 5L).foreach(n => assert(got(n) == 1L, s"node $n"))
    (10L to 12L).foreach(n => assert(got(n) == 10L, s"node $n"))
    assert(got(20L) == 20L)
    assert(got.size == 9)
  }

  test("components: empty graph yields empty result, not a crash") {
    import spark.implicits._
    val got = Components.connectedComponents(
      Seq.empty[Long].toDF("node"),
      Seq.empty[(Long, Long)].toDF("a", "b"))
    assert(got.count() == 0)
  }

  test("components: random graphs agree with a union-find reference") {
    import spark.implicits._
    // seeded generator — deterministic across runs
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val n = 20 + rnd.nextInt(30)
      val nodes = (0L until n.toLong).toVector
      val edges = Vector.fill(rnd.nextInt(n * 2))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // reference: plain union-find by min root
      val parent = scala.collection.mutable.Map(nodes.map(x => x -> x): _*)
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val expected = nodes.map(x => x -> find(x)).toMap
      val got = Components.connectedComponents(
        nodes.toDF("node"), edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial (n=$n, |E|=${edges.size})")
    }
  }

  test("components: edge direction does not matter") {
    import spark.implicits._
    val edges = Seq((7L, 3L), (3L, 9L)).toDF("a", "b")
    val nodes = Seq(3L, 7L, 9L).toDF("node")
    val got = Components.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 3L, 7L -> 3L, 9L -> 3L))
  }
}
