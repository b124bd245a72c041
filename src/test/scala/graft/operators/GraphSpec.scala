package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pointer-doubling flattening on planted forests with known exact
  * depths — the shapes the md5 forest only covers statistically.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("a 100-deep chain resolves to its single root with exact depths") {
    // 0 <- 1 <- 2 <- ... <- 100
    val par = (0L to 100L).map(n => (n, math.max(n - 1, 0L)))
      .toDF("node", "parent")
    val out = Graph.rootsFor(par).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(0L) == ((0L, 0L)))
    assert(out(1L) == ((0L, 1L)))
    assert(out(100L) == ((0L, 100L)))
    assert(out.size == 101)
  }

  test("a star and a second tree stay separate (forest, not one tree)") {
    val par = Seq((0L, 0L), (10L, 0L), (11L, 0L), (12L, 0L),
      (5L, 5L), (20L, 5L), (21L, 20L)).toDF("node", "parent")
    val out = Graph.rootsFor(par).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(10L) == ((0L, 1L)) && out(12L) == ((0L, 1L)))
    assert(out(20L) == ((5L, 1L)) && out(21L) == ((5L, 2L)))
    assert(out(5L) == ((5L, 0L)))
  }

  test("pagerank: mass conserved and a pure hub dominates a pure spoke") {
    // 5-node graph: every node links to 0; 0 links to 1. Node 0 must
    // absorb the bulk of the rank; total mass stays 1 up to the
    // per-round rounding slack (no dangling nodes by construction).
    val nodes = (0L to 4L).toDF("node")
    val edges = ((1L to 4L).map(n => (n, 0L)) :+ ((0L, 1L)))
      .toDF("src", "dst")
    val r = Graph.pagerankFor(nodes, edges, 5L).collect()
      .map(x => x.getLong(0) -> x.getDecimal(1).doubleValue()).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-6, s"mass ${r.values.sum}")
    assert(r(0L) > r(1L) && r(1L) > r(2L), r.toString)
    assert(r(2L) == r(3L) && r(3L) == r(4L)) // symmetric spokes tie exactly
  }

  test("pagerank: uniform ring stays uniform (the fixed point is exact)") {
    // each node links to the next: the uniform vector is PageRank's
    // fixed point, and the exact-decimal discipline must hold it
    // bit-stably across rounds rather than drift
    val n = 8L
    val nodes = (0L until n).toDF("node")
    val edges = (0L until n).map(i => (i, (i + 1) % n)).toDF("src", "dst")
    val r = Graph.pagerankFor(nodes, edges, n).collect()
      .map(_.getDecimal(1).doubleValue()).distinct
    assert(r.length == 1, s"ring ranks diverged: ${r.toSeq}")
    assert(math.abs(r.head - 1.0 / n) < 1e-9)
  }

  test("weighted pagerank: the heavier edge carries the rank mass") {
    // 0 splits its vote 9:1 between 1 and 2; both return it. Rank(1)
    // must dominate rank(2); mass stays 1 up to rounding slack.
    val nodes = (0L to 2L).toDF("node")
    val edges = Seq((0L, 1L, 9L), (0L, 2L, 1L), (1L, 0L, 1L),
      (2L, 0L, 1L)).toDF("src", "dst", "w")
    val r = Graph.pagerankWeighted(nodes, edges, 3L).collect()
      .map(x => x.getLong(0) -> x.getDecimal(1).doubleValue()).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-6, s"mass ${r.values.sum}")
    assert(r(1L) > r(2L), r.toString)
    assert(r(0L) > r(1L), r.toString) // everyone votes for 0
  }

  test("pagerank: the graded plan has no cartesian and no corpus broadcast") {
    val plan = Graph.graphPagerank(spark, sf).queryExecution.executedPlan
      .toString()
    assert(!plan.contains("CartesianProduct"), "cartesian in pagerank plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "BNLJ in pagerank plan")
  }

  test("doubling equals the one-edge-at-a-time walk on the graded forest") {
    // parents are strictly smaller, so a key-prefix slice is closed
    // under ancestors (limit() would not be)
    val par = Graph.parentForest(spark, sf).filter(col("node") < 200)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val doubled = Graph.rootsFor(
      par.toSeq.toDF("node", "parent")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    par.keys.foreach { n =>
      var (cur, d) = (n, 0L)
      while (par(cur) != cur) { cur = par(cur); d += 1 }
      assert(doubled(n) == ((cur, d)), s"node $n: ${doubled(n)} vs ($cur, $d)")
    }
  }
}
