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
