package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** KMV sketch: determinism under repartitioning (merge is a set
  * operation), exactness below k, bounded error above k.
  */
class KMVDistinctSpec extends SparkSpec {

  private lazy val li = graft.Tables.load(spark, sf, "lineitem")

  test("exact below k: small distinct domains count exactly") {
    val r = li.agg(
      KMVDistinct(col("l_returnflag"), 256).as("est"),
      countDistinct(col("l_returnflag")).as("exact")).head()
    assert(r.getDouble(0) == r.getLong(1).toDouble)
  }

  test("bounded error above k; deterministic across partitionings") {
    def run(parts: Int) = li.repartition(parts)
      .agg(KMVDistinct(col("l_orderkey"), 256).as("est"),
        countDistinct(col("l_orderkey")).as("exact")).head()
    val a = run(3)
    val b = run(13)
    assert(a.getDouble(0) == b.getDouble(0)) // partition-order independent
    val (est, exact) = (a.getDouble(0), a.getLong(1).toDouble)
    val err = math.abs(est - exact) / exact
    info(f"KMV k=256: est=$est%.0f exact=$exact%.0f err=${err * 100}%.1f%%")
    assert(err < 0.15, f"relative error $err%.3f out of bounds")
  }

  test("per-group sketches under groupBy") {
    val rows = li.groupBy(col("l_returnflag"))
      .agg(KMVDistinct(col("l_suppkey"), 256).as("est"),
        countDistinct(col("l_suppkey")).as("exact"))
      .collect()
    rows.foreach { r =>
      val (est, exact) = (r.getDouble(1), r.getLong(2).toDouble)
      assert(math.abs(est - exact) / exact < 0.15)
    }
  }

  test("md5-domain sketch: same contracts (exact below k, bounded " +
      "error, partition-order independence) in the oracle-able domain") {
    val below = li.agg(
      KMVDistinct.md5Sketch(col("l_returnflag"), 256).as("est"),
      countDistinct(col("l_returnflag")).as("exact")).head()
    assert(below.getDouble(0) == below.getLong(1).toDouble)
    def run(parts: Int) = li.repartition(parts)
      .agg(KMVDistinct.md5Sketch(col("l_orderkey"), 256).as("est"),
        countDistinct(col("l_orderkey")).as("exact")).head()
    val a = run(3)
    val b = run(13)
    assert(a.getDouble(0) == b.getDouble(0))
    val (est, exact) = (a.getDouble(0), a.getLong(1).toDouble)
    assert(math.abs(est - exact) / exact < 0.15,
      f"md5-KMV err ${math.abs(est - exact) / exact}%.3f out of bounds")
  }
}
