package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins [[VecL2Sq]] bit-identical to the declarative
  * `aggregate(zip_with(...))` fold it replaced (same left-to-right
  * double accumulation) — the PQ family's oracles encode that exact
  * fold, so equality must be to the BIT, not approximate.
  */
class VecL2SqSpec extends SparkSpec {

  private def hof(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b,
      (x, y) => (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  test("float arrays: bit-identical to the HOF fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (0 until 2000).map { _ =>
      (Array.fill(8)(rnd.nextFloat() * 10 - 5),
        Array.fill(8)(rnd.nextFloat() * 10 - 5))
    }.toDF("a", "b")
    val rows = df.select(
      vecL2Sq(col("a"), col("b")).as("fast"),
      hof(col("a"), col("b")).as("ref")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("double arrays and 64-dim vectors: bit-identical") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (0 until 500).map { _ =>
      (Array.fill(64)(rnd.nextDouble() * 2 - 1),
        Array.fill(64)(rnd.nextDouble() * 2 - 1))
    }.toDF("a", "b")
    val rows = df.select(
      vecL2Sq(col("a"), col("b")).as("fast"),
      hof(col("a"), col("b")).as("ref")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("mismatched lengths: partial distance over min(n), not null " +
      "(the documented divergence from the HOF form)") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 9.0f), Array(3.0f, 5.0f))).toDF("a", "b")
    val v = df.select(vecL2Sq(col("a"), col("b"))).head.getDouble(0)
    // (1-3)^2 + (2-5)^2 = 13; the trailing 9 is ignored
    assert(v == 13.0)
    // ...whereas the replaced HOF fold nulls out on the padded element
    assert(df.select(hof(col("a"), col("b"))).head.isNullAt(0))
  }

  test("null array propagates null") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Option.empty[Array[Float]]))
      .toDF("a", "b")
    assert(df.select(vecL2Sq(col("a"), col("b"))).head.isNullAt(0))
  }
}
