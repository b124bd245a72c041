package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins [[HllDistinct]]'s bit-identity with the builtin
  * `approx_count_distinct` — the optimization's entire correctness
  * claim is "same estimate, cheaper plumbing", so every estimate must
  * EQUAL the builtin's, not approximate it.
  */
class HllDistinctSpec extends SparkSpec {

  private def longs(n: Int, mod: Int) = {
    import spark.implicits._
    (0 until n).map(i => ((i * 2654435761L) % mod).abs).toDF("v")
  }

  test("long column: equal to builtin at rsd 0.01 / 0.02 / 0.05") {
    val df = longs(60000, 7919)
    Seq(0.01, 0.02, 0.05).foreach { rsd =>
      val ours = df.agg(HllDistinct(col("v"), rsd)).head.getLong(0)
      val builtin =
        df.agg(approx_count_distinct(col("v"), rsd)).head.getLong(0)
      assert(ours == builtin, s"rsd=$rsd")
    }
  }

  test("double column incl -0.0/0.0/NaN/null: equal to builtin") {
    import spark.implicits._
    val vals: Seq[java.lang.Double] =
      Seq[java.lang.Double](-0.0, 0.0, Double.NaN, null, 1.5, -1.5, 2.25) ++
        (0 until 20000).map(i => java.lang.Double.valueOf(i % 4093 * 0.25))
    val df = vals.toDF("v")
    Seq(0.01, 0.05).foreach { rsd =>
      val ours = df.agg(HllDistinct.fp(col("v"), rsd)).head.getLong(0)
      val builtin =
        df.agg(approx_count_distinct(col("v"), rsd)).head.getLong(0)
      assert(ours == builtin, s"rsd=$rsd")
    }
  }

  test("string column: equal to builtin") {
    import spark.implicits._
    val df = (0 until 30000).map(i => s"tok_${i % 5003}").toDF("v")
    val ours = df.agg(HllDistinct(col("v"), 0.01)).head.getLong(0)
    val builtin =
      df.agg(approx_count_distinct(col("v"), 0.01)).head.getLong(0)
    assert(ours == builtin)
  }

  test("grouped aggregation and empty group behavior match") {
    import spark.implicits._
    val df = (0 until 40000)
      .map(i => (i % 7, (i * 31L) % 2011)).toDF("g", "v")
    val ours = df.groupBy(col("g"))
      .agg(HllDistinct(col("v"), 0.02).as("nd")).orderBy(col("g"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val builtin = df.groupBy(col("g"))
      .agg(approx_count_distinct(col("v"), 0.02).as("nd")).orderBy(col("g"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(ours == builtin)
  }

  test("empty input returns 0 like the builtin") {
    import spark.implicits._
    val df = Seq.empty[Long].toDF("v")
    assert(df.agg(HllDistinct(col("v"), 0.01)).head.getLong(0) == 0L)
    assert(df.agg(approx_count_distinct(col("v"), 0.01)).head.getLong(0)
      == 0L)
  }

  test("all-null input returns 0 like the builtin") {
    import spark.implicits._
    val df = Seq[java.lang.Long](null, null, null).toDF("v")
    val ours = df.agg(HllDistinct(col("v"), 0.01)).head.getLong(0)
    val builtin =
      df.agg(approx_count_distinct(col("v"), 0.01)).head.getLong(0)
    assert(ours == builtin && ours == 0L)
  }
}
