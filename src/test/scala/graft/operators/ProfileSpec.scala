package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The exact-integer-sum profile must agree with straightforward
  * double statistics to FP tolerance, and its per-column invariants
  * must hold.
  */
class ProfileSpec extends SparkSpec {

  test("profile: mean/stddev match naive double stats; counts and " +
      "bounds are consistent") {
    val rows = Profile.profileNumeric(spark, sf).collect()
    assert(rows.map(_.getAs[String]("col_name")).sorted.sameElements(
      Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")))
    val li = Tables.load(spark, sf, "lineitem").cache()
    val n = li.count()
    rows.foreach { r =>
      val c = r.getAs[String]("col_name")
      assert(r.getAs[Long]("n") == n)
      val nd = r.getAs[Long]("n_distinct")
      assert(nd > 0 && nd <= n)
      assert(r.getAs[Double]("min_val") <= r.getAs[Double]("max_val"))
      // the exact-sum mean/stddev vs Spark's built-in double folds:
      // same quantity to FP accumulation tolerance
      val naive = li.agg(avg(col(c)).as("m"), stddev_samp(col(c)).as("sd"))
        .head
      assert(math.abs(r.getAs[Double]("mean") - naive.getAs[Double]("m"))
        < 1e-6, s"$c mean drifted: $r vs $naive")
      assert(math.abs(r.getAs[Double]("stddev") - naive.getAs[Double]("sd"))
        < 1e-6, s"$c stddev drifted: $r vs $naive")
    }
    li.unpersist()
  }
}
