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

  test("scale profile: no Expand in the plan, exact columns equal the " +
      "oracle-grade profile, approx nd within sketch error of exact") {
    val scaled = Profile.profileNumericScale(spark, sf)
    // the whole point of the sketch form: the multi-distinct x5 row
    // replication is gone
    scaled.count()
    assert(!scaled.queryExecution.executedPlan.toString.contains("Expand"),
      "scale profile must not plan a multi-distinct Expand")
    val exact = Profile.profileNumeric(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    scaled.collect().foreach { r =>
      val e = exact(r.getAs[String]("col_name"))
      assert(r.getAs[Long]("n") == e.getAs[Long]("n"))
      assert(r.getAs[Double]("min_val") == e.getAs[Double]("min_val"))
      assert(r.getAs[Double]("max_val") == e.getAs[Double]("max_val"))
      assert(r.getAs[Double]("mean") == e.getAs[Double]("mean"))
      assert(r.getAs[Double]("stddev") == e.getAs[Double]("stddev"))
      val nd = e.getAs[Long]("n_distinct").toDouble
      val approx = r.getAs[Long]("n_distinct_approx").toDouble
      // rsd 0.01 => 5 sigma of slack; HLL++ at these cardinalities is
      // far tighter in practice
      assert(math.abs(approx - nd) <= math.max(5.0, 0.05 * nd),
        s"approx nd $approx too far from exact $nd for $r")
    }
  }

  test("scale cert: every column's nd_within_tol is earned (printed " +
      "margin), exact stats equal the exact profile's") {
    val sf = "/root/testdata/sf0.01"
    val cert = Profile.profileScaleCert(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val exact = Profile.profileNumeric(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(cert.keySet == exact.keySet && cert.nonEmpty)
    cert.foreach { case (c, r) =>
      assert(r.getAs[Boolean]("nd_within_tol"), s"$c sketch out of tol")
      val e = exact(c)
      Seq("n", "n_distinct").foreach(f =>
        assert(r.getAs[Long](f) == e.getAs[Long](f), s"$c.$f"))
      Seq("mean", "stddev").foreach(f =>
        assert(r.getAs[Double](f) == e.getAs[Double](f), s"$c.$f"))
      info(f"$c nd=${r.getAs[Long]("n_distinct")}")
    }
  }
}
