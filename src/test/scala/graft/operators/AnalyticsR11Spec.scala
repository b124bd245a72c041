package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-data specs for the round-11 analytics additions: CUSUM
  * changepoint localization, weekday seasonality, BFS k-hop, mutual
  * information, erasure audit, type-token ratio, and the closed-form
  * 2×2 eigensolve — each driven through its algebra seam on inputs
  * with a known exact answer (the shapes the hash oracle only covers
  * statistically).
  */
class AnalyticsR11Spec extends SparkSpec {
  import spark.implicits._

  // ---- CUSUM ----

  test("cusum localizes a planted step change at the step boundary") {
    // 10 days at 100 cents, then 10 days at 500: the cumulative
    // deviation |K·S_k − k·T| peaks exactly at the last low day.
    val daily = (1 to 20).map { d =>
      ("a", Date.valueOf(f"2024-01-$d%02d"), if (d <= 10) 100L else 500L)
    }.toDF("event_type", "day", "c")
    val out = Temporal.cusumFor(daily).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Date]("change_day").toString == "2024-01-10")
    assert(r.getAs[Int]("direction") == -1) // low-then-high ⇒ S under mean
    assert(r.getAs[Long]("n_days") == 20L)
    // exact stat: K=20, T=6000, S_10=1000 ⇒ |20·1000−10·6000|/(20·6000)
    assert(math.abs(r.getAs[Double]("cusum_stat") - 40000.0 / 120000.0)
      < 1e-9)
  }

  test("cusum on a constant series reports stat 0 (no change)") {
    val daily = (1 to 7).map(d =>
      ("b", Date.valueOf(f"2024-02-$d%02d"), 250L))
      .toDF("event_type", "day", "c")
    val r = Temporal.cusumFor(daily).collect().head
    assert(r.getAs[Double]("cusum_stat") == 0.0)
    assert(r.getAs[Int]("direction") == 0)
    // tie rule: all |D_k| equal (all zero) ⇒ earliest day wins
    assert(r.getAs[Date]("change_day").toString == "2024-02-01")
  }

  // ---- seasonality ----

  test("seasonality indexes a planted weekend spike exactly") {
    // two full ISO weeks starting Monday 2024-01-01: weekdays 100,
    // weekends 400 ⇒ overall mean (10·100+4·400)/14 = 2600/14 cents.
    val daily = (0 until 14).map { i =>
      val dow = i % 7 // 0 = Monday
      val c = if (dow >= 5) 400L else 100L
      ("t", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        c)
    }.toDF("event_type", "day", "c")
    val out = Temporal.seasonalityFor(daily).collect()
      .map(r => r.getAs[Int]("dow") ->
        (r.getAs[Long]("n_days"), r.getAs[Double]("season_index"))).toMap
    assert(out.keySet == (1 to 7).toSet)
    assert(out(1)._1 == 2L) // two Mondays
    // index: (100)/(2600/14) = 1400/2600; (400)/(2600/14) = 5600/2600
    assert(math.abs(out(1)._2 - 1400.0 / 2600.0) < 1e-9)
    assert(math.abs(out(6)._2 - 5600.0 / 2600.0) < 1e-9)
    // mass balance: Σ dow n_d·idx_d = N ⇒ weighted mean index is 1
    val wsum = out.values.map { case (n, idx) => n * idx }.sum
    assert(math.abs(wsum / 14.0 - 1.0) < 1e-9)
  }

  // ---- k-hop BFS ----

  test("khop walks a planted chain with exact hop counts and stops " +
    "at the iteration bound") {
    // directed both ways: chain 1-2-3-...-9; seed = min node = 1.
    val chain = (1L to 8L).flatMap(n => Seq((n, n + 1), (n + 1, n)))
      .toDF("u", "v")
    val out = Graph.khopFor(chain).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // KhopIters = 6: nodes 1..7 reachable (hops 0..6), 8,9 beyond
    assert(out == (1L to 7L).map(n => n -> (n - 1).toInt).toMap)
  }

  test("khop leaves a disconnected component unreached") {
    val twoIslands = Seq((1L, 2L), (2L, 1L), (10L, 11L), (11L, 10L))
      .toDF("u", "v")
    val out = Graph.khopFor(twoIslands).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 0, 2L -> 1))
  }

  // ---- autocorrelation ----

  test("autocorr: alternating series is exactly −1 at odd lags, " +
    "a linear ramp exactly +1") {
    val alt = (1 to 15).map(d => ("alt",
      Date.valueOf(java.time.LocalDate.of(2024, 3, 1).plusDays(d)),
      if (d % 2 == 1) 100L else 200L))
    val ramp = (1 to 15).map(d => ("ramp",
      Date.valueOf(java.time.LocalDate.of(2024, 3, 1).plusDays(d)),
      d * 10L))
    val out = Temporal.autocorrFor((alt ++ ramp)
        .toDF("event_type", "day", "c")).collect()
      .map(r => (r.getString(0), r.getAs[Int]("lag")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("acf"))).toMap
    // lag 1 and lag 7 are both odd ⇒ perfect anti-correlation
    assert(out(("alt", 1)) == ((14L, -1.0)))
    assert(out(("alt", 7)) == ((8L, -1.0)))
    // y = x + const ⇒ perfect correlation at any lag
    assert(out(("ramp", 1)) == ((14L, 1.0)))
    assert(out(("ramp", 7)) == ((8L, 1.0)))
  }

  test("autocorr drops pairs across a calendar gap instead of " +
    "shifting the series") {
    // days 1..5 and 10..14: lag 1 must pair only within each run
    val daily = (Seq(1, 2, 3, 4, 5) ++ Seq(10, 11, 12, 13, 14))
      .map(d => ("g",
        Date.valueOf(java.time.LocalDate.of(2024, 4, 1).plusDays(d)),
        d * 100L)).toDF("event_type", "day", "c")
    val n = Temporal.autocorrFor(daily).collect()
      .map(r => r.getAs[Int]("lag") -> r.getAs[Long]("n_pairs")).toMap
    assert(n(1) == 8L) // 4 in-run pairs per run, none across the gap
    // lag 7: only cross-run alignments land exactly 7 days apart
    assert(n.getOrElse(7, 0L) == 3L) // 10←3, 11←4, 12←5
  }

  // ---- link-prediction features + assortativity ----

  test("common neighbors and Jaccard match a brute-force recompute " +
    "of the same trade graph") {
    val edges = Graph.tradeEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val edgeSet = edges.toSet
    val expected = (for {
      u <- nbrs.keys; v <- nbrs.keys if u < v
      common = (nbrs(u) & nbrs(v)).size if common > 0
    } yield (u, v) -> (common, nbrs(u).size, nbrs(v).size,
      edgeSet.contains((u, v)))).toMap
    val got = Graph.graphCommonNeighbors(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("common"), r.getAs[Long]("deg_u"),
          r.getAs[Long]("deg_v"), r.getAs[Double]("jaccard"),
          r.getAs[Boolean]("is_edge"))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, (c, du, dv, j, isE)) =>
      val (ec, edu, edv, eIsE) = expected(k)
      assert(c == ec && du == edu && dv == edv && isE == eIsE, k.toString)
      assert(math.abs(j - ec.toDouble / (edu + edv - ec)) < 1e-6)
    }
  }

  test("assortativity matches a brute-force Pearson over endpoint " +
    "degrees") {
    val edges = Graph.tradeEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ends = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = ends.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val xy = ends.map { case (u, v) => (deg(u).toDouble, deg(v).toDouble) }
    val n = xy.length
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val syy = xy.map(p => p._2 * p._2).sum
    val expect = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    val r = Graph.graphAssortativity(spark, sf).collect().head
    assert(r.getAs[Long]("n_ends") == n.toLong)
    assert(math.abs(r.getAs[Double]("assortativity") - expect) < 1e-6)
    // symmetric edge list ⇒ the coefficient is exchange-symmetric
    assert(math.abs(r.getAs[Double]("assortativity")) <= 1.0 + 1e-9)
  }

  // ---- mutual information ----

  test("mutual information of an independent planted table is 0 " +
    "in every cell") {
    // perfectly independent: every (x, y) combination equally often
    val pairs = (for {
      x <- Seq("a", "b"); y <- Seq("u", "v", "w"); _ <- 1 to 5
    } yield (x, y)).toDF("x", "y")
    val out = Profile.mutualInfoFor(pairs).collect()
    assert(out.length == 6)
    out.foreach { r =>
      assert(r.getAs[Double]("pmi_bits") == 0.0, r.toString)
      assert(r.getAs[Double]("mi_contrib_bits") == 0.0, r.toString)
    }
  }

  test("mutual information of a deterministic mapping is H(X)") {
    // y = f(x), two equiprobable values ⇒ MI = 1 bit
    val pairs = (Seq.fill(8)(("a", "u")) ++ Seq.fill(8)(("b", "v")))
      .toDF("x", "y")
    val out = Profile.mutualInfoFor(pairs).collect()
    val mi = out.map(_.getAs[Double]("mi_contrib_bits")).sum
    assert(math.abs(mi - 1.0) < 1e-6, s"MI $mi")
    out.foreach(r => assert(r.getAs[Double]("pmi_bits") == 1.0))
  }

  test("corpus MI is non-negative and bounded by both marginal " +
    "entropies") {
    val out = Profile.mutualInfo(spark, sf).collect()
    val mi = out.map(_.getAs[Double]("mi_contrib_bits")).sum
    assert(mi >= -1e-9, s"MI $mi")
    // H(X) over langs from the same cells
    def entropy(key: String): Double = {
      val m = out.groupBy(_.getAs[String](key)).view
        .mapValues(_.map(_.getAs[Long]("n_xy")).sum).toMap
      val n = m.values.sum.toDouble
      -m.values.map(c => c / n * math.log(c / n) / math.log(2.0)).sum
    }
    assert(mi <= entropy("x") + 1e-6)
    assert(mi <= entropy("y") + 1e-6)
  }

  // ---- erasure audit ----

  test("erasure audit counts are complete and consistent with a " +
    "direct recompute") {
    import graft.Tables.load
    val out = Privacy.erasureAudit(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("rows_erased"), r.getAs[Long]("rows_kept"))).toMap
    assert(out.keySet == Set("customer", "orders", "lineitem"))
    // erased + kept == full table count, per table
    for ((t, (e, k)) <- out)
      assert(e + k == load(spark, sf, t).count(), t)
    // someone is actually erased at this sf (the audit isn't vacuous)
    assert(out("customer")._1 > 0)
    // lineitem cascade == direct join recompute through orders
    val direct = load(spark, sf, "lineitem")
      .join(load(spark, sf, "orders").filter(col("o_custkey") % 97 === 0),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .count()
    assert(out("lineitem")._1 == direct)
  }

  // ---- type-token ratio ----

  test("ttr matches a direct distinct/total recompute and Herdan C " +
    "is consistent") {
    import graft.Tables.load
    val out = TextAnalysis.typeTokenRatio(spark, sf).collect()
    assert(out.nonEmpty)
    val toks = load(spark, sf, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
    val totals = toks.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val types = toks.distinct().groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val src = r.getString(0)
      val (n, v) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"))
      assert(n == totals(src) && v == types(src), src)
      assert(math.abs(r.getAs[Double]("ttr") - v.toDouble / n) < 1e-9)
      val c = r.getAs[Double]("herdan_c")
      assert(c > 0 && c <= 1.0, s"$src C=$c")
      assert(math.abs(c - math.log(v.toDouble) / math.log(n.toDouble))
        < 1e-9)
    }
  }

  // ---- closed-form 2×2 eigensolve ----

  test("variance2d matches breeze eigSym on the same covariance " +
    "matrix and preserves trace/det") {
    import breeze.linalg.{eigSym, DenseMatrix}
    val r = Pca.variance2d(spark, sf).collect().head
    val (cxx, cxy, cyy) = (r.getAs[Double]("cov_xx"),
      r.getAs[Double]("cov_xy"), r.getAs[Double]("cov_yy"))
    val (l1, l2) = (r.getAs[Double]("lambda1"), r.getAs[Double]("lambda2"))
    assert(l1 >= l2)
    assert(math.abs(l1 + l2 - (cxx + cyy)) < 1e-6) // trace preserved
    assert(math.abs(l1 * l2 - (cxx * cyy - cxy * cxy)) < 1e-6)
    val ev = eigSym(DenseMatrix((cxx, cxy), (cxy, cyy))).eigenvalues
    assert(math.abs(ev(1) - l1) < 1e-6 && math.abs(ev(0) - l2) < 1e-6)
    val ratio = r.getAs[Double]("explained_ratio")
    assert(ratio >= 0.5 - 1e-9 && ratio <= 1.0 + 1e-9)
  }
}
