package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Independent-reimplementation specs for the round-12 statistics
  * additions: Benford first-digit conformance, per-nation Gini, and
  * bigram collocation lift — each recomputed from the raw corpus
  * with straight-line driver Scala and compared for exact equality
  * (the planted-boundary cases live in BehaviorSpec / GraphSpec).
  */
class AnalyticsR12Spec extends SparkSpec {

  test("benford digits replay against a driver recount; shares sum " +
    "to ~1 and expectations are the pinned literals") {
    val totals = graft.Tables.load(spark, sf, "orders")
      .select(col("o_totalprice")).collect().map(_.getDouble(0))
    val counts = totals
      .map(v => math.round(v * 100).toString.head.asDigit)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = totals.length.toDouble
    val out = DataQuality.benford(spark, sf).collect()
    assert(out.map(_.getInt(0)).toSeq == (1 to 9).filter(counts.contains))
    out.foreach { r =>
      val d = r.getInt(0)
      assert(r.getLong(1) == counts(d), s"digit $d count")
      assert(r.getDouble(2) ==
        BigDecimal(counts(d) / n).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble, s"digit $d share")
      assert(r.getDouble(3) == DataQuality.BenfordExpected(d - 1))
    }
    assert(math.abs(out.map(_.getDouble(2)).sum - 1.0) < 1e-4)
  }

  test("per-nation gini replays the closed form off a driver sort; " +
    "known extremes hold") {
    val spendByCust = graft.Tables.load(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long"))
        .as("cents"))
      .join(graft.Tables.load(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long"), col("cents"),
        col("o_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = spendByCust.groupBy(_._1).map { case (nat, xs) =>
      val sorted = xs.sortBy(x => (x._2, x._3)).map(_._2)
      val nc = sorted.length.toLong
      val sx = sorted.map(BigInt(_)).sum
      val srx = sorted.zipWithIndex
        .map { case (x, i) => BigInt(x) * (i + 1) }.sum
      val g = (BigDecimal(2 * srx - (nc + 1) * sx)
        / BigDecimal(nc * sx)).toDouble
      nat -> ((nc, BigDecimal(g).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = Profile.giniSpend(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    expected.foreach { case (nat, (nc, g)) =>
      assert(got(nat)._1 == nc, s"nation $nat customer count")
      // the operator divides once in IEEE then rounds; the BigDecimal
      // path can differ in the last ulp exactly at a rounding
      // boundary, so compare at the rounded grain
      assert(math.abs(got(nat)._2 - g) <= 1e-6, s"nation $nat gini")
      assert(got(nat)._2 >= 0.0 && got(nat)._2 < 1.0)
    }
  }

  test("item-item CF replays a driver cosine recount; neighbors are " +
    "symmetric pairs") {
    val items = graft.Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = items.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val co = scala.collection.mutable.Map.empty[(Long, Long), Long]
    items.groupBy(_._1).values.foreach { basket =>
      val parts = basket.map(_._2).sorted
      for (a <- parts.indices; b <- a + 1 until parts.length)
        co((parts(a), parts(b))) = co.getOrElse((parts(a), parts(b)), 0L) + 1
    }
    val expected = co.toSeq.filter(_._2 >= Basket.MinSupport)
      .flatMap { case ((a, b), c) => Seq((a, b, c), (b, a, c)) }
      .map { case (i, j, c) =>
        val cos = BigDecimal(c.toDouble / math.sqrt((n(i) * n(j)).toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (i, j, c, cos)
      }
      .groupBy(_._1).flatMap { case (_, xs) =>
        xs.sortBy(x => (-x._4, x._2)).take(Basket.CfK).zipWithIndex
          .map { case ((i, j, c, cos), r) => (i, j, r + 1, c, cos) }
      }.toSet
    val got = Basket.itemCf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getDouble(4))).toSet
    // the driver's HALF_UP on a BigDecimal of the IEEE double can
    // differ in the 6th decimal exactly at a rounding boundary;
    // compare the full tuples with cosine at 1e-6 tolerance
    assert(got.size == expected.size)
    val gotByKey = got.map(t => (t._1, t._2) -> t).toMap
    expected.foreach { case (i, j, r, c, cos) =>
      val g = gotByKey((i, j))
      assert(g._3 == r && g._4 == c, s"($i,$j) rank/count")
      assert(math.abs(g._5 - cos) <= 1e-6, s"($i,$j) cosine")
    }
  }

  test("bigram lift replays against driver counts on the corpus " +
    "top-50") {
    val texts = graft.Tables.load(spark, sf, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val bi = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach { t =>
      val toks = t.split(" ", -1)
      toks.foreach(w => uni(w) = uni.getOrElse(w, 0L) + 1)
      toks.sliding(2).filter(_.length == 2).foreach { p =>
        val k = p.mkString(" ")
        bi(k) = bi.getOrElse(k, 0L) + 1
      }
    }
    val nUni = BigInt(uni.values.sum)
    val nBi = BigInt(bi.values.sum)
    val top = bi.filter(_._2 >= TextAnalysis.LiftMinCount).toSeq
      .sortBy { case (b, n) => (-n, b) }.take(50)
    val got = TextAnalysis.bigramLift(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got.size == top.size)
    top.foreach { case (bg, n) =>
      val Array(x, y) = bg.split(" ", 2)
      val (gn, gx, gy, lift) = got(bg)
      assert(gn == n && gx == uni(x) && gy == uni(y), bg)
      val exact = (BigDecimal(BigInt(n) * nUni * nUni)
        / BigDecimal(nBi * BigInt(uni(x)) * BigInt(uni(y)))).toDouble
      assert(math.abs(lift - exact) <= 1e-6, s"$bg lift $lift vs $exact")
    }
  }
}
