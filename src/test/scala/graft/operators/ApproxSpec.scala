package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Accuracy contracts for the sketch pack (no SQL oracle — sketch
  * internals are engine-specific): estimates vs exact answers, plus
  * determinism (sketches must merge order-independently).
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("HLL distinct estimates land within 10% of exact (rsd 5%)") {
    val est = Approx.hllDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("o"),
        countDistinct(col("l_suppkey")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, (o, s)) =>
      assert(math.abs(est(k)._1 - o).toDouble / o <= 0.10, s"$k orders")
      assert(math.abs(est(k)._2 - s).toDouble / s <= 0.10, s"$k suppliers")
    }
  }

  test("approx medians track exact percentiles; both sketches deterministic") {
    val approx = Approx.approxQuantiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.5)").as("pp"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    approx.foreach { case (k, (q, p)) =>
      assert(math.abs(q - exact(k)._1) <= 1.0, s"$k quantity median")
      assert(math.abs(p - exact(k)._2) / exact(k)._2 <= 0.01, s"$k price")
    }
    // determinism under re-execution (different task schedules)
    assert(Approx.hllDistinct(spark, sf).collect().toSeq ==
      Approx.hllDistinct(spark, sf).collect().toSeq)
    assert(Approx.approxQuantiles(spark, sf).collect().toSeq ==
      Approx.approxQuantiles(spark, sf).collect().toSeq)
  }

  test("heavy hitters: sketch top-20 equals exact top-20 at this vocabulary") {
    val sketch = Approx.heavyHitters(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(20).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // budget (65536) >> vocabulary, so the sketch must be exact here
    assert(sketch == exact)
    // determinism under re-execution
    assert(Approx.heavyHitters(spark, sf).collect().toSeq ==
      Approx.heavyHitters(spark, sf).collect().toSeq)
  }

  test("md5-sample estimators: sample medians track the exact medians; " +
      "sampled heavy-hitter head overlaps the exact head") {
    val est = Approx.quantilesMd5(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val exact = Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(cast(round(l_quantity*100,0) as bigint), 0.5)")
          .as("q"),
        expr("percentile(cast(round(l_extendedprice*100,0) as bigint), 0.5)")
          .as("p"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    est.foreach { case (k, (q, p)) =>
      // a ~12.5% uniform sample's median lands near the population
      // median (binomial concentration) — generous tolerances keep
      // the pin honest without flaking on the small sf
      assert(math.abs(q - exact(k)._1) / exact(k)._1 <= 0.15,
        s"$k qty: sample $q vs exact ${exact(k)._1}")
      assert(math.abs(p - exact(k)._2) / exact(k)._2 <= 0.15,
        s"$k price: sample $p vs exact ${exact(k)._2}")
    }
    val sampledTop = Approx.heavyHittersMd5(spark, sf).collect()
      .map(_.getString(0)).toSet
    val exactTop = Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(20).collect()
      .map(_.getString(0)).toSet
    assert((sampledTop & exactTop).size >= 12,
      s"sampled head shares only ${(sampledTop & exactTop).size}/20 " +
        "tokens with the exact head")
  }

  test("bloom filter: no false negatives, bounded false positives") {
    val keys = Tables.load(spark, sf, "orders").select(col("o_custkey"))
    val bloom = keys.stat.bloomFilter("o_custkey", 2000, 0.03)
    val present = keys.distinct().collect().map(_.getLong(0))
    assert(present.forall(bloom.mightContain), "false negative!")
    val absent = (1000000L until 1010000L).count(bloom.mightContain)
    assert(absent <= 10000 * 0.06, s"fpp too high: $absent/10000")
  }

  test("CMS frequency audit: never undercounts, overcount within the " +
      "ε·N envelope, shard-merge counter-exact vs the one-pass sketch") {
    val rows = Approx.cmsFreqAudit(spark, sf).collect()
    assert(rows.length == 20)
    val n = Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0).count()
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact")
      val direct = r.getAs[Long]("est_direct")
      val merged = r.getAs[Long]("est_merged")
      // CMS one-sided error: counters only ever over-count
      assert(direct >= exact, s"CMS undercounted: $r")
      // ε = 0.001, 2× slack for the per-query δ across 20 probes
      assert(direct <= exact + (2 * 0.001 * n).toLong + 1,
        s"overcount above the ε·N envelope (N=$n): $r")
      // merge under shared (depth,width,seed) adds counters exactly
      assert(merged == direct, s"shard-merge drifted from one-pass: $r")
    }
    // top-20 is exact and descending
    val counts = rows.map(_.getAs[Long]("n_exact"))
    assert(counts.sameElements(counts.sortBy(-_)))
  }

  test("HLL merge audit: per-shard sketches union to the one-pass " +
      "answer; both inside the sketch's error envelope of exact") {
    val r = Approx.hllMergeAudit(spark, sf).collect().head
    val exact = r.getAs[Long]("exact_distinct").toDouble
    val direct = r.getAs[Long]("est_direct").toDouble
    val merged = r.getAs[Long]("est_merged").toDouble
    assert(r.getAs[Long]("n_shards") > 1, "needs real shards to merge")
    // the mergeability contract: a union of independently built
    // shard sketches (same lgk) estimates what one pass estimates
    assert(merged == direct,
      s"union-merged $merged != one-pass $direct")
    assert(math.abs(direct - exact) / exact < 0.05,
      s"estimate $direct vs exact $exact")
  }

  // --- KMV pairwise Jaccard (approx_jaccard_kmv) ----------------------

  private def md5Domain(e: org.apache.spark.sql.Column) =
    conv(substring(md5(e), 1, 13), 16, 10).cast("long")

  test("KMV Jaccard exact branch: union below k reproduces exact " +
      "Jaccard and exact union size") {
    // A = 0..29, B = 20..49 → |A∩B| = 10, |A∪B| = 50, J = 0.2
    val sigs = ((0 until 30).map(i => ("A", s"elem$i")) ++
      (20 until 50).map(i => ("B", s"elem$i")))
      .toDF("source", "s")
      .select(col("source"), md5Domain(col("s")).as("h"))
    val srcs = Seq("A", "B").toDF("source")
    val r = Approx.kmvJaccardFor(sigs, srcs, k = 64).collect().head
    assert(r.getLong(2) == 50L, s"k_used ${r.getLong(2)}")
    assert(r.getLong(3) == 10L, s"n_both ${r.getLong(3)}")
    assert(r.getDouble(4) == 0.2, s"jaccard_est ${r.getDouble(4)}")
    assert(r.getDouble(5) == 50.0, s"union_est ${r.getDouble(5)}")
  }

  test("KMV Jaccard sketch branch: within tolerance on a planted " +
      "500/250 overlap") {
    // A = 0..499, B = 250..749 → J = 1/3, union 750
    val sigs = ((0 until 500).map(i => ("A", s"item$i")) ++
      (250 until 750).map(i => ("B", s"item$i")))
      .toDF("source", "s")
      .select(col("source"), md5Domain(col("s")).as("h"))
    val srcs = Seq("A", "B").toDF("source")
    val r = Approx.kmvJaccardFor(sigs, srcs, k = 64).collect().head
    assert(r.getLong(2) == 64L)
    assert(math.abs(r.getDouble(4) - 1.0 / 3) < 0.15,
      s"jaccard_est ${r.getDouble(4)} too far from 1/3")
    assert(math.abs(r.getDouble(5) - 750.0) / 750.0 < 0.3,
      s"union_est ${r.getDouble(5)} too far from 750")
  }

  test("md5-domain HLL: estimates land within the m=256 error " +
      "envelope of exact, registers sum sanely") {
    val exact = graft.Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Approx.hllDistinctMd5(spark, sf).collect()
    assert(got.length == exact.size)
    got.foreach { r =>
      val (flag, regSum, est) =
        (r.getString(0), r.getLong(1), r.getDouble(2))
      // 256 registers: rsd = 1.04/sqrt(256) = 6.5%; allow 4 sigma
      assert(math.abs(est - exact(flag)) / exact(flag) < 0.26,
        s"$flag: est $est vs exact ${exact(flag)}")
      // every register term is in [2^7, 2^52]
      assert(regSum >= 256L * 128 && regSum <= (256L << 52),
        s"$flag regSum")
    }
  }

  test("md5-domain HLL merge: est_merged equals est_direct exactly " +
      "(register-wise max merge), both within envelope of exact") {
    val r = Approx.hllMergeMd5(spark, sf).collect().head
    val (exact, nShards, direct, merged) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    assert(nShards > 1, "need real shards for a merge audit")
    assert(direct == merged,
      s"register merge must be exact: $direct vs $merged")
    assert(math.abs(direct - exact) / exact < 0.26,
      s"est $direct vs exact $exact")
  }

  test("md5-domain CMS: never undercounts, overcount within eps*N " +
      "on the top-20 probes") {
    val rows = Approx.cmsFreqMd5(spark, sf).collect()
    assert(rows.length == 20)
    val nTokens = graft.Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0).count()
    // classic CMS bound with w = 8192: overcount <= e/w * N w.h.p.
    // per row; min over d=4 rows makes exceeding it vanishingly rare
    val bound = math.ceil(math.E / Approx.CmsWidth * nTokens).toLong
    rows.foreach { r =>
      val (tok, nExact, est) =
        (r.getString(0), r.getLong(1), r.getLong(2))
      assert(est >= nExact, s"CMS undercounted $tok: $est < $nExact")
      assert(est - nExact <= bound,
        s"$tok overcount ${est - nExact} > eps*N $bound")
    }
  }

  test("KMV Jaccard mergeability: per-source k-min sketches alone " +
      "reproduce the pairwise matrix (K(A∪B) ⊆ K(A) ∪ K(B))") {
    val sigs = ((0 until 300).map(i => ("A", s"x$i")) ++
      (150 until 450).map(i => ("B", s"x$i")) ++
      (0 until 200 by 2).map(i => ("C", s"x$i")))
      .toDF("source", "s")
      .select(col("source"), md5Domain(col("s")).as("h"))
    val srcs = Seq("A", "B", "C").toDF("source")
    val perSource = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("h"))
    val truncated = sigs.withColumn("rn", row_number().over(perSource))
      .filter(col("rn") <= 64).drop("rn")
    val full = Approx.kmvJaccardFor(sigs, srcs, k = 64).collect().toSeq
    val fromSketches = Approx.kmvJaccardFor(truncated, srcs, k = 64)
      .collect().toSeq
    assert(full == fromSketches,
      s"sketch-only result diverges:\n$full\nvs\n$fromSketches")
  }
}
