package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Universe-sampling properties beyond the oracle: determinism and the
  * cross-table coherence that makes hash sampling the right tool for
  * pipeline cuts (sampling each table independently on the SAME key
  * commutes with joining them — RNG sampling does not).
  */
class SamplingSpec extends SparkSpec {

  test("sampling on a shared key commutes with the join") {
    val keep = (k: org.apache.spark.sql.Column) =>
      Sampling.universeFilter(k.cast("string"), 4) // 4/16 of orderkeys
    val l = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))

    // sample-then-join: each table cut independently, same key
    val sampledJoin = l.filter(keep(col("l_orderkey")))
      .join(o.filter(keep(col("o_orderkey"))),
        col("l_orderkey") === col("o_orderkey"))
    // join-then-sample
    val joinSampled = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(keep(col("l_orderkey")))

    val a = sampledJoin.orderBy("l_orderkey", "l_quantity").collect()
    val b = joinSampled.orderBy("l_orderkey", "l_quantity").collect()
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("train/val/test split partitions the corpus: disjoint, " +
      "exhaustive, rerun-stable, rates near 14:1:1") {
    val assigns = Sampling.splitAssign(spark, sf).collect()
    val total = Tables.load(spark, sf, "documents").count()
    assert(assigns.length == total, "every document gets exactly one split")
    assert(assigns.map(_.getAs[Long]("doc_id")).distinct.length == total)
    val bySplit = assigns.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.length.toLong).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.values.sum == total)
    assert(math.abs(bySplit("train").toDouble / total - 14.0 / 16) < 0.1)
    // membership is a pure function of the key: rerun yields the
    // identical assignment (not just identical counts)
    val again = Sampling.splitAssign(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assigns.foreach { r =>
      assert(again(r.getAs[Long]("doc_id")) == r.getAs[String]("split"))
    }
    // the audit aggregates the same assignment
    val audit = Sampling.splitAudit(spark, sf).collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    assert(audit == bySplit)
  }

  test("leakage-safe split: clusters are split-pure; the naive split " +
      "would straddle the planted near-dup chain") {
    import spark.implicits._
    // planted cluster {1,3} picked so the NAIVE doc-id split separates
    // its members: md5("1") starts 'c' (train), md5("3") starts 'e'
    // (val) — the exact contamination the cluster-keyed split prevents
    val docs = Seq(1L, 3L, 7L, 20L).toDF("doc_id")
    val clusters = Seq((1L, 1L), (3L, 1L)).toDF("doc_id", "cluster")
    val safe = Sampling.leakageSafeSplitFrom(docs, clusters).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("rep"), r.getAs[String]("split"))).toMap
    // cluster members share the REP's split…
    assert(safe(1L) == safe(3L), s"cluster must be split-pure: $safe")
    assert(safe(1L)._1 == 1L)
    // …and the naive per-doc split would have separated them
    val naive = Sampling.splitAssign(spark, sf)
    val naiveSplit = (id: Long) =>
      spark.sql(s"SELECT CASE WHEN substr(md5('$id'),1,1) < 'e' THEN 'train' " +
        s"WHEN substr(md5('$id'),1,1) = 'e' THEN 'val' ELSE 'test' END")
        .head.getString(0)
    assert(naiveSplit(1L) != naiveSplit(3L),
      "planted ids must straddle under the naive split for this test to bite")
    // singletons (no cluster row) represent themselves
    assert(safe(7L)._1 == 7L && safe(20L)._1 == 20L)
    assert(safe(7L)._2 == naiveSplit(7L))
    // corpus-level: every real near-dup cluster is split-pure
    val corpus = Sampling.leakageSafeSplit(spark, sf)
    val impure = corpus.groupBy(col("rep"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1).count()
    assert(impure == 0, s"$impure clusters straddle a split boundary")
    assert(naive.count() == corpus.count())
  }

  test("split contamination: accounts for every near-dup pair; " +
      "cluster-keyed split has zero cross-split pairs by construction") {
    val rows = Sampling.splitContamination(spark, sf).collect()
    val total = Dedup.ngramJaccardPairs(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == total,
      "every pair lands in exactly one (split_a, split_b) cell")
    rows.foreach { r =>
      assert(r.getAs[String]("split_a") <= r.getAs[String]("split_b"),
        s"pair cell not canonicalized: $r")
      assert(Set("train", "val", "test")(r.getAs[String]("split_a")))
    }
    // the safe split's version of the same measurement is all-diagonal:
    // join pairs against the CLUSTER-keyed assignment instead
    val safe = Sampling.leakageSafeSplit(spark, sf)
      .select(col("doc_id"), col("split"))
    val pairs = Dedup.ngramJaccardPairs(spark, sf)
      .select(col("id_a"), col("id_b"))
    val cross = pairs
      .join(safe.toDF("doc_id", "s_a"), col("id_a") === col("doc_id"))
      .drop("doc_id")
      .join(safe.toDF("doc_id", "s_b"), col("id_b") === col("doc_id"))
      .filter(col("s_a") =!= col("s_b")).count()
    assert(cross == 0,
      s"$cross near-dup pairs straddle a split under the SAFE assignment")
  }

  test("weighted sample: exactly k, rerun-identical, and selection " +
      "skews toward heavy documents") {
    val got = Sampling.weightedSample(spark, sf).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_chars")))
    assert(got.length == Sampling.WeightedK)
    assert(got.map(_._1).toSeq == (1 to Sampling.WeightedK))
    val again = Sampling.weightedSample(spark, sf).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_chars")))
    assert(got.sameElements(again), "pure function of the corpus")
    // inclusion probability ∝ n_chars: the sampled mean must exceed
    // the corpus mean (a size-biased sample overweights heavy docs)
    val corpusMean = Tables.load(spark, sf, "documents")
      .agg(avg(col("n_chars"))).head.getDouble(0)
    val sampleMean = got.map(_._3).sum.toDouble / got.length
    assert(sampleMean > corpusMean,
      s"size-biased sample mean $sampleMean <= corpus mean $corpusMean")
  }

  test("weighted quota: exactly k per language, plan is " +
      "top-k-per-group (WindowGroupLimit), no global sort") {
    val df = Sampling.weightedQuota(spark, sf)
    val got = df.collect()
    val perLang = got.groupBy(_.getAs[String]("lang"))
    perLang.foreach { case (lang, rows) =>
      assert(rows.length <= Sampling.WeightedGroupK)
      assert(rows.map(_.getAs[Int]("rank")).sorted
        .sameElements(1 to rows.length), s"dense ranks per $lang")
    }
    val plan = df.queryExecution.executedPlan
    df.count()
    assert(outerPlanNodes(df.queryExecution.executedPlan)
      .exists(_.getClass.getSimpleName.contains("WindowGroupLimit")),
      s"expected the partial top-k-per-group shape:\n$plan")
  }

  test("universe filter is deterministic and rate-monotone") {
    val keys = Tables.load(spark, sf, "orders").select(col("o_orderkey"))
    def n(sixteenths: Int): Long = keys
      .filter(Sampling.universeFilter(col("o_orderkey").cast("string"),
        sixteenths)).count()
    val counts = Seq(1, 4, 8, 12).map(n)
    assert(counts == counts.sorted, s"rates must be monotone: $counts")
    assert(n(4) == n(4)) // rerun-stable
    val total = keys.count()
    // 4/16 nominal rate lands near 25%
    assert(math.abs(n(4).toDouble / total - 0.25) < 0.05)
    intercept[IllegalArgumentException](Sampling.universeFilter(lit("x"), 16))
  }
}
