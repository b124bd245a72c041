package graft.operators

import graft.SparkSpec

/** OPQ (Ge et al., CVPR 2013): the properties that make a learned
  * rotation trustworthy — orthogonality (distance preservation, the
  * reason rotated-space ADC answers the original-space query), the
  * monotone distortion trace whose first entry is plain trained PQ
  * (the paper's guarantee, observable because every alternation step
  * is exact-arithmetic or optimal in closed form), and recall
  * measured next to the unrotated ADC forms.
  */
class OpqSpec extends SparkSpec {

  test("rotation is orthogonal: RᵀR = I to 1e-9, so rotated-space " +
      "distances equal original-space distances") {
    val m = Opq.model(spark, sf)
    val r = m.rot.map(_.toArray).toArray
    assert(r.length == Opq.Dim && r.forall(_.length == Opq.Dim))
    var worst = 0.0
    for (i <- 0 until Opq.Dim; j <- 0 until Opq.Dim) {
      val dot = (0 until Opq.Dim).map(k => r(k)(i) * r(k)(j)).sum
      val expect = if (i == j) 1.0 else 0.0
      worst = math.max(worst, math.abs(dot - expect))
    }
    info(f"max |RᵀR − I| = $worst%.2e")
    assert(worst < 1e-9, f"RᵀR deviates from I by $worst%.2e")
    // and it is a real rotation, not a leftover identity: training
    // moved at least some off-diagonal mass
    val offDiag = (0 until Opq.Dim)
      .flatMap(i => (0 until Opq.Dim).filter(_ != i).map(j => r(i)(j)))
      .map(math.abs).max
    assert(offDiag > 1e-6, "rotation never left the identity")
  }

  test("distortion trace: iteration 1 is plain trained PQ; later " +
      "iterations never increase the objective") {
    val m = Opq.model(spark, sf)
    assert(m.distortions.length == Opq.Iters)
    info(m.distortions.map(d => f"$d%.4f").mkString("trace: ", " → ", ""))
    // each alternation (Procrustes R-update, re-encode, warm-started
    // Lloyd's) is non-increasing; tolerance covers the float cast of
    // recentred sub-centroids and the 6-decimal d2 quantization
    m.distortions.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-3, f"distortion climbed: $a%.6f → $b%.6f")
    }
    assert(m.distortions.last <= m.distortions.head + 1e-3)
    // iteration 1 ran with R = I and the plain PQ seed rule — its
    // distortion equals the trained-PQ codebook's total over the
    // same corpus (Pq.train's summed per-code distortion)
    val pq = Pq.train(spark, sf).collect()
      .map(r => r.getAs[Double]("mean_d2") * r.getAs[Long]("n_assigned"))
      .sum
    assert(math.abs(m.distortions.head - pq) < 1e-2,
      f"iteration-1 distortion ${m.distortions.head}%.4f != trained PQ $pq%.4f")
  }

  test("codebook shape survives training; double-train is " +
      "deterministic (exact decimal Gram ⇒ stable SVD input)") {
    val m = Opq.model(spark, sf)
    assert(m.codebook.map(c => (c._1, c._2)).distinct.size ==
      m.codebook.size)
    m.codebook.foreach { case (sub, code, cv) =>
      assert(sub >= 0 && sub < Pq.M && code >= 0 && code < Pq.K)
      assert(cv.length == Pq.SubDim)
    }
    // retrain from scratch (memo dropped) — R must be bit-identical:
    // every distributed sum feeding the SVD is DECIMAL-exact and the
    // LAPACK solve is deterministic for identical input
    OperatorCaches.release(spark)
    val m2 = Opq.model(spark, sf)
    assert(m2.rot == m.rot, "retrained rotation differs")
    assert(m2.distortions == m.distortions, "retrained trace differs")
  }

  test("rotated-space ADC: contract shape and recall vs exact search " +
      "measured next to the unrotated ADC forms") {
    val rows = Opq.adcOpqTopK(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    byQ.values.foreach { g =>
      assert(g.map(_.getAs[Int]("rank")).sorted.toSeq ==
        (1 to Pq.TopK).toSeq)
      // ranks follow ascending ADC distance
      val sorted = g.sortBy(_.getAs[Int]("rank"))
        .map(_.getAs[Double]("adc_d2"))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    }
    val brute = Similarity.bruteTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    def recallOf(rs: Array[org.apache.spark.sql.Row]) = rs
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet match { case p => (brute & p).size.toDouble / brute.size }
    val opq = recallOf(rows)
    val pqSeed = recallOf(Pq.adcTopK(spark, sf).collect())
    val pqTrained = recallOf(Pq.adcTrainedTopK(spark, sf).collect())
    info(f"recall@${Pq.TopK}: OPQ $opq%.3f vs trained-PQ " +
      f"$pqTrained%.3f vs seed-PQ $pqSeed%.3f")
    // distortion, not recall, is OPQ's guaranteed axis — recall is
    // measured and pinned only against chance (≈ K/N) here and
    // tracked at bench scale by RecallReport
    assert(opq > 0.0, "OPQ recall at chance level")
  }

  test("refined OPQ: cosine order holds; recall dominates the " +
      "unrefined rotated-space ADC ranking") {
    val refined = Opq.adcOpqRefinedTopK(spark, sf).collect()
    refined.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq ==
        (1 to sorted.length))
      val cs = sorted.map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    val brute = Similarity.bruteTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    def recallOf(rs: Array[org.apache.spark.sql.Row]) = rs
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet match { case p => (brute & p).size.toDouble / brute.size }
    val r = recallOf(refined)
    val base = recallOf(Opq.adcOpqTopK(spark, sf).collect())
    info(f"refined OPQ recall@${Pq.TopK} = $r%.3f vs unrefined $base%.3f")
    // the unrefined top-k is a subset of the ShortR shortlist and the
    // re-rank is exact cosine — deterministic dominance
    assert(r >= base,
      f"refined OPQ recall $r%.3f below unrefined $base%.3f")
  }

  test("frozen OPQ model: shape and near-orthogonality of the " +
      "committed literals; frozen search tracks the live-trained one " +
      "on the training corpus") {
    // model shape: full 64x64 rotation, M*K codebook of SubDim slices
    assert(FrozenAnn.rot.length == Opq.Dim &&
      FrozenAnn.rot.forall(_.length == Opq.Dim))
    assert(FrozenAnn.codebook.length == Pq.M * Pq.K)
    assert(FrozenAnn.codebook.forall(_._3.length == Pq.SubDim))
    // the 7dp rounding keeps R orthonormal to ~1e-5 (64 terms x 1e-7):
    // max |R·Rᵀ − I| bounded, so rotated distances stay faithful
    val r = FrozenAnn.rot.map(_.toArray).toArray
    val n = Opq.Dim
    var worst = 0.0
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        var s = 0.0
        var k = 0
        while (k < n) { s += r(i)(k) * r(j)(k); k += 1 }
        val target = if (i == j) 1.0 else 0.0
        worst = math.max(worst, math.abs(s - target))
        j += 1
      }
      i += 1
    }
    assert(worst < 1e-4, f"frozen rotation drifted from orthonormal: " +
      f"max |RRᵀ-I| = $worst%.2e")
    // frozen-vs-live on the corpus the model was trained on (sf0.01):
    // the rotation differs only in the 7th decimal, so the two ADC
    // searches must agree on the vast majority of (query, neighbor)
    // pairs (near-ties at the 1e-6 ADC rounding may flip)
    val dir = "/root/testdata/sf0.01"
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(x => (x.getAs[Long]("query_id"), x.getAs[Long]("neighbor_id")))
      .toSet
    val live = pairs(Opq.adcOpqTopK(spark, dir))
    val frozen = pairs(Opq.adcOpqFrozenTopK(spark, dir))
    val overlap = (live & frozen).size.toDouble / live.size
    info(f"frozen-vs-live OPQ overlap = $overlap%.3f")
    assert(overlap >= 0.8,
      f"frozen OPQ diverged from its own training run: $overlap%.3f")
  }

  test("frozen IVF-OPQ: the pruned refined search loses no recall vs " +
      "the exhaustive frozen OPQ scan (plain OR refined) it replaces " +
      "on the training corpus") {
    // the scale argument for replacing the Q×N frozen OPQ scan
    // (SCALE_r13: ×30.7 at 10×) with the pruned composition is only
    // honest if the replacement does not cost recall on the corpus
    // the model was trained for — pin exactly that. The production
    // serving shape is the REFINED search (compressed shortlist →
    // exact re-rank); the unrefined probe is its cheap stage 1, whose
    // recall is capped by ADC quantization noise the same way the
    // exhaustive unrefined scan's is (0.20 vs 0.44 here — ADC noise
    // over residuals, not the cell pruning: IvfOpqNProbe=8 probes
    // hold 0.88 of the brute pairs, measured below).
    val dir = "/root/testdata/sf0.01"
    val brute = Similarity.bruteTopK(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    def recallOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet match { case p => (brute & p).size.toDouble / brute.size }
    val ivfopq = recallOf(Opq.ivfOpqFrozenTopK(spark, dir))
    val refined = recallOf(Opq.ivfOpqFrozenRefinedTopK(spark, dir))
    val opqExh = recallOf(Opq.adcOpqFrozenTopK(spark, dir))
    val opqExhRef = recallOf(Opq.adcOpqFrozenRefinedTopK(spark, dir))
    info(f"recall@${Pq.TopK}: frozen IVF-OPQ refined $refined%.3f " +
      f"(unrefined $ivfopq%.3f) vs exhaustive frozen OPQ " +
      f"$opqExh%.3f (refined $opqExhRef%.3f)")
    assert(refined >= opqExh,
      f"pruned refined recall $refined%.3f below the exhaustive " +
        f"unrefined scan's $opqExh%.3f — the ×30 scan is not " +
        "replaceable yet")
    assert(refined >= opqExhRef,
      f"pruned refined recall $refined%.3f below the exhaustive " +
        f"refined scan's $opqExhRef%.3f")
    // exact re-rank of a deeper shortlist can only improve on stage 1
    assert(refined >= ivfopq,
      f"refined IVF-OPQ recall $refined%.3f below unrefined $ivfopq%.3f")
    // and the cell ceiling itself: the probed cells must hold most of
    // the true pairs, or the probe depth is mis-sized for the corpus
    val probed = Similarity.queryProbesWith(spark, dir,
      FrozenAnn.ivfCentroidFrame(spark), Opq.IvfOpqNProbe)
      .select("query_id", "cell").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cell"))).toSet
    val cells = Similarity.cellAssignmentsWith(spark, dir,
      FrozenAnn.ivfCentroidFrame(spark))
      .select("vec_id", "cell").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    val ceiling = brute.count { case (q, nb) =>
      probed.contains((q, cells(nb))) }.toDouble / brute.size
    info(f"cell-membership ceiling at nprobe=${Opq.IvfOpqNProbe} = " +
      f"$ceiling%.3f")
    assert(ceiling >= 0.8,
      f"probed cells hold only $ceiling%.3f of true pairs")
  }

  test("pq converged cert: every (subspace, code) is stationary on " +
      "the training corpus, assignments cover corpus x M, bound earned") {
    val dir = "/root/testdata/sf0.01"
    val rows = Opq.pqConvergedCert(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= Pq.M * Pq.K)
    val total = rows.map(_.getAs[Long]("n_assigned")).sum
    val corpus = graft.Tables.load(spark, dir, "embeddings").count()
    assert(total == corpus * Pq.M,
      s"cert assignments $total must cover corpus x M = ${corpus * Pq.M}")
    rows.foreach { r =>
      val res = r.getAs[Double]("residual")
      assert(res >= 0.0 && res <= Opq.PqStationarityBound &&
        r.getAs[Boolean]("stationary"),
        s"(${r.get(0)},${r.get(1)}) residual $res")
    }
    val mx = rows.map(_.getAs[Double]("residual")).max
    assert(mx > Opq.PqStationarityBound / 4,
      f"bound ${Opq.PqStationarityBound} is slack: max residual $mx%.4f")
  }
}
