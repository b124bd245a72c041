package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Mixture-sampling invariants (the sf0.01 DuckDB oracle is the
  * value-level gate; this pins the budget-fill semantics).
  */
class MixSpec extends SparkSpec {

  test("admission is a budget-bounded prefix of the priority order " +
      "per source") {
    val rows = Mix.mixSources(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cum_before") < r.getAs[Long]("budget"))
    }
    // per source: admitted tokens reach the budget unless the source
    // ran out of docs entirely
    val admitted = rows.groupBy(_.getAs[String]("source"))
    val all = graft.Tables.load(spark, sf, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("n"))
      .toMap
    admitted.foreach { case (src, ds) =>
      val budget = ds.head.getAs[Long]("budget")
      val toks = ds.map(_.getAs[Long]("n_tokens")).sum
      assert(toks >= budget || ds.length == all(src),
        s"source $src stopped below budget with docs left")
    }
  }

  test("budgets split 50% of the corpus by the decaying integer weights") {
    val audit = Mix.mixAudit(spark, sf).collect()
    val corpus = graft.Tables.load(spark, sf, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    val budgets = audit.map(_.getAs[Long]("budget")).sum
    // integer floor per source loses < 1 token each
    assert(budgets <= corpus / 2 && budgets >= corpus / 2 - audit.length)
    audit.foreach { r =>
      // every source overshoots by at most one doc, so fill_ratio
      // stays close to 1 unless the source was exhausted
      assert(r.getAs[Double]("fill_ratio") > 0)
    }
  }

  test("rebased global prefix ≡ the per-source window form (the plan " +
      "swap changed the shape, not the contract)") {
    // the window reference implementation the operator replaced:
    // per-source cumulative tokens in (pri, doc_id) order
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        md5(col("doc_id").cast("string").cast("binary")).as("pri"))
    val byPri = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("pri"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val windowed = docs
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(byPri), lit(0L)))
      .select(col("doc_id"), col("cum_before"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ours = Mix.mixSources(spark, sf).collect()
    assert(ours.nonEmpty)
    ours.foreach { r =>
      assert(r.getAs[Long]("cum_before") ==
        windowed(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")}: prefix rebase diverged " +
          s"from the window reference")
    }
    // arrival twin: same parity on the doc_id order
    val byArr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val windowedArr = docs
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(byArr), lit(0L)))
      .select(col("doc_id"), col("cum_before"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Mix.mixArrival(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("cum_before") ==
        windowedArr(r.getAs[Long]("doc_id")))
    }
  }

  test("deterministic: two runs admit the identical set") {
    val a = Mix.mixSources(spark, sf).collect().map(_.getAs[Long]("doc_id"))
    val b = Mix.mixSources(spark, sf).collect().map(_.getAs[Long]("doc_id"))
    assert(a.sameElements(b))
  }

  test("temperature: α = ½ pulls sampling shares toward uniform — " +
      "rare pools lift above natural share, the dominant one damps") {
    val rows = Mix.mixTemperature(spark, sf).collect()
    assert(rows.length > 1, "needs multiple language pools")
    val uniform = 1.0 / rows.length
    rows.foreach { r =>
      val nat = r.getAs[Double]("nat_share")
      val p = r.getAs[Double]("sample_p")
      // p sits strictly between natural and uniform (α ∈ (0,1)),
      // up to the 6-decimal display rounding
      if (nat < uniform)
        assert(p >= nat - 1e-6 && p <= uniform + 1e-6,
          s"${r.getAs[String]("lang")}: p=$p not in [$nat, $uniform]")
      else
        assert(p <= nat + 1e-6 && p >= uniform - 1e-6,
          s"${r.getAs[String]("lang")}: p=$p not in [$uniform, $nat]")
    }
    // probabilities normalize; budgets account the 2× take up to one
    // floor per pool
    val psum = rows.map(_.getAs[Double]("sample_p")).sum
    assert(math.abs(psum - 1.0) < 1e-4, s"Σp = $psum")
    val corpus = rows.map(_.getAs[Long]("pool_tokens")).sum
    val budgets = rows.map(_.getAs[Long]("budget")).sum
    assert(budgets <= 2 * corpus && budgets >= 2 * corpus - rows.length)
  }

  test("upsample manifest: per-pool admitted tokens land within one " +
      "doc of the budget, and copies are densely numbered") {
    val budgets = Mix.mixTemperature(spark, sf).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("budget")).toMap
    val rows = Mix.mixUpsample(spark, sf).collect()
    // epoch numbering per doc is 0..n_copies-1, no gaps
    rows.groupBy(r => r.getAs[Long]("doc_id")).foreach { case (_, g) =>
      val copies = g.head.getAs[Long]("n_copies")
      assert(g.map(_.getAs[Long]("epoch")).sorted.toSeq ==
        (0L until copies).toSeq)
    }
    // the manifest totals the budget to within one boundary doc per
    // pool (the kept crossing doc can overshoot by its own length)
    val maxDoc = rows.map(_.getAs[Long]("n_tokens")).max
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, g) =>
      val toks = g.map(_.getAs[Long]("n_tokens")).sum
      val b = budgets(lang)
      assert(toks >= b && toks <= b + maxDoc,
        s"$lang: manifest $toks vs budget $b")
      // data-constrained take (2× corpus): every pool actually repeats
      assert(g.exists(_.getAs[Long]("epoch") >= 1),
        s"$lang never upsampled under the 2× take")
    }
  }
}
