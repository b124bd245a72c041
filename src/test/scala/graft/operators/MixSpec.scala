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

  test("deterministic: two runs admit the identical set") {
    val a = Mix.mixSources(spark, sf).collect().map(_.getAs[Long]("doc_id"))
    val b = Mix.mixSources(spark, sf).collect().map(_.getAs[Long]("doc_id"))
    assert(a.sameElements(b))
  }
}
