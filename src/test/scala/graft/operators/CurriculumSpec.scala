package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Curriculum ordering: the distributed two-phase rank must equal the
  * sequential ordering, and the plan must stay distributed (no global
  * single-task window over the corpus).
  */
class CurriculumSpec extends SparkSpec {

  test("ranks equal the sequential (mean_lp, doc_id) order; deciles cut " +
      "equal mass") {
    val rows = Curriculum.order(spark, sf).collect()
    val n = rows.length
    assert(n > 0)
    // ranks are a permutation of 1..n
    assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq ==
      (1L to n.toLong).toSeq)
    // rank order = sequential sort order
    val seq = rows.sortBy(r =>
      (r.getAs[Double]("mean_lp"), r.getAs[Long]("doc_id")))
    seq.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("rank") == i + 1,
        s"doc ${r.getAs[Long]("doc_id")}")
    }
    // deciles: the integer cut (rank-1)*10 div n, sizes within 1
    rows.foreach { r =>
      assert(r.getAs[Long]("decile") ==
        (r.getAs[Long]("rank") - 1) * 10 / n)
    }
    val sizes = rows.groupBy(_.getAs[Long]("decile")).values.map(_.length)
    assert(sizes.max - sizes.min <= 1)
  }

  test("plan stays distributed: range partitioning, single-partition " +
      "exchanges only above cluster-sized frames") {
    val df = Curriculum.order(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("rangepartitioning"))
    // three SinglePartition exchanges are allowed — the P-row offsets
    // cumsum, the 1-row total, and the embedded LM's 1-row vocabulary
    // count — but the corpus-sized side must never collapse: no
    // Window keyed on document columns
    assert(!p.contains("windowspecdefinition(doc_id"),
      s"global window over the corpus:\n$p")
    val singles = "SinglePartition".r.findAllIn(p).length
    assert(singles <= 3, s"unexpected global collapse:\n$p")
  }
}
