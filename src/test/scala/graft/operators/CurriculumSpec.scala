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

  test("unscoreable docs (< 2 tokens, or NULL text) are still ranked: " +
      "NULL mean_lp, NULLS FIRST, scored ranks contiguous after them") {
    val dir = java.nio.file.Files.createTempDirectory("graft-curr").toString
    import spark.implicits._
    // ids chosen so NULLs-first is distinguishable from id order:
    // 7 (one token), 9 (NULL text) are unscoreable; 1..3 scoreable
    Seq(
      (1L, "the cat sat on the mat", "en", "a", 22L),
      (2L, "the dog sat on the log", "en", "a", 22L),
      (3L, "a cat and a dog", "en", "a", 15L),
      (7L, "solo", "en", "a", 4L),
      (9L, null.asInstanceOf[String], "en", "a", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = Curriculum.order(spark, dir).collect()
    assert(rows.length == 5, "every document must be ranked")
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    Seq(7L, 9L).foreach { id =>
      assert(byId(id).isNullAt(byId(id).fieldIndex("mean_lp")),
        s"doc $id should be unscoreable")
    }
    // NULLS FIRST, ties by id: 7 then 9, before every scored doc
    assert(byId(7L).getAs[Long]("rank") == 1L)
    assert(byId(9L).getAs[Long]("rank") == 2L)
    val scored = rows.filter(r => !r.isNullAt(r.fieldIndex("mean_lp")))
      .sortBy(r => (r.getAs[Double]("mean_lp"), r.getAs[Long]("doc_id")))
    scored.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("rank") == i + 3,
        s"scored doc ${r.getAs[Long]("doc_id")} rank not contiguous")
    }
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
