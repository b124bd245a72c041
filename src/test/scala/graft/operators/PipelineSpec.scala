package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Capstone pipeline (curate → split → shuffle → pack as one plan):
  * the sf0.01 DuckDB oracle is the row-level gate; this spec pins the
  * composition invariants against the stage operators it reuses, and
  * the fused-plan shape.
  */
class PipelineSpec extends SparkSpec {

  private lazy val rows = Pipeline.manifest(spark, sf).collect()

  test("manifest docs = curated survivors; splits match the split rule") {
    val curated = Curate.pipeline(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == curated)
    val ruled = Sampling.splitAssign(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(rows.forall(r =>
      ruled(r.getAs[Long]("doc_id")) == r.getAs[String]("split")))
  }

  test("per split: positions dense from 0; tok_start is the running " +
      "token sum in position order; shard and chunk ids are the shifts") {
    rows.groupBy(_.getAs[String]("split")).foreach { case (_, rs) =>
      val inOrder = rs.sortBy(_.getAs[Long]("pos"))
      assert(inOrder.map(_.getAs[Long]("pos")).toSeq ==
        (0L until inOrder.length).toSeq)
      var run = 0L
      inOrder.foreach { r =>
        assert(r.getAs[Long]("tok_start") == run)
        run += r.getAs[Long]("n_tokens")
        assert(r.getAs[Long]("shard") == r.getAs[Long]("pos") >> 9)
        assert(r.getAs[Long]("chunk_first") == r.getAs[Long]("tok_start") >> 11)
        assert(r.getAs[Long]("chunk_last") ==
          (r.getAs[Long]("tok_start") + r.getAs[Long]("n_tokens") - 1) >> 11)
      }
    }
    // the permutation actually permutes: some doc sits at a position
    // different from its rank in doc_id order (seeded-hash order)
    val train = rows.filter(_.getAs[String]("split") == "train")
      .sortBy(_.getAs[Long]("pos")).map(_.getAs[Long]("doc_id"))
    assert(train.toSeq != train.sorted.toSeq)
  }

  test("rank and pack phases share ONE materialized range stage " +
      "(structural cache); no global-window collapse; the rebase join " +
      "broadcasts") {
    // the shared cached frame is session-global state; clear so this
    // pin sees its own materialization, not another suite's
    spark.catalog.clearCache()
    val df = Pipeline.manifest(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("rangepartitioning"))
    // the offsets subtree reads the CACHED ranged frame instead of
    // re-running curate + re-sorting. Structural reuse — both phases
    // scan one InMemoryRelation — not optimizer-dependent
    // ReuseExchange pattern-matching, which failed under a warm
    // session and silently doubled the curate stage (PackSpec's
    // invariant, inherited through exclusiveSums).
    assert("InMemoryTableScan".r.findAllIn(p).length >= 2,
      s"ranged frame not scanned by BOTH phases:\n$p")
    // only cluster-sized frames may single-partition: the P-row
    // offsets cumsum (one per fused prefix pass)
    val singles = "SinglePartition".r.findAllIn(p).length
    assert(singles <= 1, s"unexpected global collapse:\n$p")
    // per-split rebase is a broadcast join, not a shuffle of the corpus
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
