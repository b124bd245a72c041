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
    import org.apache.spark.sql.catalyst.plans.physical.{
      RangePartitioning, SinglePartition}
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val nodes = outerPlanNodes(df.queryExecution.executedPlan)
    // THE reuse invariant: the offsets subtree reads the CACHED
    // ranged frame instead of re-running curate + re-sorting. A
    // FileScan in the outer executed tree would mean some phase
    // recomputed the corpus from source — the silent curate-doubling
    // failure the structural cache exists to prevent. (Asserted on
    // plan NODES, not strings: under AQE a reused stage prints as a
    // bare reference, so counting `InMemoryTableScan` strings
    // undercounts — the r6 pin failure.)
    assert(!nodes.exists(_.isInstanceOf[FileSourceScanExec]),
      "curate recomputed: FileScan outside the cached ranged frame")
    assert(nodes.exists(_.isInstanceOf[InMemoryTableScanExec]),
      "cached ranged frame never read")
    // the only outer range exchange is the final (split, pos) sort;
    // phase 1's (split, h, doc_id) range shuffle lives INSIDE the
    // cached frame and must not reappear outside it
    val ranges = nodes.collect { case s: ShuffleExchangeExec
      if s.outputPartitioning.isInstanceOf[RangePartitioning] => s }
    assert(ranges.size <= 1, "second range exchange: corpus re-sorted")
    // only bounded frames may single-partition: the P-row partition-
    // offsets cumsum and the S-row split-rebase cumsum. Each must sit
    // directly above an aggregate (cluster- or split-count-sized
    // output), never above corpus-sized data
    val singles = nodes.collect { case s: ShuffleExchangeExec
      if s.outputPartitioning == SinglePartition => s }
    assert(singles.size <= 2, "unexpected global collapse:\n" +
      singles.map(_.treeString).mkString("\n====\n"))
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan)
        : org.apache.spark.sql.execution.SparkPlan = p match {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        unwrap(w.child)
      case i: org.apache.spark.sql.execution.InputAdapter => unwrap(i.child)
      case other => other
    }
    singles.foreach { s =>
      assert(unwrap(s.child).isInstanceOf[
        org.apache.spark.sql.execution.aggregate.HashAggregateExec],
        s"single-partition exchange above non-aggregate:\n${s.treeString}")
    }
    // per-split rebase is a broadcast join, not a shuffle of the corpus
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]))
    assert(!nodes.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.CartesianProductExec]))
  }
}
