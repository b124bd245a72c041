package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sequence packing: the two-phase distributed prefix sum must equal
  * a sequential fold, and its plan must stay distributed (the naive
  * formulation — one global ordered window — collapses the corpus
  * into a single task).
  */
class PackSpec extends SparkSpec {

  test("global token offsets equal a sequential fold over doc order") {
    val rows = Pack.packChunks(spark, sf).collect()
    val naive = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    var run = 0L
    val expected = naive.map { case (id, nt) =>
      val start = run; run += nt; (id, nt, start)
    }
    assert(rows.length == expected.length)
    rows.zip(expected).foreach { case (r, (id, nt, start)) =>
      assert(r.getAs[Long]("doc_id") == id)
      assert(r.getAs[Long]("n_tokens") == nt)
      assert(r.getAs[Long]("tok_start") == start, s"offset of doc $id")
      assert(r.getAs[Long]("chunk_first") == start / Pack.ChunkTokens)
      assert(r.getAs[Long]("chunk_last") ==
        (start + nt - 1) / Pack.ChunkTokens)
    }
    // the stream is gapless: chunks tile the corpus
    assert(run == expected.map(_._2).sum)
  }

  test("no-split bins: every bin fits the window (or is one oversized " +
      "doc), fills are gapless, blocks pack independently") {
    val rows = Pack.packBins(spark, sf).collect()
    assert(rows.nonEmpty)
    val byBin = rows.groupBy(r =>
      (r.getAs[Long]("grp"), r.getAs[Long]("bin")))
    byBin.foreach { case ((g, b), ds) =>
      val sorted = ds.sortBy(_.getAs[Long]("doc_id"))
      val total = sorted.map(_.getAs[Long]("n_tokens")).sum
      // capacity holds unless the bin is a single oversized doc
      assert(total <= Pack.ChunkTokens || sorted.length == 1,
        s"overfull bin ($g,$b)")
      // bin_fill is the running fill within the bin
      var run = 0L
      sorted.foreach { r =>
        run += r.getAs[Long]("n_tokens")
        assert(r.getAs[Long]("bin_fill") == run)
      }
    }
    // block id is doc_id >> 8; a doc never lands outside its block
    rows.foreach { r =>
      assert(r.getAs[Long]("grp") == r.getAs[Long]("doc_id") >> 8)
    }
    // greedy property: a doc opens a new bin only because it would
    // not have fit the previous bin's fill
    rows.groupBy(_.getAs[Long]("grp")).foreach { case (_, ds) =>
      val sorted = ds.sortBy(_.getAs[Long]("doc_id"))
      sorted.sliding(2).foreach {
        case Array(a, b) if b.getAs[Long]("bin") != a.getAs[Long]("bin") =>
          assert(a.getAs[Long]("bin_fill") + b.getAs[Long]("n_tokens") >
            Pack.ChunkTokens)
        case _ =>
      }
    }
  }

  test("plan stays distributed: range partitioning + broadcast offsets, " +
      "no global-window collapse of the corpus") {
    // the shared cached frame is session-global; clear so this pin
    // sees its own materialization, not another suite's
    spark.catalog.clearCache()
    val df = Pack.packChunks(spark, sf)
    // materialize first: the final stage shapes are RUNTIME decisions
    // under AQE, invisible in the pre-execution plan string
    df.collect()
    import org.apache.spark.sql.catalyst.plans.physical.{
      RangePartitioning, SinglePartition}
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{
      BroadcastHashJoinExec, SortMergeJoinExec}
    val nodes = outerPlanNodes(df.queryExecution.executedPlan)
    // THE reuse invariant: every source read goes through the cached
    // ranged frame — a FileScan in the outer tree means the offsets
    // or output subtree recomputed the upstream instead of sharing
    // the one materialization
    assert(!nodes.exists(_.isInstanceOf[FileSourceScanExec]),
      "upstream recomputed: FileScan outside the cached ranged frame")
    assert(nodes.exists(_.isInstanceOf[InMemoryTableScanExec]),
      "cached ranged frame never read")
    // the only outer range exchange is the final presentation sort;
    // the phase-1 range partitioning lives INSIDE the cached frame
    val ranges = nodes.collect { case s: ShuffleExchangeExec
      if s.outputPartitioning.isInstanceOf[RangePartitioning] => s }
    assert(ranges.size <= 1, s"second range exchange: upstream re-sorted")
    // offsets rebase is a broadcast join, and nothing degrades to a
    // sort-merge of the corpus
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]))
    assert(!nodes.exists(_.isInstanceOf[SortMergeJoinExec]))
    // exactly one single-partition exchange is allowed — the P-row
    // offsets frame's cumsum — and none may sit under the big side's
    // mapPartitions pass
    val singles = nodes.collect { case s: ShuffleExchangeExec
      if s.outputPartitioning == SinglePartition => s }
    assert(singles.size <= 1, "unexpected global collapse")
  }
}
