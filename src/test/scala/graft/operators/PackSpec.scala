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

  test("plan stays distributed: range partitioning + broadcast offsets, " +
      "no global-window collapse of the corpus") {
    val df = Pack.packChunks(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning"))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    // exactly one single-partition exchange is allowed — the P-row
    // offsets frame's cumsum — and none may sit under the big side's
    // mapPartitions pass
    val singles = "SinglePartition".r.findAllIn(p).length
    assert(singles <= 1, s"unexpected global collapse:\n$p")
  }
}
