package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Drift

/** The streaming drift monitor must agree with the batch JSD math:
  * an in-distribution batch measures 0, a disjoint-vocabulary batch
  * measures 1, and a partial shift lands between — per trigger, with
  * no streaming state.
  */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  test("per-batch JSD vs the frozen reference: 0 for in-distribution, " +
      "1 for disjoint vocabulary, between for a partial shift") {
    val ref = Drift.unigramProbs(
      Seq((1L, "x y z x y z"), (2L, "x y z x y z"))
        .toDF("doc_id", "text"))
      .cache()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val seen = mutable.ArrayBuffer.empty[DriftStream.BatchDrift]
    val q = DriftStream.monitor(
      mem.toDF().toDF("doc_id", "text"), ref)(b => seen.synchronized {
        seen += b
      })
    try {
      // wave 1: exactly the reference distribution
      mem.addData((10L, "x y z x y z"))
      q.processAllAvailable()
      // wave 2: half the mass moved to an unseen token
      mem.addData((11L, "x y z q q q"))
      q.processAllAvailable()
      // wave 3: fully disjoint vocabulary
      mem.addData((12L, "u v w u v w"))
      q.processAllAvailable()
      val byBatch = seen.synchronized(seen.sortBy(_.batchId).toVector)
      assert(byBatch.length == 3, s"one measurement per wave: $byBatch")
      assert(byBatch(0).jsdBits == 0.0, s"in-distribution: $byBatch")
      assert(byBatch(1).jsdBits > 0.0 && byBatch(1).jsdBits < 1.0,
        s"partial shift must land strictly between: $byBatch")
      assert(byBatch(2).jsdBits == 1.0, s"disjoint vocab: $byBatch")
      assert(byBatch.forall(_.nDocs == 1) && byBatch.forall(_.nTokens == 6))
      // the measurement is the batch function applied per trigger —
      // replaying wave 2 through the pure core reproduces its row
      val replay = DriftStream.measure(
        Seq((11L, "x y z q q q")).toDF("doc_id", "text"), ref, 1L)
      assert(replay.jsdBits == byBatch(1).jsdBits)
    } finally {
      q.stop()
      ref.unpersist()
    }
  }
}
