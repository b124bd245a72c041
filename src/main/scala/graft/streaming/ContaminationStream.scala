package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.{Dedup, TextAnalysis}

/** Streaming contamination guard — the intake-time form of
  * `contamination_check`: every arriving micro-batch of training
  * documents is probed against a FROZEN benchmark suite's shingle
  * index, and documents sharing ≥ 2 shingles with any benchmark doc
  * are flagged BEFORE they land in the corpus. The batch operator is
  * the forensic audit run after the fact; this is the gate that keeps
  * eval leakage out in the first place — the direction real pipelines
  * need, since benchmarks are fixed while training data arrives
  * forever.
  *
  * Physical shape: the benchmark's (bench_id, shingle) index is
  * benchmark-sized by nature (eval suites are tiny next to a training
  * corpus), computed ONCE and cached; each trigger explodes only its
  * own micro-batch and hash-joins the broadcast index — the identical
  * plan as the batch operator's probe, applied per batch. No
  * streaming state at all: per-doc verdicts are independent of every
  * other training document (unlike near-dedup, which needs
  * cross-batch seen-state), so the only state is the source offset
  * checkpoint, and `foreachBatch` replays are idempotent — a replayed
  * batch recomputes the identical verdicts from the frozen index.
  */
object ContaminationStream {

  /** One flagged (training doc, benchmark doc) contamination edge. */
  case class Contam(batchId: Long, trainId: Long, benchId: Long,
      nShared: Long, overlapFrac: Double)

  /** Probe one batch against the cached benchmark shingle index
    * (pure; reused by the spec for the batch-twin and replay pins).
    */
  private[graft] def measure(batch: DataFrame, benchSh: DataFrame,
      batchId: Long): Seq[Contam] =
    TextAnalysis.contaminationOf(
      batch.select(col("doc_id").as("train_id"),
        explode(Dedup.shingles(col("text"))).as("sh")),
      benchSh)
      .collect()
      .map(r => Contam(batchId, r.getAs[Long]("train_id"),
        r.getAs[Long]("bench_id"), r.getAs[Long]("n_shared"),
        r.getAs[Double]("overlap_frac")))
      .sortBy(c => (c.trainId, c.benchId)).toSeq

  /** Start guarding a streaming (doc_id, text) frame against the
    * STATIC benchmark frame (doc_id, text). The flagged-edge collect
    * is bounded by actual contamination volume per batch — an
    * un-contaminated batch emits an empty list. The caller owns the
    * query.
    */
  def monitor(docs: DataFrame, bench: DataFrame)(
      onBatch: (Long, Seq[Contam]) => Unit): StreamingQuery = {
    require(docs.isStreaming, "monitor expects a streaming frame")
    require(!bench.isStreaming, "the benchmark suite is frozen")
    // one-time benchmark index; cached — every trigger probes it
    val benchSh = bench
      .select(col("doc_id").as("bench_id"),
        explode(Dedup.shingles(col("text"))).as("sh"))
      .cache()
    docs.writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onBatch(batchId, measure(batch, benchSh, batchId))
      }
      .start()
  }
}
