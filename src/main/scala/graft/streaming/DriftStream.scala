package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.Drift

/** Streaming drift monitor — the per-trigger form of [[Drift]]: each
  * arriving micro-batch's unigram distribution is compared (JSD,
  * bits) against a FROZEN reference distribution — the accepted
  * corpus snapshot — and one (batch_id, n_docs, n_tokens, jsd_bits)
  * measurement is emitted per trigger. This is the alarm a crawl
  * pipeline keeps on its intake: a batch whose divergence jumps got
  * templated, language-shifted, or spam-flooded BEFORE it lands in
  * the corpus, while `drift_js_divergence` is the forensic batch
  * query run after.
  *
  * Physical shape: the reference probabilities are a vocab-sized
  * cached frame computed ONCE ([[Drift.unigramProbs]]); each trigger
  * aggregates only its own micro-batch (map-side combinable, output
  * vocab-sized) and joins it to the reference with one FULL OUTER
  * equi-join on the token. No streaming state at all — the only
  * state is the source offset checkpoint, so the monitor scales with
  * micro-batch size, not stream history.
  *
  * Delivery: measurements are produced in `foreachBatch`, which is
  * at-least-once on retry — idempotent here because the measurement
  * for a `batchId` is a pure function of that batch and the frozen
  * reference, so a replay overwrites an identical row.
  */
object DriftStream {

  /** One micro-batch's drift measurement against the reference. */
  case class BatchDrift(batchId: Long, nDocs: Long, nTokens: Long,
      jsdBits: Double)

  /** Measure one batch (pure; reused by the spec for the replay
    * argument). `refProbs` must be (tok, p).
    */
  private[graft] def measure(batch: DataFrame, refProbs: DataFrame,
      batchId: Long): BatchDrift = {
    val stats = batch.agg(count(lit(1)).as("n_docs"),
      coalesce(sum(size(split(col("text"), " "))), lit(0L)).as("n_tokens"))
      .head
    val q = Drift.unigramProbs(batch).toDF("tok", "q")
    val jsd = Drift.jsdBetween(refProbs, q)
    BatchDrift(batchId, stats.getAs[Long]("n_docs"),
      stats.getAs[Long]("n_tokens"),
      math.round(jsd * 1e6) / 1e6)
  }

  /** Start monitoring a streaming (doc_id, text) frame against the
    * frozen reference distribution. `onBatch` receives each trigger's
    * measurement — wire it to a metrics sink, an alert, or (as the
    * spec does) an in-memory buffer. The caller owns the returned
    * query's lifecycle.
    */
  def monitor(docs: DataFrame, refProbs: DataFrame)
      (onBatch: BatchDrift => Unit): StreamingQuery = {
    require(docs.isStreaming, "monitor expects a streaming frame")
    val frozen = refProbs.cache()
    docs.writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) onBatch(measure(batch, frozen, batchId))
      }
      .start()
  }
}
