package graft.streaming

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.util.sketch.BloomFilter

import graft.operators.Dedup

/** Streaming novelty monitor — the arrival-time form of
  * `text_novelty`: per micro-batch, the fraction of the batch's
  * distinct shingles NOT yet seen on the stream, the admission score
  * a crawler applies before paying for downstream processing (a
  * batch that introduces nothing is a re-crawl; one near 1.0 is new
  * material).
  *
  * The state problem is the interesting part: exact seen-shingle
  * state grows with the CORPUS (unbounded on a stream), so the
  * monitor keeps a FIXED-SIZE Bloom filter of seen shingle hashes
  * instead — O(capacity) bytes forever, with a one-sided error
  * contract the spec pins: no false negatives means re-seen shingles
  * are NEVER counted novel (a re-crawl scores exactly 0), and false
  * positives only UNDERCOUNT novelty, bounded by the configured fpp.
  * This is the same fixed-seed, order-free filter the bloom join
  * builds, so batch filters constructed distributedly (one tiny
  * aggregation per batch, same capacity ⇒ same bit layout) bit-OR
  * into the running state on the driver.
  *
  * Probes run through Spark's codegen `bloom_might_contain` against
  * the serialized state shipped as a plan literal — per batch the
  * work is one distinct-shingle aggregation and one narrow filter;
  * nothing corpus-proportional moves.
  */
object NoveltyStream {

  case class BatchNovelty(batchId: Long, nShingles: Long, nNovel: Long,
      noveltyFrac: Double)

  /** Mutable seen-state: fixed-size Bloom over xxhash64 shingle keys.
    * All batch filters are built with the SAME capacity/fpp so their
    * bit layouts are merge-compatible.
    */
  final class Seen(val capacity: Long, val fpp: Double) {
    private[streaming] val bloom = BloomFilter.create(capacity, fpp)
    // replay guard (see measure): highest batchId already folded into
    // the filter, plus its emitted result for idempotent re-emission
    private[streaming] var lastMerged: Long = -1L
    private[streaming] var lastResult: BatchNovelty = _
    private[streaming] def bytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
  }

  /** Measure one batch against the seen-state, then fold the batch's
    * shingles into it (pure but state-mutating at the end; reused by
    * the spec for replay).
    */
  private[graft] def measure(batch: DataFrame, seen: Seen,
      batchId: Long): BatchNovelty = {
    // foreachBatch is at-least-once: a batch replayed after a sink
    // failure would probe state that already contains its OWN
    // shingles and report noveltyFrac 0 for the same batchId. The
    // pre-merge count is unrecoverable from the filter, so the state
    // remembers the last merged batchId and re-emits its cached
    // result instead of re-measuring (exactly-once emission per id).
    // The cache holds ONLY the latest batch's result, so the fast
    // path is strictly `==`: relabeling it for an OLDER id would emit
    // another batch's counts under that id. A strictly-older replay
    // (not a Structured Streaming behavior — foreachBatch replays only
    // the batch in flight at failure — but reachable via direct
    // driver calls) falls through to an honest re-measure: nKeys is
    // exact, nNovel underreports because the batch's own shingles are
    // already folded in, and the state high-water mark never regresses.
    if (batchId == seen.lastMerged && seen.lastResult != null)
      return seen.lastResult
    if (batchId < seen.lastMerged)
      System.err.println(s"[novelty] out-of-order measure of batch " +
        s"$batchId after ${seen.lastMerged} already merged: its keys " +
        "are in the filter, so nNovel reads ~0 (re-measured, not " +
        "relabeled)")
    val keys = batch
      .select(explode(Dedup.shingles(col("text"))).as("sh"))
      .select(xxhash64(col("sh")).as("h"))
      .distinct()
      .cache()
    try {
      val n = keys.count()
      val novel =
        if (n == 0) 0L
        else keys.filter(!call_function("bloom_might_contain",
          lit(seen.bytes), col("h"))).count()
      if (n > 0) {
        // distributed batch filter, driver bit-OR into the state
        seen.bloom.mergeInPlace(
          keys.stat.bloomFilter("h", seen.capacity, seen.fpp))
      }
      val r = BatchNovelty(batchId, n, novel,
        if (n == 0) 0.0 else math.round(novel.toDouble / n * 1e6) / 1e6)
      if (batchId > seen.lastMerged) { // high-water mark never regresses
        seen.lastMerged = batchId
        seen.lastResult = r
      }
      r
    } finally keys.unpersist()
  }

  /** Start monitoring a streaming (doc_id, text) frame. `capacity`
    * sizes the state for the stream's expected distinct-shingle
    * lifetime (overflow degrades fpp gracefully, never correctness
    * of the no-false-negative side). The caller owns the query.
    */
  def monitor(docs: DataFrame, capacity: Long = 1L << 20,
      fpp: Double = 0.01)(onBatch: BatchNovelty => Unit): StreamingQuery = {
    require(docs.isStreaming, "monitor expects a streaming frame")
    val seen = new Seen(capacity, fpp)
    docs.writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) onBatch(measure(batch, seen, batchId))
      }
      .start()
  }
}
