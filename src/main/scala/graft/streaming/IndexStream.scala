package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.Layout

/** Continuous vector-index ingest — the streaming face of the IVF-PQ
  * maintenance verbs: micro-batches of (vec_id, embedding) rows are
  * coded against an existing layout's FROZEN sidecar quantizer and
  * appended into its cell directories ([[Layout.appendToIvfPq]]), so
  * the index trails the stream by one trigger and probes see new
  * vectors within seconds of arrival. Training stays an offline
  * concern (the quantizer sidecars never change on this path), which
  * is exactly the production division of labor: stream-ingest daily,
  * retrain-rebuild deliberately.
  *
  * Delivery: `foreachBatch` is at-least-once on retry, so a replayed
  * micro-batch would double-append its rows into the index. Ingest is
  * made idempotent AT BATCH GRANULARITY with commit markers: each
  * applied batch writes an empty `path.ingested/<batchId>` marker
  * first thing on the next-retry path — a batch whose marker exists
  * is skipped whole. Markers are tiny, monotone, and live next to the
  * index (same filesystem atomicity domain); a compaction may clear
  * them along with tombstones once the stream's checkpoint has moved
  * past.
  *
  * State: none (the stateless shard-coding pass), so the only
  * streaming state is the source offset checkpoint — the operator
  * scales with micro-batch size, not stream history.
  */
object IndexStream {

  /** Apply one micro-batch to the index, exactly once per `batchId`:
    * skip if this batch's marker exists, else append then mark.
    */
  private[streaming] def ingestBatch(path: String, batch: DataFrame,
      batchId: Long): Unit = {
    val s = batch.sparkSession
    val conf = s.sparkContext.hadoopConfiguration
    val marker = new org.apache.hadoop.fs.Path(s"$path.ingested/$batchId")
    val fs = marker.getFileSystem(conf)
    if (!fs.exists(marker)) {
      Layout.appendToIvfPq(s, path, batch)
      fs.mkdirs(marker.getParent)
      fs.create(marker, true).close()
    }
  }

  /** Start ingesting a streaming (vec_id, embedding) frame into the
    * IVF-PQ layout at `path`. The caller owns the returned query's
    * lifecycle (and its checkpoint location, via the usual writeStream
    * options on a wrapping builder if desired).
    */
  def ingest(vecs: DataFrame, path: String): StreamingQuery = {
    require(vecs.isStreaming, "ingest expects a streaming frame")
    vecs.writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(path, batch, batchId)
      }
      .start()
  }

  /** The text-index sibling of [[ingestBatch]]: apply one micro-batch
    * of (doc_id, text) rows to a persisted BM25 index
    * ([[graft.operators.Retrieval.appendBm25Batch]] — postings append
    * plus the EXACT df/N/Σdl statistics merge), exactly once per
    * `batchId` via the same commit markers.
    */
  private[streaming] def ingestBm25Batch(path: String, batch: DataFrame,
      batchId: Long): Unit = {
    val s = batch.sparkSession
    val conf = s.sparkContext.hadoopConfiguration
    val marker = new org.apache.hadoop.fs.Path(s"$path.ingested/$batchId")
    val fs = marker.getFileSystem(conf)
    if (!fs.exists(marker)) {
      graft.operators.Retrieval.appendBm25Batch(s, path, batch)
      fs.mkdirs(marker.getParent)
      fs.create(marker, true).close()
    }
  }

  /** Start ingesting a streaming (doc_id, text) frame into the BM25
    * index at `path`. Same contract as [[ingest]]: probes see new
    * documents — scored against EXACTLY updated corpus statistics —
    * one trigger after arrival.
    */
  def ingestBm25(docs: DataFrame, path: String): StreamingQuery = {
    require(docs.isStreaming, "ingestBm25 expects a streaming frame")
    docs.writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBm25Batch(path, batch, batchId)
      }
      .start()
  }
}
