package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.operators.Layout

/** Continuous ingest into a z-bucketed relational layout — the
  * streaming face of [[Layout]]'s z-order lifecycle, mirroring
  * [[IndexStream]] for the vector index: micro-batches of rows are
  * z-keyed against the layout's FROZEN `.bounds` sidecar and land in
  * their Morton buckets within one trigger, so 2-D box probes see new
  * rows seconds after arrival. Re-bucketing bounds stays an offline
  * concern (a deliberate [[Layout.writeZBucketed]] rebuild), the same
  * division of labor as quantizer retraining.
  *
  * Delivery: `foreachBatch` is at-least-once, and this path is
  * idempotent at EVERY crash point without a repair verb — each batch
  * writes its rows under `zbucket=β/zbatch=batchId` with dynamic
  * partition overwrite ([[Layout.appendZBatch]]), so a crashed
  * half-append is healed by the replay overwriting exactly its own
  * (bucket, batch) partitions. The commit marker on top only saves
  * the replay's write work; correctness never depends on it.
  * Compaction ([[Layout.compactZBuckets]]) folds accumulated batch
  * partitions into one file per bucket — run it while the stream is
  * quiesced, the single-writer discipline every layout verb here
  * assumes.
  *
  * State: none — the only streaming state is the source offset
  * checkpoint, so the operator scales with micro-batch size, not
  * stream history.
  */
object ZorderStream {

  /** Apply one micro-batch: skip if its marker exists, else an
    * idempotent (bucket, batch)-scoped overwrite, then mark.
    */
  private[streaming] def ingestBatch(path: String, batch: DataFrame,
      batchId: Long): Unit = {
    val s = batch.sparkSession
    val conf = s.sparkContext.hadoopConfiguration
    val marker = new org.apache.hadoop.fs.Path(s"$path.ingested/$batchId")
    val fs = marker.getFileSystem(conf)
    if (!fs.exists(marker)) {
      Layout.appendZBatch(s, path, batch, batchId)
      fs.mkdirs(marker.getParent)
      fs.create(marker, true).close()
    }
  }

  /** Start ingesting a streaming frame (carrying the layout's two key
    * columns) into the z-bucketed layout at `path`. The caller owns
    * the returned query's lifecycle.
    */
  def ingest(rows: DataFrame, path: String): StreamingQuery = {
    require(rows.isStreaming, "ingest expects a streaming frame")
    rows.writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(path, batch, batchId)
      }
      .start()
  }
}
