package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.operators.{Dedup, TextAnalysis}

/** The COMPOSED intake pipeline as one streaming monitor — the thing
  * the individual guards exist for: arriving documents pass the
  * quality gate (stateless filter), cross-batch NEAR-DUP admission
  * (the [[DocStream]] MinHash state machine), and the frozen-benchmark
  * CONTAMINATION check, and the survivors append to a durable curated
  * store exactly once per micro-batch. This is a crawler's full
  * admission path: of everything that arrives, only quality,
  * non-duplicate, non-leaking documents ever land on disk, one
  * trigger after arrival.
  *
  * Stage order is deliberate: the quality gate is the cheapest filter
  * (narrow projection) so it runs first; near-dedup runs second so
  * its FIFO-bounded per-bucket state is never polluted by junk that
  * quality would drop; the contamination probe runs last over the
  * (small) admitted set — the broadcast benchmark join then touches
  * the fewest rows.
  *
  * Scale/robustness shape: quality is stateless; dedup state is the
  * FIFO-bounded per-bucket signature list (O(buckets × MaxPerBucket),
  * never corpus-proportional); contamination probes a benchmark-sized
  * cached index; the store append is guarded by per-batchId commit
  * markers, so `foreachBatch`'s at-least-once replay cannot
  * double-append (the [[IndexStream]] contract). AdmissionStreamSpec
  * pins each rejection class end-to-end, the store contents, and the
  * replay no-op.
  */
object AdmissionStream {

  /** Signature row with the text carried through (the [[DocStream]]
    * prefix drops it; the store needs it).
    */
  case class SigDocT(doc_id: Long, bucket: Long, sig: Seq[Long],
      text: String)

  /** A dedup-admitted candidate (pre-contamination). */
  case class Candidate(doc_id: Long, text: String, bucket: Long,
      n_compared: Int)

  /** Per-batch admission accounting. */
  case class BatchStats(batchId: Long, nCandidates: Long,
      nContaminated: Long, nStored: Long)

  /** Stateless prefix with text passthrough — same signature/bucket
    * derivation as [[DocStream.signed]].
    */
  private def signedT(docs: DataFrame): Dataset[SigDocT] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id"),
        Dedup.minhashSignature(Dedup.shingles(col("text"))).as("sig"),
        col("text"))
      .select(col("doc_id"),
        Dedup.bandBucket(col("sig"), lit(0)).as("bucket"), col("sig"),
        col("text"))
      .as[SigDocT]
  }

  /** Cross-batch near-dup admission with text carried through — the
    * same [[DocStream.admitFold]] state machine (identical
    * thresholds, FIFO bound, and doc_id-ordered determinism).
    */
  private def nearDedupedT(docs: DataFrame): Dataset[Candidate] = {
    import docs.sparkSession.implicits._
    signedT(docs)
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[DocStream.BucketState, Candidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (bucket, rows, state) =>
          val byId = scala.collection.mutable.Map.empty[Long, String]
          val sigRows = rows.map { d =>
            byId(d.doc_id) = d.text; (d.doc_id, d.sig)
          }
          val (seen, admitted) = DocStream.admitFold(sigRows,
            state.getOption.getOrElse(DocStream.BucketState(Nil)).sigs,
            Dedup.NumPerms)
          state.update(DocStream.BucketState(seen))
          admitted.iterator.map { case (id, n) =>
            Candidate(id, byId(id), bucket, n)
          }
      }
  }

  /** Contamination-check one admitted batch against the cached
    * benchmark index, append survivors to the store exactly once per
    * batchId, and return the accounting (pure given the marker state;
    * reused by the spec for the replay pin).
    */
  private[graft] def applyBatch(storePath: String, benchSh: DataFrame,
      batch: DataFrame, batchId: Long): BatchStats = {
    val s = batch.sparkSession
    val nCandidates = batch.count()
    val contaminated = TextAnalysis.contaminationOf(
      batch.select(col("doc_id").as("train_id"),
        explode(Dedup.shingles(col("text"))).as("sh")),
      benchSh)
      .select(col("train_id").as("doc_id")).distinct()
    val admitted = batch
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("text"), col("bucket"),
        col("n_compared"))
    val nContaminated = contaminated.count()
    val marker = new org.apache.hadoop.fs.Path(
      s"$storePath.ingested/$batchId")
    val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      admitted.write.mode("append").parquet(storePath)
      fs.mkdirs(marker.getParent)
      fs.create(marker, true).close()
    }
    BatchStats(batchId, nCandidates, nContaminated,
      nCandidates - nContaminated)
  }

  /** Start the composed admission monitor over a streaming
    * (doc_id, text) frame: quality gate → near-dup admission →
    * contamination check → durable append at `storePath`. The STATIC
    * `bench` frame is the frozen benchmark suite. The caller owns the
    * returned query.
    */
  def admit(docs: DataFrame, bench: DataFrame, storePath: String)(
      onBatch: BatchStats => Unit): StreamingQuery = {
    require(docs.isStreaming, "admit expects a streaming frame")
    require(!bench.isStreaming, "the benchmark suite is frozen")
    val benchSh = bench
      .select(col("doc_id").as("bench_id"),
        explode(Dedup.shingles(col("text"))).as("sh"))
      .cache()
    nearDedupedT(TextAnalysis.qualityKeep(docs)).toDF()
      .writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onBatch(applyBatch(storePath, benchSh, batch, batchId))
      }
      .start()
  }
}
