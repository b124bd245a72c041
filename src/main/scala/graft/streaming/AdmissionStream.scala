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
  * cached index; each batch lands in the store as an OVERWRITE of its
  * own batchId-keyed partition directory, so `foreachBatch`'s
  * at-least-once replay is idempotent at EVERY crash point — no
  * append/commit-marker window, no repair verb needed.
  * AdmissionStreamSpec pins each rejection class end-to-end, the
  * store contents, and the replay no-op.
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
    * benchmark index, land survivors in the store idempotently, and
    * return the accounting (reused by the spec for the replay pin).
    *
    * Durability is per-batch OVERWRITE into a batchId-keyed partition
    * directory (`batch=<id>/`), not append-plus-commit-marker: an
    * append guarded by a marker leaves a crash window (append commits,
    * process dies before the marker lands, replay re-appends — silent
    * duplicate documents, no recovery verb). Overwrite of a
    * deterministic batch is idempotent under ANY crash point — a
    * replay rewrites the same rows into the same directory — so
    * at-least-once foreachBatch delivery composes to exactly-once
    * store contents with no side ledger to repair. Readers see one
    * partitioned parquet table at `storePath` (the batch id surfaces
    * as a partition column — free replay lineage).
    */
  private[graft] def applyBatch(storePath: String, benchSh: DataFrame,
      batch: DataFrame, batchId: Long): BatchStats = {
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
    val nStored = nCandidates - nContaminated
    // an all-rejected batch writes nothing (an empty partition dir
    // would add schema-less files to partition discovery)
    if (nStored > 0)
      admitted.write.mode("overwrite").parquet(s"$storePath/batch=$batchId")
    BatchStats(batchId, nCandidates, nContaminated, nStored)
  }

  /** Batch twin of the composed admission pipeline: the same quality
    * gate, the same per-bucket admission fold (flatMapGroupsWithState
    * executes on batch frames with empty initial state — the
    * [[DocStream.nearDedupedMd5]] mechanism), the same contamination
    * anti-join — applied to the whole corpus at once. Because
    * [[DocStream.admitFold]] processes each bucket in ascending doc_id
    * order and threads the FIFO-bounded state across invocations, a
    * stream delivering the corpus as doc_id-ordered chunks admits
    * EXACTLY this set: the sequential fold over chunks equals the
    * one-shot fold. StreamingAdmissionDemoSpec asserts that
    * equivalence end-to-end on the reference's fixture corpus.
    */
  def admittedBatch(docs: DataFrame, bench: DataFrame): DataFrame = {
    val benchSh = bench.select(col("doc_id").as("bench_id"),
      explode(Dedup.shingles(col("text"))).as("sh"))
    val cands = nearDedupedT(TextAnalysis.qualityKeep(docs)).toDF()
    val contaminated = TextAnalysis.contaminationOf(
      cands.select(col("doc_id").as("train_id"),
        explode(Dedup.shingles(col("text"))).as("sh")),
      benchSh)
      .select(col("train_id").as("doc_id")).distinct()
    cands.join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("text"), col("bucket"),
        col("n_compared"))
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
