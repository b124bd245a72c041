package graft.operators

import org.apache.spark.sql.SparkSession

/** Lifecycle for the narrow mid-plan caches several operators pin
  * (`DistributedPrefix`'s ranged frame, `Dedup.semantic`'s cell
  * assignments, `Pq`'s residual frames, `Dedup.ngramJaccardPrefix`'s
  * sorted shingle hashes): Spark's `CacheManager` keys entries on the
  * canonicalized plan, so REPEATED runs of the same query reuse one
  * entry rather than accumulating — but each DISTINCT consumer plan
  * pins its own entry until the session ends. Batch drivers
  * (`Bench`, `Verify`) already clear between queries; a long-lived
  * session (`Serve`) should call [[release]] at its own quiet points
  * (e.g. after an analytics burst), accepting that the next query
  * per shape re-materializes its cache once.
  */
object OperatorCaches {

  /** Drop every cached frame in the session — operator-internal
    * caches included — and forget memoized trainer outputs. Safe at
    * any point: caching here is purely a performance discipline
    * (single materialization per query), never a correctness
    * dependency.
    */
  def release(s: SparkSession): Unit = {
    s.catalog.clearCache()
    trained.synchronized(trained.clear())
  }

  private val trained =
    scala.collection.mutable.LinkedHashMap.empty[String, AnyRef]

  /** Process-wide memo for COLLECTED trainer outputs (k-means
    * centroids, PQ codebooks, BPE merge lists) keyed by
    * (data dir, trainer, mode): training is deterministic over an
    * immutable lake path, so its driver-side result — always a
    * KB-scale local table (~C centroid rows, M·K codebook rows, the
    * merge list), never corpus data — is computed once per process
    * and replayed from memory by every later consumer. This is the
    * in-session half of the train-once story whose durable half is
    * the layout sidecars ([[graft.operators.Layout]]): a serving
    * session trains on first touch and every subsequent query — the
    * trained IVF probe, the residual coder, tokenization — reuses
    * the artifact instead of re-running Lloyd's/BPE rounds. Values
    * are plain Scala rows (session-independent); callers rebuild the
    * tiny DataFrame per use. Synchronized + reentrant (a trainer may
    * memo-read its own coarse quantizer); [[release]] clears it.
    */
  /** Count of memo MISSES (actual trainer runs) since process start —
    * observability for the serve-path release policy: a spec (or an
    * operator dashboard) asserts a concurrent query burst trained
    * once, not once per request.
    */
  private[graft] val trainerRuns =
    new java.util.concurrent.atomic.AtomicLong(0)

  private[operators] def trainedMemo[T <: AnyRef](key: String)(
      compute: => T): T = trained.synchronized {
    trained.getOrElseUpdate(key, {
      trainerRuns.incrementAndGet(); compute
    }).asInstanceOf[T]
  }
}
