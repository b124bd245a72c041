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
    * caches included. Safe at any point: caching here is purely a
    * performance discipline (single materialization per query), never
    * a correctness dependency.
    */
  def release(s: SparkSession): Unit = s.catalog.clearCache()
}
