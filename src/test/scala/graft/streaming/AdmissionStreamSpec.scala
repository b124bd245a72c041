package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** The composed intake monitor: every rejection class exercised end to
  * end (quality, cross-batch near-dup, benchmark contamination), the
  * durable store holding exactly the survivors, and the commit-marker
  * replay no-op.
  */
class AdmissionStreamSpec extends SparkSpec {
  import spark.implicits._

  private val benchText =
    "the quick brown fox jumps over the lazy dog while autumn leaves drift quietly past"
  private val good1 =
    "fresh analysis of harvest records shows steady yields across northern valley farms this season"
  private val good2 =
    "migratory birds return earlier each spring according to decades of careful observation logs"
  // quality-passing but contains a long verbatim benchmark run
  private val leaky =
    "the quick brown fox jumps over the lazy dog said the exam answer key verbatim"

  test("quality, near-dup, and contamination rejections compose; the " +
      "store holds exactly the survivors; replay cannot double-append") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stats = mutable.ArrayBuffer.empty[AdmissionStream.BatchStats]
    val store = java.nio.file.Files
      .createTempDirectory("admission-store").toString + "/curated"
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val q = AdmissionStream.admit(
      mem.toDF().toDF("doc_id", "text"), bench, store) {
      b => stats.synchronized { stats += b }
    }
    try {
      mem.addData((1L, good1), (2L, "short"), (3L, leaky))
      q.processAllAvailable()
      // doc 4 is a verbatim re-crawl of doc 1 — cross-batch near-dup
      mem.addData((4L, good1), (5L, good2))
      q.processAllAvailable()
    } finally q.stop()

    val stored = spark.read.parquet(store)
    assert(stored.select("doc_id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 5L),
      "store must hold exactly the quality-passing, novel, clean docs")
    // the stored rows carry the full text (the store is the curated
    // corpus, not an id list)
    assert(stored.filter(col("doc_id") === 1L).head
      .getAs[String]("text") == good1)

    val byBatch = stats.synchronized(stats.sortBy(_.batchId).toVector)
    assert(byBatch.map(_.nStored).sum == 2)
    assert(byBatch.map(_.nContaminated).sum == 1,
      s"exactly the leaky doc flags: $byBatch")
    // doc 2 (quality) and doc 4 (near-dup) never even reach the
    // contamination stage
    assert(byBatch.map(_.nCandidates).sum == 3, s"$byBatch")

    // at-least-once replay: re-applying an already-committed batchId
    // overwrites its own partition with the same rows — never appends
    val benchSh = bench.select(col("doc_id").as("bench_id"),
      explode(Dedup.shingles(col("text"))).as("sh"))
    val replayBatch = Seq((1L, good1, 0L, 0))
      .toDF("doc_id", "text", "bucket", "n_compared")
    val before = spark.read.parquet(store).count()
    AdmissionStream.applyBatch(store, benchSh, replayBatch,
      byBatch.head.batchId)
    assert(spark.read.parquet(store).count() == before,
      "replayed batchId must leave the store unchanged")

    // crash window the r9 marker scheme left open: the batch's data
    // lands but the process dies before durability bookkeeping
    // completes. Corrupt batch 0's partition to a half-written state
    // (an extra duplicated row), then replay — overwrite heals it
    // instead of double-appending
    replayBatch.union(replayBatch).write.mode("overwrite")
      .parquet(s"$store/batch=${byBatch.head.batchId}")
    assert(spark.read.parquet(store).count() == before + 1,
      "precondition: the simulated partial state is visible")
    AdmissionStream.applyBatch(store, benchSh, replayBatch,
      byBatch.head.batchId)
    assert(spark.read.parquet(store).count() == before,
      "replay after a crash mid-batch must restore exact contents")
    assert(spark.read.parquet(store)
      .filter(col("doc_id") === 1L).count() == 1,
      "no silent duplicate documents after crash+replay")
  }
}
