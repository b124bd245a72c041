package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** The Bloom-state novelty monitor's one-sided error contract: fresh
  * material scores 1, a verbatim re-crawl scores EXACTLY 0 (no false
  * negatives), and false positives can only undercount — all with
  * fixed-size state across batches.
  */
class NoveltyStreamSpec extends SparkSpec {
  import spark.implicits._

  test("fresh batch scores 1.0; re-crawl scores exactly 0; partially " +
      "new batch lands between; state stays one fixed-size filter") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val seenRows = mutable.ArrayBuffer.empty[NoveltyStream.BatchNovelty]
    val q = NoveltyStream.monitor(mem.toDF().toDF("doc_id", "text"))(
      b => seenRows.synchronized { seenRows += b })
    try {
      // wave 1: entirely fresh shingles — the empty filter has zero
      // set bits, so no false positive is even possible: exactly 1.0
      mem.addData((1L, "alpha beta gamma delta epsilon"))
      q.processAllAvailable()
      // wave 2: verbatim re-crawl — no false negatives means ZERO
      // novelty, exactly
      mem.addData((2L, "alpha beta gamma delta epsilon"))
      q.processAllAvailable()
      // wave 3: half old, half new material
      mem.addData((3L, "alpha beta gamma zeta eta theta iota"))
      q.processAllAvailable()
      val got = seenRows.synchronized(seenRows.sortBy(_.batchId).toVector)
      assert(got.length == 3, s"one measurement per wave: $got")
      assert(got(0).noveltyFrac == 1.0, s"fresh batch: $got")
      assert(got(0).nShingles == 3 && got(0).nNovel == 3)
      assert(got(1).noveltyFrac == 0.0 && got(1).nNovel == 0,
        s"re-crawl must score exactly 0: $got")
      assert(got(2).noveltyFrac > 0.0 && got(2).noveltyFrac < 1.0,
        s"partial novelty must land strictly between: $got")
      // replaying wave 2 against a state that saw wave 1 reproduces
      // the zero through the pure core
      val seen = new NoveltyStream.Seen(1L << 20, 0.01)
      NoveltyStream.measure(
        Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text"),
        seen, 0L)
      val replay = NoveltyStream.measure(
        Seq((2L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text"),
        seen, 1L)
      assert(replay.nNovel == 0 && replay.noveltyFrac == 0.0)
    } finally q.stop()
  }

  test("at-least-once replay of an already-merged batchId re-emits the " +
      "original result instead of re-measuring against its own shingles") {
    val seen = new NoveltyStream.Seen(1L << 20, 0.01)
    val batch = Seq((1L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val first = NoveltyStream.measure(batch, seen, 0L)
    assert(first.noveltyFrac == 1.0 && first.nNovel == 3)
    // foreachBatch retry: same batchId arrives again after the merge.
    // Without the guard the state already contains the batch's own
    // shingles and the re-measurement reports 0 — the guard re-emits
    // the cached pre-merge result
    val retried = NoveltyStream.measure(batch, seen, 0L)
    assert(retried == first,
      s"replayed batch must reproduce its original emission: $retried")
    // the NEXT batchId still measures against the merged state
    val next = NoveltyStream.measure(batch, seen, 1L)
    assert(next.nNovel == 0 && next.noveltyFrac == 0.0)
  }

  test("a STRICTLY older batchId is re-measured honestly, never handed " +
      "the latest batch's counts relabeled") {
    val seen = new NoveltyStream.Seen(1L << 20, 0.01)
    NoveltyStream.measure(
      Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text"),
      seen, 0L)
    val latest = NoveltyStream.measure(
      Seq((2L, "zeta eta theta iota kappa lambda mu")).toDF("doc_id", "text"),
      seen, 1L)
    assert(latest.nShingles == 5 && latest.nNovel == 5)
    // r9 bug: batchId 0 <= lastMerged hit the fast path and returned
    // batch 1's (5, 5) counts stamped batchId=0. The fix re-measures:
    // batch 0's own key count is exact, novelty honestly reads 0
    // (its shingles are already folded in), and the high-water mark
    // plus cached result stay at batch 1
    val older = NoveltyStream.measure(
      Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text"),
      seen, 0L)
    assert(older.batchId == 0L && older.nShingles == 3 && older.nNovel == 0,
      s"older replay must re-measure its own batch: $older")
    assert(seen.lastMerged == 1L, "high-water mark never regresses")
    val cached = NoveltyStream.measure(
      Seq((2L, "zeta eta theta iota kappa lambda mu")).toDF("doc_id", "text"),
      seen, 1L)
    assert(cached == latest, "latest id still re-emits its cached result")
  }
}
