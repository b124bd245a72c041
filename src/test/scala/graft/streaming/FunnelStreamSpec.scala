package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Behavior

/** Streamed step completions must count up to the batch funnel's
  * per-step user counts at every batch boundary, under any in-order
  * split — including a user whose view and click arrive in different
  * micro-batches (the state must carry the anchor across).
  */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed completions equal the batch funnel counts on the " +
    "graded corpus under ragged splits") {
    val feed = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .orderBy(col("us"), col("event_id"))
      .as[(Long, Long, String, Long)]
      .collect()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Long)]
    val q = FunnelStream.completions(mem.toDS())
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      val cuts = Seq(feed.length / 4, feed.length / 2,
        3 * feed.length / 4, feed.length)
      var from = 0
      cuts.foreach { to =>
        mem.addData(feed.slice(from, to).toIndexedSeq)
        q.processAllAvailable()
        from = to
      }
      val streamed = spark.table("funnel_out")
        .groupBy(col("step_idx")).agg(count(lit(1)).as("n_users"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val batch = Behavior.funnel(spark, sf).collect()
        .map(r => r.getInt(0) -> r.getLong(2)).toMap
      assert(streamed == batch)
      // at most one completion per (user, step) ever
      val dups = spark.table("funnel_out")
        .groupBy(col("user_id"), col("step_idx"))
        .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
      assert(dups == 0, "a step completed twice for one user")
    } finally q.stop()
  }

  test("strict order across batches: a click arriving before any " +
    "view never completes; a tie with the anchor never advances") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Long)]
    val q = FunnelStream.completions(mem.toDS())
      .writeStream.format("memory").queryName("funnel_edge")
      .outputMode("append").start()
    try {
      // user 1: click first (no view yet) — nothing emitted
      mem.addData((1L, 1L, "click", 5L))
      q.processAllAvailable()
      assert(spark.table("funnel_edge").count() == 0)
      // view at 10 → step 1; click at 10 TIES the anchor → no step 2
      mem.addData((1L, 2L, "view", 10L), (1L, 3L, "click", 10L))
      q.processAllAvailable()
      val afterTie = spark.table("funnel_edge").as[StepCompletion]
        .collect().map(c => c.step_idx -> c.us).toMap
      assert(afterTie == Map(1 -> 10L), afterTie.toString)
      // a later click advances; then a purchase after it completes
      mem.addData((1L, 4L, "click", 11L), (1L, 5L, "purchase", 12L))
      q.processAllAvailable()
      val all = spark.table("funnel_edge").as[StepCompletion]
        .collect().map(c => c.step_idx -> c.us).toMap
      assert(all == Map(1 -> 10L, 2 -> 11L, 3 -> 12L), all.toString)
    } finally q.stop()
  }

  test("a converted user returning in a later batch never re-enters " +
    "the funnel (terminal state is retained, not dropped)") {
    // the case that forbids state.remove() at the terminal step: if
    // the converted user's state were dropped, this second visit
    // would restart at step 0 and double-count every step, breaking
    // streamed ≡ batch (batch anchors each user at most once/step)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Long)]
    val q = FunnelStream.completions(mem.toDS())
      .writeStream.format("memory").queryName("funnel_return")
      .outputMode("append").start()
    try {
      mem.addData((1L, 1L, "view", 10L), (1L, 2L, "click", 20L),
        (1L, 3L, "purchase", 30L))
      q.processAllAvailable()
      assert(spark.table("funnel_return").count() == 3)
      // the user comes back next week and browses again
      mem.addData((1L, 4L, "view", 1000L), (1L, 5L, "click", 1010L),
        (1L, 6L, "purchase", 1020L))
      q.processAllAvailable()
      val n = spark.table("funnel_return").count()
      assert(n == 3, s"returning converted user re-emitted: $n rows")
    } finally q.stop()
  }
}
