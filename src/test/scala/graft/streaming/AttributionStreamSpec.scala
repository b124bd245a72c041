package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Behavior

/** The streamed attribution must aggregate to the batch operator's
  * channel totals at every batch boundary, for ANY in-order split of
  * the feed — including one that parks a user's touch and purchase
  * in different micro-batches (state must carry the touch across).
  */
class AttributionStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed conversions equal the batch attribution on the " +
    "graded corpus under ragged batch splits") {
    // the corpus feed, per-user in-order (global (us, event_id) sort)
    val feed = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("us"))
      .orderBy(col("us"), col("event_id"))
      .as[(Long, Long, String, Double, Long)]
      .collect()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Double, Long)]
    val q = AttributionStream.attributed(mem.toDS())
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      // three ragged waves — the middle cut lands mid-corpus, so many
      // users straddle the boundary with state carrying their touch
      val cuts = Seq(feed.length / 3, 2 * feed.length / 3, feed.length)
      var from = 0
      cuts.foreach { to =>
        mem.addData(feed.slice(from, to).toIndexedSeq)
        q.processAllAvailable()
        from = to
      }
      val streamed = spark.table("attr_out")
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("cents")).as("revenue_cents"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      val batch = Behavior.attribution(spark, sf).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("a touch older than the lookback, or a purchase-first user, " +
    "credits direct — across a batch boundary") {
    implicit val sqlCtx = spark.sqlContext
    val W = AttributionStream.LookbackUs
    val mem = MemoryStream[(Long, Long, String, Double, Long)]
    val q = AttributionStream.attributed(mem.toDS())
      .writeStream.format("memory").queryName("attr_edge")
      .outputMode("append").start()
    try {
      // batch 1: touches only (user 1 click at 0; user 2 nothing)
      mem.addData((1L, 1L, "click", 0.0, 0L))
      q.processAllAvailable()
      // batch 2: user 1 buys at exactly W (attributed) and W+1 later
      // (direct); user 2 buys with no history (direct)
      mem.addData((1L, 2L, "purchase", 10.0, W),
        (1L, 3L, "purchase", 20.0, W + 1), (2L, 4L, "purchase", 30.0, 5L))
      q.processAllAvailable()
      val got = spark.table("attr_edge").as[Attributed].collect()
        .map(a => a.event_id -> ((a.channel, a.cents))).toMap
      assert(got == Map(
        2L -> (("click", 1000L)),
        3L -> (("direct", 2000L)),
        4L -> (("direct", 3000L))), got.toString)
    } finally q.stop()
  }

  test("negative amounts (refunds) round half-away-from-zero, " +
    "identically to the batch operator's round(value*100, 0)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Double, Long)]
    val q = AttributionStream.attributed(mem.toDS())
      .writeStream.format("memory").queryName("attr_neg")
      .outputMode("append").start()
    try {
      // -0.125*100 = -12.5 cents: HALF_UP (away from zero) → -13,
      // where math.round(-12.5) would give -12 — the exact divergence
      // the parity contract forbids
      mem.addData((1L, 1L, "click", 0.0, 0L),
        (1L, 2L, "purchase", -0.125, 10L),
        (1L, 3L, "purchase", 0.125, 20L))
      q.processAllAvailable()
      val got = spark.table("attr_neg").as[Attributed].collect()
        .map(a => a.event_id -> a.cents).toMap
      assert(got == Map(2L -> -13L, 3L -> 13L), got.toString)
      // and the batch operator agrees on the same frame
      val batch = Behavior.attributionFor(Seq(
        (1L, 1L, "click", 0.0, 0L),
        (1L, 2L, "purchase", -0.125, 10L),
        (1L, 3L, "purchase", 0.125, 20L))
        .toDF("user_id", "event_id", "event_type", "value", "us"))
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(batch == Map("click" -> 0L), batch.toString)
    } finally q.stop()
  }
}
