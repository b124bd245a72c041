package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming semantics: the same logic applied to a MemoryStream must
  * produce what the batch plan produces (the unified-model contract),
  * plus watermark/state behavior the batch oracle can't see.
  */
class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Int): Timestamp =
    new Timestamp(1704067200000L + minutes * 60000L) // 2024-01-01 00:00 UTC

  private val sample = Seq(
    (ts(0), 1L, "click", 1.0), (ts(5), 1L, "click", 2.0),
    (ts(30), 1L, "view", 3.0), // still session 1 for user 1? gap 25m -> new
    (ts(62), 2L, "click", 4.0), (ts(65), 2L, "click", 5.0),
    (ts(200), 2L, "buy", 6.0))

  private def sampleDf =
    sample.toDF("ts", "user_id", "event_type", "value")

  test("streaming windowed agg == batch windowed agg on same data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val q = EventStream.streamingWindowedAgg(
      mem.toDF().toDF("ts", "user_id", "event_type", "value"))
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(sample: _*)
      q.processAllAvailable()
      val streamed = spark.table("win_out")
        .orderBy("window_start", "event_type").collect()
      val batch = EventStream.windowedAgg(sampleDf)
        .orderBy("window_start", "event_type").collect()
      assert(streamed.sameElements(batch))
      assert(batch.map(_.getAs[Long]("n_events")).sum == sample.size)
    } finally q.stop()
  }

  test("streaming sliding windows == batch sliding windows (2 windows/event)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val q = EventStream.slidingAgg(
      mem.toDF().toDF("ts", "user_id", "event_type", "value"))
      .writeStream.format("memory").queryName("slide_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(sample: _*)
      q.processAllAvailable()
      val streamed = spark.table("slide_out")
        .orderBy("window_start", "event_type").collect()
      val batch = EventStream.slidingAgg(sampleDf)
        .orderBy("window_start", "event_type").collect()
      assert(streamed.sameElements(batch))
      // 1h window / 30m slide: every event lands in exactly 2 windows
      assert(batch.map(_.getAs[Long]("n_events")).sum == 2 * sample.size)
    } finally q.stop()
  }

  test("streaming trending: counts stream, rank applies per foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    @volatile var latest: Array[org.apache.spark.sql.Row] = Array.empty
    val q = EventStream.trendingCounts(
      mem.toDF().toDF("ts", "user_id", "event_type", "value"))
      .writeStream.outputMode(OutputMode.Complete())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        latest = EventStream.rankTrending(batch)
          .orderBy("window_start", "rank").collect()
      }.start()
    try {
      mem.addData(sample: _*)
      q.processAllAvailable()
      val batchForm = EventStream.trending(sampleDf)
        .orderBy("window_start", "rank").collect()
      assert(latest.sameElements(batchForm))
      assert(latest.forall(_.getAs[Int]("rank") <= 3))
    } finally q.stop()
  }

  test("streaming session windows merge within gap, split past it") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val q = EventStream.streamingSessionAgg(
      mem.toDF().toDF("ts", "user_id", "event_type", "value"))
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(sample: _*)
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .orderBy("user_id", "session_start").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events")))
      // user 1: (0,5) merge, 30 splits; user 2: (62,65) merge, 200 splits
      assert(rows.toSeq == Seq((1L, 2L), (1L, 1L), (2L, 2L), (2L, 1L)))
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-user counters across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double, String)]
    val q = EventStream.userActivity(mem.toDS())
      .writeStream.format("memory").queryName("ua_out")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData((1L, 1.0, "click"), (1L, 2.0, "view"))
      q.processAllAvailable()
      mem.addData((1L, 3.0, "buy")) // second micro-batch: state carries over
      q.processAllAvailable()
      val last = spark.table("ua_out").filter(col("user_id") === 1L)
        .orderBy(col("n_events").desc).collect().head
      assert(last.getAs[Long]("n_events") == 3L)
      assert(last.getAs[Double]("total_value") == 6.0)
      assert(last.getAs[String]("last_type") == "buy")
    } finally q.stop()
  }

  test("stream-stream join: clicks correlate with buys within 30 minutes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Long, String, Double)]
    val q = EventStream.clickToBuy(
      mem.toDF().toDF("ts", "event_id", "user_id", "event_type", "value"))
      .writeStream.format("memory").queryName("join_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (ts(0), 1L, 7L, "click", 0.0),
        (ts(10), 2L, 7L, "purchase", 9.99),   // within 30m of click 1 -> joins
        (ts(50), 3L, 7L, "purchase", 5.0),    // 50m after click 1 -> no join
        (ts(5), 4L, 8L, "click", 0.0))   // other user, no buy
      q.processAllAvailable()
      val rows = spark.table("join_out").collect()
        .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("buy_id")))
      assert(rows.toSeq == Seq((1L, 2L)))
    } finally q.stop()
  }

  test("streaming dedup suppresses duplicate event ids within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val q = EventStream.dedupedEvents(
      mem.toDF().toDF("ts", "event_id", "event_type", "value"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((ts(0), 1L, "click", 1.0), (ts(1), 1L, "click", 1.0),
        (ts(2), 2L, "view", 2.0))
      q.processAllAvailable()
      mem.addData((ts(3), 2L, "view", 2.0), (ts(4), 3L, "buy", 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_out")
        .select("event_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L)) // dups dropped across batches
    } finally q.stop()
  }

  test("append mode: watermark closes windows and drops late data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val q = EventStream.streamingWindowedAgg(
      mem.toDF().toDF("ts", "user_id", "event_type", "value"))
      .writeStream.format("memory").queryName("late_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two on-time clicks in the [00:00, 01:00) window
      mem.addData((ts(0), 1L, "click", 1.0), (ts(10), 1L, "click", 2.0))
      q.processAllAvailable()
      // batch 2: an event 200m in advances the watermark to 140m,
      // past the first window's end -> [00:00,01:00) emits and seals
      mem.addData((ts(200), 2L, "buy", 5.0))
      q.processAllAvailable()
      // batch 3: a LATE click stamped inside the sealed window must be
      // DROPPED by the watermark, not re-open or mutate the result
      mem.addData((ts(10), 3L, "click", 99.0))
      q.processAllAvailable()
      val rows = spark.table("late_out").collect()
        .map(r => (r.getAs[Timestamp]("window_start"),
          r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
          r.getAs[Double]("total_value")))
      // only the sealed window is in the output (the 200m event's own
      // window stays open: watermark 140m < its 240m end), and its
      // count/sum reflect exactly the two on-time rows
      assert(rows.toSeq == Seq((ts(0), "click", 2L, 3.0)))
    } finally q.stop()
  }

  test("file-source streaming read over an events drop-directory") {
    // stream from a directory of event files (the production shape:
    // new files land, micro-batches pick them up)
    val dir = java.nio.file.Files.createTempDirectory("events-drop")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("part-0.parquet"))
    val stream = EventStream.readEvents(spark, dir.toString)
    assert(stream.isStreaming)
    val q = EventStream.streamingWindowedAgg(
      graft.Tables.restoreTs(stream))
      .writeStream.format("memory").queryName("file_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val n = spark.table("file_out")
        .agg(sum("n_events")).head().getLong(0)
      assert(n == graft.Tables.events(spark, sf).count())
    } finally q.stop()
  }
}
