package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the `events` table.
  *
  * The reference has no dataflow streaming at all ("streaming" there
  * means lazy InputStream I/O, SURVEY.md §2.3) — this module is the
  * north-star extension, built the Structured-Streaming way: logic is
  * written ONCE against a DataFrame and applied identically to batch
  * (oracle-checkable `SparkEntry` queries) and to `readStream` sources
  * (watermarked incremental execution). That unification is the whole
  * argument for Spark here: the 100 TB batch plan and the live pipeline
  * are the same plan.
  *
  * State scale notes: tumbling windows keyed by (window, event_type)
  * carry bounded state once the 1h watermark expires old windows;
  * session windows are merged per (user, session) and also
  * watermark-expired; the custom counter uses mapGroupsWithState with
  * processing-time timeout so abandoned users age out.
  */
object EventStream {

  // --- shared batch/stream logic -------------------------------------

  /** Tumbling 1-hour windows per event_type: count + exact decimal sum
    * (decimal, not double, so the result is order-independent and
    * reproducible under any partial-aggregation schedule).
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // exact decimal sum (order-independent under partial agg /
        // streaming increments), emitted as double — the oracle-safe
        // output representation
        sum(col("value").cast("decimal(12,2)")).cast("double")
          .as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Sliding 1-hour windows every 30 minutes per event_type: each
    * event lands in exactly 2 overlapping windows (window/slide). Same
    * plan batch or streaming; streaming state is bounded by the
    * watermark exactly like the tumbling form (2× rows in flight).
    */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"))

  /** Trending, stage 1: per-hour-window counts per event type. This
    * half is stream-safe (a time-window aggregation); the RANK half is
    * not — `row_number` over a non-time window is unsupported in
    * streaming — so in a live pipeline run THIS as the streaming agg
    * and apply `rankTrending` inside `foreachBatch` on each emitted
    * result (rank after the watermark closes the window).
    */
  def trendingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"))

  /** Trending, stage 2: top-3 event types per window (ties broken by
    * name) — a batch transform over the tiny aggregated grain.
    */
  def rankTrending(counts: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start"))
      .orderBy(col("n_events").desc, col("event_type"))
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
  }

  /** Batch composition of both stages. */
  def trending(events: DataFrame): DataFrame =
    rankTrending(trendingCounts(events))

  /** Per-user sessionization with a 10-minute gap (built-in
    * `session_window` — merged incrementally under streaming).
    */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))

  // --- streaming entry points ----------------------------------------

  /** Watermarked streaming variant of `windowedAgg`. */
  def streamingWindowedAgg(events: DataFrame): DataFrame =
    windowedAgg(events.withWatermark("ts", "1 hour"))

  /** Watermarked streaming variant of `sessionAgg`. */
  def streamingSessionAgg(events: DataFrame): DataFrame =
    sessionAgg(events.withWatermark("ts", "10 minutes"))

  /** File-source stream over a directory of event parquet (schema must
    * be supplied for streaming reads; new files are discovered per
    * micro-batch).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    spark.readStream.schema(schema).parquet(dir)
  }

  /** Stream-stream inner join: correlate each user's clicks with their
    * buys within 30 minutes. Both sides are watermarked so the join
    * state is bounded — Spark retains only rows that can still match
    * under the time-range condition, the canonical streaming-join
    * pattern for funnel/attribution analysis.
    */
  def clickToBuy(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "1 hour")
    val buys = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("buy_user"), col("ts").as("buy_ts"),
        col("event_id").as("buy_id"), col("value"))
      .withWatermark("buy_ts", "1 hour")
    clicks.join(buys,
      col("user_id") === col("buy_user") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr("interval 30 minutes"),
      "inner")
      .select(col("user_id"), col("click_id"), col("buy_id"),
        col("click_ts"), col("buy_ts"), col("value"))
  }

  /** Streaming exact dedup: drop events whose `event_id` was already
    * seen, with state bounded by the watermark
    * (`dropDuplicatesWithinWatermark` — duplicates arriving within the
    * watermark window are suppressed, and state for expired windows is
    * reclaimed, so the operator runs forever on unbounded input).
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  // --- custom state: mapGroupsWithState ------------------------------

  case class UserActivity(user_id: Long, n_events: Long, total_value: Double,
      last_type: String)

  /** Running per-user activity counters via explicit state — the
    * `mapGroupsWithState` shape for logic window functions can't
    * express (cross-batch running state). At scale, pair with an
    * event-time timeout so abandoned keys expire with the watermark
    * (a processing-time timeout keeps the micro-batch engine scheduling
    * wake-ups, which also makes `processAllAvailable` never settle in
    * tests — hence NoTimeout in this self-contained example).
    */
  def userActivity(events: Dataset[(Long, Double, String)])
      : Dataset[UserActivity] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[UserActivity, UserActivity](
        GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[UserActivity]) =>
          val prev = state.getOption
            .getOrElse(UserActivity(uid, 0L, 0.0, ""))
          val next = rows.foldLeft(prev) { (acc, r) =>
            UserActivity(uid, acc.n_events + 1, acc.total_value + r._2, r._3)
          }
          state.update(next)
          next
      }
  }
}
