package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Product-analytics operators over the event stream and order
  * history — sessionization, funnel conversion, last-touch
  * attribution, cohort retention. These are the behavioral queries a
  * reference user runs downstream of ingest (the reference's own
  * `/find` + extraction surface stops at retrieval; this pack is the
  * analysis layer a lakehouse adds on top). The attribution and
  * funnel operators have continuous twins
  * ([[graft.streaming.AttributionStream]],
  * [[graft.streaming.FunnelStream]]); sessions stream through
  * `EventStream.sessionAgg`.
  *
  * Shared exactness discipline: every timestamp enters arithmetic as
  * WHOLE MICROSECONDS (`unix_micros` here, `epoch_us` in the DuckDB
  * oracle) — never seconds-as-double, the classic cross-engine
  * rounding hazard. Orders within a user are totalized by
  * (ts_us, event_id) — event_id is unique — so session boundaries,
  * funnel step times and attribution picks are deterministic in both
  * engines.
  */
object Behavior {

  /** Session gap: a new session starts after 30 minutes of
    * inactivity (the industry-standard cut, in microseconds). */
  val SessionGapUs: Long = 30L * 60 * 1000000

  /** Graded `events_sessionize`: per-user session statistics under
    * the [[SessionGapUs]] inactivity rule — session count, event
    * volume, the largest session, and total engaged seconds. The
    * boundary marker is one `lag` + one running `sum` over the SAME
    * user-partitioned window (a billion users = a billion small
    * partitions — the partition key does the scaling; nothing here
    * is a global window), then two hash aggregations.
    *
    * Engaged time sums per-session (last − first) microsecond spans
    * exactly and converts to whole seconds with ONE integer
    * division at the end — summing per-session seconds instead
    * would compound truncation error across sessions.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame =
    sessionizeFor(Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us")))

  /** The session-boundary marking [[sessionizeFor]] and [[topPaths]]
    * share — ONE definition of the session rule, so the two graded
    * views can never silently cut sessions differently. Input must
    * carry (user_id, event_id, ts_us); other columns pass through;
    * output adds `session_seq` (1-based per user). A gap of EXACTLY
    * [[SessionGapUs]] stays in-session; the rule is strictly greater.
    */
  private def sessionMarked(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > SessionGapUs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("is_new")).over(run))
  }

  /** [[sessionize]] over any (user_id, event_id, ts_us) frame — the
    * planted-boundary spec seam. */
  private[operators] def sessionizeFor(events: DataFrame): DataFrame = {
    val sessions = sessionMarked(events)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("ts_us")) - min(col("ts_us"))).as("dur_us"))
    sessions.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("n_events")).as("max_session_events"),
        expr("sum(dur_us) div 1000000").as("total_dur_s"))
      .orderBy(col("user_id"))
  }

  /** The ordered funnel steps [[funnel]] measures. */
  val FunnelSteps: Seq[String] = Seq("view", "click", "purchase")

  /** Graded `events_funnel`: strict-order funnel conversion — how
    * many users performed view, then click strictly after their
    * FIRST view, then purchase strictly after that first qualifying
    * click (the standard first-touch funnel semantics: each step
    * anchors on the earliest event that satisfies the previous
    * step). Output is one row per step with the user count and the
    * step-over-step conversion rate.
    *
    * Scale shape: one per-user min-aggregation per step plus one
    * equi-join on user_id per step — all map-side combinable, all
    * shuffles on the same key (co-partitioned chain); no window over
    * the corpus, no self-join of events against events at event
    * grain. The closing 3-row lag window is a constant-size frame.
    */
  def funnel(s: SparkSession, dir: String): DataFrame =
    funnelFor(Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")))

  /** [[funnel]] over any (user_id, event_type, us) frame — the spec
    * seam (a click BEFORE the user's first view must not count). */
  private[operators] def funnelFor(e: DataFrame): DataFrame = {
    val steps = FunnelSteps.zipWithIndex
    val counts = steps.foldLeft(
        (Option.empty[DataFrame], Seq.empty[DataFrame])) {
      case ((prev, acc), (step, idx)) =>
        val hits = e.filter(col("event_type") === step)
        val anchored = prev match {
          case None => hits
          case Some(p) =>
            hits.join(p.select(col("user_id"), col("anchor_us")),
                Seq("user_id"))
              .filter(col("us") > col("anchor_us"))
        }
        val users = anchored.groupBy(col("user_id"))
          .agg(min(col("us")).as("anchor_us"))
        val row = users.agg(count(lit(1)).as("n_users"))
          .select(lit(idx + 1).as("step_idx"), lit(step).as("step"),
            col("n_users"))
        (Some(users), acc :+ row)
    }._2
    val all = counts.reduce(_ unionByName _)
    val w3 = Window.orderBy(col("step_idx")) // 3 rows — constant frame
    all
      .withColumn("prev_n", lag(col("n_users"), 1).over(w3))
      .withColumn("p_conv",
        when(col("step_idx") === 1, lit(1.0))
          // a dead previous step converts nobody — 0.0, not a
          // divide-by-zero (ANSI mode throws on an empty corpus)
          .when(col("prev_n") === 0, lit(0.0))
          .otherwise(round(col("n_users").cast("double")
            / col("prev_n").cast("double"), 6)))
      .drop("prev_n")
      .orderBy(col("step_idx"))
  }

  /** Attribution lookback: a purchase converts for a touch at most
    * this many microseconds earlier (7 days). */
  val AttributionWindowUs: Long = 7L * 24 * 3600 * 1000000

  /** Graded `events_attribution`: last-touch revenue attribution —
    * every purchase is credited to the user's most recent
    * NON-purchase event within [[AttributionWindowUs]], or to
    * `direct` when none qualifies. One user-partitioned window pass
    * (two `last(_, ignoreNulls)` over the strictly-preceding frame)
    * plus one channel aggregation; revenue is exact cents.
    */
  def attribution(s: SparkSession, dir: String): DataFrame =
    attributionFor(Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("us")))

  /** [[attribution]] over any (user_id, event_id, event_type, value,
    * us) frame — the spec seam (a touch older than the lookback, or
    * a purchase-only history, must credit `direct`). */
  private[graft] def attributionFor(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("touch_type",
        when(col("event_type") =!= "purchase", col("event_type")))
      .withColumn("touch_us",
        when(col("event_type") =!= "purchase", col("us")))
      .withColumn("last_touch", last(col("touch_type"), true).over(w))
      .withColumn("last_touch_us", last(col("touch_us"), true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        when(col("last_touch").isNotNull &&
          col("us") - col("last_touch_us") <= AttributionWindowUs,
          col("last_touch")).otherwise(lit("direct")).as("channel"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("cents")).as("revenue_cents"))
      .orderBy(col("channel"))
  }

  /** Paths reported by [[topPaths]]. */
  val PathTop = 20

  /** Hard cap on events contributing to one session's path: a human
    * session is dozens of events; past this many the PREFIX is the
    * path (identical truncation pinned in the DuckDB oracle). The cap
    * exists for the adversarial key — a bot/replay session with 10⁵+
    * events is exactly the skew shape the rest of the repo defends
    * against (`SemCellCap`, `MaxShingleDf`), and an uncapped
    * per-session collect would hand it an executor OOM. */
  val PathMaxLen = 64

  /** Graded `events_top_paths`: the most common within-session
    * event-type sequences — path analysis, the product-analytics
    * staple one level up from [[graft.operators.Temporal]]'s
    * first-order transition matrix (which only sees adjacent pairs;
    * paths see the whole session). Sessions are cut by the
    * [[SessionGapUs]] rule, each session's FIRST [[PathMaxLen]]
    * events' types are joined in (ts, event_id) order into a
    * `>`-separated path, and the top [[PathTop]] paths are reported
    * with exact counts.
    *
    * Scale shape: the session cut is the [[sessionizeFor]] window
    * pass (user-partitioned); rows are then rank-filtered to the
    * first [[PathMaxLen]] per session BEFORE the path aggregation,
    * so the `collect_list` buffer is bounded by construction — a
    * hot bot session costs a (disk-spillable) window sort, never an
    * unbounded agg buffer (BehaviorSpec plants a 100k-event session
    * to prove both the truncation and the completion). Path counts
    * are then a Zipf-light vocab-sized table and the top-k a
    * TakeOrderedAndProject.
    */
  def topPaths(s: SparkSession, dir: String): DataFrame =
    topPathsFor(Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us")))

  /** [[topPaths]] over any (user_id, event_id, event_type, ts_us)
    * frame — the planted-bot-session spec seam. */
  private[operators] def topPathsFor(events: DataFrame): DataFrame = {
    val inSession = Window.partitionBy(col("user_id"), col("session_seq"))
      .orderBy(col("ts_us"), col("event_id"))
    val paths = sessionMarked(events)
      .withColumn("pos", row_number().over(inSession))
      .filter(col("pos") <= PathMaxLen)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(concat_ws(">",
        transform(
          array_sort(collect_list(struct(col("ts_us"), col("event_id"),
            col("event_type")))),
          x => x.getField("event_type"))).as("path"))
    paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(PathTop)
  }

  /** Days in the rolling active-user window (WAU). */
  val StickinessWindowDays = 7

  /** Graded `events_stickiness`: DAU / WAU engagement — per observed
    * day, the distinct users active that day, the distinct users
    * active in the trailing [[StickinessWindowDays]]-day window, and
    * their ratio (the classic stickiness KPI).
    *
    * Scale shape — no windowed COUNT DISTINCT (which would serialize
    * per-day windows over the user corpus): the (user, day) activity
    * pairs are distinct-collapsed once, then each pair EXPLODES into
    * the ≤ 7 window-ending days it contributes to (a bounded narrow
    * fanout), is semi-join-pruned to observed days, and one more
    * distinct + count per day yields the WAU exactly. Two hash
    * shuffles, both on high-cardinality keys; the DuckDB oracle runs
    * the equivalent range join.
    */
  def stickiness(s: SparkSession, dir: String): DataFrame =
    stickinessFor(Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct())

  /** [[stickiness]] over any DISTINCT (user_id, day) activity frame —
    * the seam the streamed view composes with
    * ([[graft.streaming.StickinessStream]] maintains exactly this
    * frame incrementally and reuses this readout verbatim). */
  def stickinessFor(ud: DataFrame): DataFrame = {
    val days = ud.select(col("day")).distinct()
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"), explode(sequence(col("day"),
        date_add(col("day"), StickinessWindowDays - 1))).as("wday"))
      .join(days.toDF("wday"), Seq("wday"), "left_semi")
      .distinct()
      .groupBy(col("wday")).agg(count(lit(1)).as("wau"))
      .withColumnRenamed("wday", "day")
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau").cast("double"), 6)
          .as("stickiness"))
      .orderBy(col("day"))
  }

  /** Graded `orders_cohort_retention`: the classic cohort-retention
    * matrix — customers grouped by the month of their FIRST order
    * (the cohort), counted per month-offset they placed any later
    * order. Months are carried as the exact integer index
    * `year·12 + (month−1)`, so the offset is pure integer
    * subtraction in both engines (never `months_between`, whose
    * fractional semantics differ).
    *
    * Scale shape: first-order month is one min-aggregation on
    * o_custkey; activity joins back on the SAME key (co-partitioned,
    * AQE broadcasts the months-sized cohort frame when it fits);
    * the (customer, cohort, offset) distinct and the closing counts
    * are hash aggregations. Nothing is windowed over the order
    * corpus.
    */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val ym = (year(col("o_orderdate")) * 12 +
      month(col("o_orderdate")) - 1).cast("long")
    cohortRetentionFor(Tables.load(s, dir, "orders")
      .select(col("o_custkey"), ym.as("ym")))
  }

  /** [[cohortRetention]] over any (o_custkey, ym) frame — the spec
    * seam (planted cohorts with known retention cells). */
  private[operators] def cohortRetentionFor(o: DataFrame): DataFrame = {
    val first = o.groupBy(col("o_custkey"))
      .agg(min(col("ym")).as("cohort_ym"))
    val sizes = first.groupBy(col("cohort_ym"))
      .agg(count(lit(1)).as("cohort_n"))
    val active = o.join(first, Seq("o_custkey"))
      .select(col("o_custkey"), col("cohort_ym"),
        (col("ym") - col("cohort_ym")).as("offset_m"))
      .distinct()
      .groupBy(col("cohort_ym"), col("offset_m"))
      .agg(count(lit(1)).as("n_active"))
    active.join(sizes, Seq("cohort_ym"))
      .select(
        expr("cohort_ym div 12").as("cohort_year"),
        (col("cohort_ym") % 12 + 1).as("cohort_month"),
        col("offset_m"), col("n_active"), col("cohort_n"),
        round(col("n_active").cast("double")
          / col("cohort_n").cast("double"), 6).as("retention"))
      .orderBy(col("cohort_year"), col("cohort_month"), col("offset_m"))
  }
}
