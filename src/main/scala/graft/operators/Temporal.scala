package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal join pack: as-of join and range (band) join — operators
  * Spark lacks as primitives (SURVEY.md §2.3 extension surface), each
  * expressed as a plan whose cost model survives 100 TB.
  */
object Temporal {

  /** As-of join: for every purchase, the latest click by the same user
    * at or before the purchase time (DuckDB/kdb "ASOF JOIN" semantics,
    * inner form: purchases with no prior click drop).
    *
    * NOT implemented as an inequality join — a theta-join on
    * `user_id = user_id AND buy_ts >= click_ts` degenerates to a
    * per-user cartesian (every purchase × every earlier click) that
    * explodes on active users. Instead the classic single-shuffle
    * formulation: union both event kinds, hash-partition by user, sort
    * within partition by time, and carry the last-seen click forward
    * with a running `last(_, ignoreNulls)` window. One shuffle on
    * user_id, O(events) work, no fanout — the same plan shape at any
    * scale. Ordering (ts, event_type) puts a click before a purchase
    * at the same instant, matching ASOF's `>=`.
    */
  def asOfJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_type"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("click_ts",
        last(when(col("event_type") === "click", col("ts")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("click_ts").isNotNull)
      .select(col("user_id"), col("ts").as("buy_ts"), col("click_ts"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("click_ts")))
          .as("wait_s"),
        col("value"))
  }

  /** Graded `asof_join_native`: the same as-of workload served by the
    * first-class Catalyst operator ([[graft.plans.AsOfJoin]] —
    * logical node → strategy → per-partition merge exec) instead of
    * the union+window composition above. Same oracle, two different
    * execution strategies — exactly what the hash match should pin.
    * Times travel as `unix_micros` (the operator's LongType contract).
    */
  def asOfJoinNative(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val buys = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("buy_ts"), col("value"),
        unix_micros(col("ts")).as("bt"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        unix_micros(col("ts")).as("ct"))
    graft.plans.AsOf.join(buys, clicks, "user_id", "bt", "c_user", "ct")
      .select(col("user_id"), col("buy_ts"), col("click_ts"),
        (unix_timestamp(col("buy_ts")) - unix_timestamp(col("click_ts")))
          .as("wait_s"),
        col("value"))
      .orderBy(col("user_id"), col("buy_ts"))
  }

  /** Range (band) join: classify each order into a price band defined
    * by [lo, hi) intervals. The bands side is constant-size, so the
    * right plan is a broadcast join — the inequality condition runs as
    * a BroadcastNestedLoopJoin over k bands, O(n·k) with tiny k and no
    * shuffle of the fact table. (For a LARGE ranges side the scalable
    * form is bucketing: overlap each range with fixed-width bins and
    * equi-join on bin — the LSH-banding trick; not needed for a
    * dimension of bands.)
    */
  def rangeJoinBands(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      ("budget", 0d, 100000d),
      ("mid", 100000d, 300000d),
      ("premium", 300000d, 500000d)).toDF("band", "lo", "hi")
    Tables.load(s, dir, "orders")
      .join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_orders"),
        round(avg(col("o_totalprice")), 2).as("avg_price"))
      .orderBy(col("band"))
  }

  /** Cohort retention: users bucketed by their FIRST event's week, then
    * distinct active users per (cohort, weeks-since) cell — the product
    * analytics matrix. Two-phase shape: a per-user min (map-side
    * combinable), a join back on user_id at the user grain (NOT the
    * event grain — the cohort label joins once per user then fans out),
    * and a distinct-count whose partial aggregation collapses each
    * user's events within a week before the shuffle.
    */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val first = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    e.join(first, "user_id")
      .groupBy(col("cohort_wk"),
        (datediff(col("wk"), col("cohort_wk")) / 7).cast("int")
          .as("weeks_since"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_wk"), col("weeks_since"))
  }

  /** Statistical anomaly flagging over the daily event series — the
    * monitoring query an operations pipeline runs on ingest volume:
    * each (event_type, day) count is z-scored against its trailing
    * window of the 7 PRECEDING OBSERVATIONS (ROWS, not calendar days
    * — gap days don't shrink the baseline), and |z| > 2 flags the
    * day. Needs ≥ 3 baseline points and non-degenerate variance.
    *
    * Cross-engine exactness despite being a variance computation: the
    * window aggregates are exact integer sums (count, Σ, Σ²), the
    * sample variance is the integer identity (n·Σ² − Σ²ᵢ)∕(n(n−1)) —
    * ONE double division of two exact integers — and mean/z each add
    * one correctly-rounded IEEE op, so the z-scores are bit-identical
    * on both engines and the query hash-oracles (`events_anomaly`).
    *
    * Scale shape: one map-side-combinable daily aggregation (output
    * is days × types — tiny relative to events), then a partitioned
    * window over it. No shuffle touches raw events twice.
    */
  def eventsAnomaly(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-7, -1)
    daily
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("s1", sum(col("n_events")).over(w))
      .withColumn("s2", sum(col("n_events") * col("n_events")).over(w))
      .filter(col("n_win") >= 3)
      .filter(col("n_win") * col("s2") - col("s1") * col("s1") > 0)
      .withColumn("mean", col("s1").cast("double") / col("n_win"))
      .withColumn("variance",
        (col("n_win") * col("s2") - col("s1") * col("s1")).cast("double")
          / (col("n_win") * (col("n_win") - 1)))
      .withColumn("z",
        (col("n_events").cast("double") - col("mean"))
          / sqrt(col("variance")))
      .select(col("event_type"), col("day"), col("n_events"),
        round(col("mean"), 6).as("trailing_mean"),
        round(col("z"), 6).as("z_score"),
        (abs(col("z")) > 2).as("anomaly"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Time-series gap-fill with linear interpolation (graded
    * `events_gapfill`, hash-oracled both scales): per user, the daily
    * activity-value series over the user's OWN active span
    * (first..last observed day), with missing interior days filled by
    * linear interpolation between the neighboring observed days — the
    * regularization step every downstream window/trend operator
    * assumes (a gap would silently shrink a ROWS frame).
    *
    * Exactness: daily values are exact cent sums; a filled day is
    * vp + (vn − vp)·frac where frac is ONE IEEE division of two exact
    * integer day distances — the whole chain is deterministic and
    * closes under round 6. Boundary semantics: only interior gaps are
    * filled (nothing is extrapolated before the first or after the
    * last observation — every gap has both neighbors by
    * construction).
    *
    * Scale shape: one map-side-combinable daily aggregation collapses
    * the event stream to ≤ users×days rows; `sequence` explodes each
    * user's span (never a global calendar cross join); the
    * prev/next-neighbor lookups are two frames of ONE partitioned
    * window — no self-join, no per-gap probing.
    */
  /** Graded `events_ewma`: per-user exponentially-weighted moving
    * average of daily spend (α = 1/2) — the classic smoothing baseline
    * between the raw daily series and [[gapFill]]'s interpolation.
    *
    * Semantics: the recurrence s_d = (c_d + s_{d−1})/2 runs over
    * CALENDAR days (d = days since 2024-01-01, zero-filled) — a gap
    * of g missing days decays the state by 2^−g before the next
    * observation lands, the standard time-decay reading. Output rows
    * exist only for observed days.
    *
    * Exactness via BLOCK RENORMALIZATION: within a block of
    * B = [[EwmaMaxSteps]] calendar days (q = d div B, r = d mod B)
    * the closed scaled form is exact integer arithmetic —
    * P_q(d) = Σ_{i∈block q, i≤d} c_i·2^(i−qB) < 2^(23+r) fits a long —
    * and s_d = (P_q(d) + carryIn_q) / 2^(r+1), where carryIn_q is the
    * state entering the block: carryIn_q = (P_prev + carryIn_prev) ·
    * 2^(−B·(q−q_prev)) chained across observed blocks (empty blocks
    * decay through the exponent). Every scaling is an EXACT IEEE
    * exponent shift (`Math.scalb` / a power-of-two division), so the
    * ONLY roundings in the whole chain are one long→double conversion
    * plus one add per block boundary — strictly fewer than the
    * sequential recurrence's one-per-day, and deterministic
    * (correctly-rounded IEEE) on any engine replaying the same op
    * order. For spans ≤ B there is a single block with carry 0.0, so
    * results are bit-identical to the one-division closed form the
    * DuckDB oracle replays (`+ 0.0` and `/2^k` are exact).
    *
    * Scale shape: one map-side-combinable daily aggregation, one
    * per-(user, block) running-sum window, and the sequential carry
    * fold runs over the per-block TOTALS frame — B× smaller than the
    * daily frame, grouped by user (`flatMapGroups` is the genuine
    * per-group-imperative case: an affine fold S ← (P+S)·2^−B has no
    * window form, and the frame it folds is bounded by users ×
    * span/B, never event count).
    */
  def eventsEwma(s: SparkSession, dir: String): DataFrame = {
    val B = EwmaMaxSteps.toInt
    val daily = Tables.events(s, dir)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
          .cast("long").as("d"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy(col("user_id"), col("d"))
      .agg(sum(col("cents")).as("v"))
      .withColumn("q", expr(s"d div $B"))
      .withColumn("r", col("d") % B)
    val w = Window.partitionBy(col("user_id"), col("q")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scaled = daily
      .withColumn("scaled", expr("v * shiftleft(cast(1 as bigint), " +
        "cast(r as int))"))
      .withColumn("pref", sum(col("scaled")).over(w))
    // per-(user, block) exact totals feed the carry chain; the fold
    // emits the state ENTERING each observed block (0.0 for the first)
    import s.implicits._
    val carries = scaled.groupBy(col("user_id"), col("q"))
      .agg(sum(col("scaled")).as("p"))
      .select(col("user_id").cast("long"), col("q").cast("long"),
        col("p").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (uid, it) =>
        val blocks = it.toArray.sortBy(_._2)
        var state = 0.0 // s at the last day of the previous block
        var qPrev = -1L
        blocks.iterator.map { case (_, q, p) =>
          val carryIn =
            if (qPrev < 0) 0.0
            else {
              val shift = B.toLong * (q - qPrev)
              // scalb is an exact exponent shift; past double range
              // the true value underflows to 0 anyway
              if (shift > 2048) 0.0
              else Math.scalb(state, -shift.toInt)
            }
          state = p.toDouble + carryIn
          qPrev = q
          (uid, q, carryIn)
        }
      }
      .toDF("user_id", "q", "carry_in")
    scaled.join(carries, Seq("user_id", "q"))
      .select(col("user_id"), col("d"), col("v").as("cents"),
        round((col("pref").cast("double") + col("carry_in"))
          / expr("cast(shiftleft(cast(1 as bigint), cast(r + 1 as int)) " +
            "as double)"), 6).as("ewma"))
      .orderBy(col("user_id"), col("d"))
  }

  /** Block width (in calendar days) of [[eventsEwma]]'s exact-integer
    * in-block prefix: daily cent sums < 2^22 ($42k/user/day) keep the
    * scaled per-block prefix Σ c_i·2^r < 2^63.
    */
  val EwmaMaxSteps = 40L

  /** Graded `events_mad`: robust location/scale per event type —
    * exact lower-median and median-absolute-deviation, the outlier
    * detector that doesn't get dragged by the outliers themselves
    * (the complement to `events_anomaly`'s mean/σ z-scores).
    *
    * Exactness: values travel as integer cents; the lower median is
    * the element AT RANK ⌊(n+1)/2⌋ of the total order
    * (cents ASC, event_id ASC) — a positional pick, so duplicates and
    * engine sort ties cannot move it; deviations |cents − med| are
    * exact integers and MAD is the same positional pick over them.
    * The only IEEE steps are the two final /100 conversions, closed
    * under round 6. Scale shape: two ranked windows per type (the
    * second over the deviation column) — no self-join, no collect.
    */
  def eventsMad(s: SparkSession, dir: String): DataFrame = {
    val cents = round(col("value") * 100, 0).cast("long")
    val base = Tables.events(s, dir)
      .select(col("event_type"), col("event_id"), cents.as("c"))
    val w1 = Window.partitionBy(col("event_type"))
      .orderBy(col("c"), col("event_id"))
    val g1 = base.withColumn("rn", row_number().over(w1))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .withColumn("med",
        max(when(col("rn") === expr("(n + 1) div 2"), col("c")))
          .over(Window.partitionBy(col("event_type"))))
    val w2 = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("c") - col("med")), col("event_id"))
    g1.withColumn("rn2", row_number().over(w2))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        max(col("med")).as("med_cents"),
        max(when(col("rn2") === expr("(n + 1) div 2"),
          abs(col("c") - col("med")))).as("mad_cents"))
      .select(col("event_type"), col("n"),
        round(col("med_cents").cast("double") / 100.0, 6).as("median"),
        round(col("mad_cents").cast("double") / 100.0, 6).as("mad"))
      .orderBy(col("event_type"))
  }

  /** Interval-bin width (seconds) for [[intervalJoinBinned]]. */
  val IntervalBin = 3600L

  /** Graded `interval_join_binned`: point-in-interval join where BOTH
    * sides are corpus-sized and share NO equi-key — the shape that
    * degenerates to a BroadcastNestedLoopJoin (events × intervals) if
    * written as the naive `s <= t AND t < e` theta join. The scalable
    * form is the binning trick [[rangeJoinBands]]'s scaladoc promises
    * for a large ranges side: each interval explodes to the
    * fixed-width bins it overlaps (`sequence(start div W, end div
    * W)`), each event
    * carries its ONE bin, and the join is an equi-join on bin with the
    * exact residual predicate on top. An event's single bin meets each
    * covering interval exactly once, so no dedup is needed — the
    * equi-join IS the answer.
    *
    * The interval set is a pure md5 function of `orders` (keys < 3000
    * → a scale-stable count; start/length from hex folds in exact
    * integer seconds), so DuckDB reproduces it and checks the whole
    * join against the naive inequality form — the oracle runs the
    * O(n·m) plan the operator exists to avoid, which only the oracle
    * CAN at sf. Readout: per-interval event count, distinct users,
    * exact cent sum.
    *
    * Scale shape: fanout per interval = ⌈len/W⌉ + 1 bins (a small
    * constant for bounded intervals), one shuffled equi-join on bin,
    * map-side-combinable aggregation. Bin width trades replication
    * (long intervals × narrow bins) against residual selectivity
    * (wide bins × short intervals); W = 1h against ≤2.1h intervals
    * keeps both ≤ 3.
    */
  def intervalJoinBinned(s: SparkSession, dir: String): DataFrame = {
    import graft.Tables.load
    def hexN(e: Column, n: Int): Column =
      conv(substring(md5(e), 1, n), 16, 10).cast("long")
    val epoch0 = to_timestamp(lit("2024-01-01 00:00:00")).cast("long")
    val ivs = load(s, dir, "orders")
      .filter(col("o_orderkey") < 3000)
      .select(col("o_orderkey").cast("long").as("interval_id"))
      .withColumn("start_s",
        hexN(concat(col("interval_id").cast("string"), lit("#ivs")), 8)
          % lit(29L * 86400L))
      .withColumn("end_s", col("start_s") + lit(900L)
        + hexN(concat(col("interval_id").cast("string"), lit("#ivl")), 4)
          % lit(7200L))
    val binned = ivs.select(col("interval_id"), col("start_s"), col("end_s"),
      explode(expr(s"sequence(start_s div $IntervalBin, " +
        s"end_s div $IntervalBin)")).as("bin"))
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("value"),
        (col("ts").cast("long") - epoch0).as("es"))
      .withColumn("bin", expr(s"es div $IntervalBin"))
    ev.join(binned.hint("shuffle_hash"), Seq("bin"))
      .filter(col("es") >= col("start_s") && col("es") < col("end_s"))
      .groupBy(col("interval_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(round(col("value") * 100, 0).cast("long")).as("sum_cents"))
      .orderBy(col("interval_id"))
  }

  /** Graded `events_transitions`: the first-order Markov transition
    * matrix over each user's event sequence — P(next type | type),
    * the behavioral fingerprint sessionization/funnel analyses start
    * from. One window `lag` per user ordered by (ts, event_id) —
    * event_id is unique, so the ordering (and therefore every
    * transition pair) is total and deterministic in both engines.
    * Counts are exact; the row probability is ONE IEEE division
    * closed under round 6. Scale: one shuffle on user_id, one
    * map-side-combinable count — no self-join.
    */
  def eventTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val totals = Window.partitionBy(col("prev_type"))
    pairs
      .withColumn("p",
        round(col("n").cast("double")
          / sum(col("n")).over(totals).cast("double"), 6))
      .orderBy(col("prev_type"), col("event_type"))
  }

  /** Graded `events_decayed`: exponentially-decayed counters per event
    * type — the recency weighting every freshness-aware dashboard and
    * trending-topics ranker applies (half-life decay; Cormode et al.'s
    * exponential histograms solve the streaming variant).
    *
    * Exactness contract: decay at DAY grain with half-life h days
    * means weight 2^(−⌊age/h⌋) — an integer power of two, carried as
    * the exact integer `1 << (50 − k)` (0 beyond 50 half-lives, where
    * the weight is below any output rounding anyway). All sums are
    * exact DECIMAL over those integers; the only IEEE steps are the
    * final division by 2^50 (exact — a power-of-two scale) and the
    * closing round — so the whole operator hash-oracles, with NO pow()
    * in either engine (libm pow is the classic cross-engine hazard).
    *
    * Scale shape: one map-side-combinable aggregation per type; the
    * reference instant is a broadcast 1-row agg (never a second scan
    * inline); weights are row-local arithmetic — no join, no window.
    */
  def decayedCounts(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val ref = e.agg(max(to_date(col("ts"))).as("d1"))
    val k = datediff(col("d1"), to_date(col("ts")))
    def w(kCol: String): Column = expr(
      s"cast(if($kCol <= 50, shiftleft(cast(1 as bigint), " +
        s"cast(50 - $kCol as int)), 0) as decimal(38,0))")
    e.crossJoin(broadcast(ref))
      .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      .withColumn("k1", k)
      .withColumn("k7", expr("k1 div 7"))
      .withColumn("w1", w("k1"))
      .withColumn("w7", w("k7"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("w1")).as("s1"),
        sum(col("w7")).as("s7"),
        sum(col("cents").cast("decimal(38,0)") * col("w1")).as("sv1"))
      .select(col("event_type"), col("n"),
        round(col("s1").cast("double") / 1125899906842624.0, 9)
          .as("decayed_1d"),
        round(col("s7").cast("double") / 1125899906842624.0, 9)
          .as("decayed_7d"),
        round(col("sv1").cast("double") / 1125899906842624.0 / 100.0, 6)
          .as("decayed_value_1d"))
      .orderBy(col("event_type"))
  }

  def gapFill(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
          .cast("long").as("d"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy(col("user_id"), col("d"))
      .agg(sum(col("cents")).as("v"))
    val span = daily.groupBy(col("user_id"))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val grid = span.select(col("user_id"),
      explode(sequence(col("d0"), col("d1"))).as("d"))
    val joined = grid.join(daily, Seq("user_id", "d"), "left")
    val wPrev = Window.partitionBy(col("user_id")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy(col("user_id")).orderBy(col("d"))
      .rowsBetween(0, Window.unboundedFollowing)
    joined
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("pd",
        last(when(col("v").isNotNull, col("d")), ignoreNulls = true)
          .over(wPrev))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
      .withColumn("nd",
        first(when(col("v").isNotNull, col("d")), ignoreNulls = true)
          .over(wNext))
      .select(col("user_id"), col("d"),
        round(when(col("v").isNotNull, col("v").cast("double"))
          .otherwise(col("pv").cast("double")
            + (col("nv") - col("pv")).cast("double")
            * ((col("d") - col("pd")).cast("double")
              / (col("nd") - col("pd")).cast("double"))), 6).as("value"),
        col("v").isNull.as("filled"))
      .orderBy(col("user_id"), col("d"))
  }

  /** Graded `events_cusum`: CUSUM changepoint localization per event
    * type over the daily spend series — the standard offline
    * change-in-mean detector (Page 1954): the changepoint estimate is
    * the day k maximizing |S_k − (k/K)·T|, the cumulative deviation
    * from the global mean. Exactly the statistic a data-quality
    * monitor runs when a drift alarm fires and someone asks WHEN the
    * distribution moved.
    *
    * Exactness: daily sums are exact cents; the statistic is kept in
    * the SCALED integer form D_k = K·S_k − k·T (multiply both sides
    * by K — argmax is invariant), so ranking rows by |D_k| compares
    * exact DECIMAL(38,0) integers and the winner cannot move under
    * reassociation. The reported normalized statistic
    * |D_k| / (K·T) ∈ [0,1) is ONE IEEE division of two
    * exactly-converted integers, closed under round 9. Tie rule:
    * earliest day wins (|D| DESC, day ASC).
    *
    * Scale shape: one map-side-combinable daily aggregation collapses
    * the stream to types×days rows; everything after (prefix sum,
    * rank) is two windows over that tiny frame. The 100 TB cost is
    * the first aggregation — exactly one shuffle of partial sums.
    * DECIMAL(38,0) headroom: K·S needs days × total-cents < 10^38 —
    * at 10^5 days and 10^18 cents that is 10^23; never binds.
    */
  def eventsCusum(s: SparkSession, dir: String): DataFrame =
    cusumFor(Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("c")))

  /** [[eventsCusum]]'s algebra over any (event_type, day, c) daily
    * frame — the seam the planted-changepoint spec drives. */
  private[graft] def cusumFor(daily: DataFrame): DataFrame = {
    val part = Window.partitionBy(col("event_type"))
    val wPrefix = part.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = daily
      .withColumn("k", row_number().over(part.orderBy(col("day"))))
      .withColumn("s_k",
        sum(col("c").cast("decimal(38,0)")).over(wPrefix))
      .withColumn("n_days", count(lit(1)).over(part))
      .withColumn("total", sum(col("c").cast("decimal(38,0)")).over(part))
      .withColumn("d_k",
        col("n_days") * col("s_k") - col("k") * col("total"))
    scored
      .withColumn("pick",
        row_number().over(part.orderBy(abs(col("d_k")).desc, col("day"))))
      .filter(col("pick") === 1)
      .select(col("event_type"), col("day").as("change_day"),
        col("n_days"),
        signum(col("d_k").cast("double")).cast("int").as("direction"),
        round(abs(col("d_k")).cast("double")
          / (col("n_days") * abs(col("total"))).cast("double"), 9)
          .as("cusum_stat"))
      .orderBy(col("event_type"))
  }

  /** Graded `events_seasonality`: day-of-week seasonality index per
    * event type — mean daily spend on each ISO weekday divided by the
    * overall mean daily spend, the multiplicative seasonal factor a
    * forecaster divides out before trend fitting (and the first
    * sanity profile run on any business-activity stream).
    *
    * Exactness: with per-(type, dow) exact sums Σ_d and day counts
    * n_d, and per-type totals T over N days, the index
    * (Σ_d/n_d)/(T/N) is computed as the single division
    * (Σ_d·N)/(n_d·T) of two exact DECIMAL products — ONE IEEE step,
    * closed under round 9. The weekday key is ISO (1 = Monday):
    * Spark `weekday()+1` ≡ DuckDB `isodow()`.
    *
    * Scale shape: the same one-shuffle daily collapse as
    * [[eventsCusum]]; both aggregation levels after it are
    * bounded by types×7 — driver-negligible, executor-trivial.
    */
  def eventsSeasonality(s: SparkSession, dir: String): DataFrame =
    seasonalityFor(Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("c")))

  /** Autocorrelation lags (days) reported by [[eventsAutocorr]]:
    * adjacent-day persistence and the weekly cycle. */
  val AutocorrLags = Seq(1, 7)

  /** Graded `events_autocorr`: calendar-lag autocorrelation of the
    * daily spend series per event type — the ACF diagnostic read
    * before any forecasting choice (lag 1 ⇒ momentum/persistence,
    * lag 7 ⇒ weekly cycle; pairs with [[eventsSeasonality]], which
    * measures the cycle's SHAPE while this measures its strength).
    *
    * Lag alignment is CALENDAR-exact: day d pairs with day d−lag by
    * an equi-join on (type, day), so a missing day drops its pairs
    * instead of silently shifting the series (the ROWS-lag bug class
    * [[eventsAnomaly]]'s scaladoc warns about). Pearson r comes from
    * the normal-equation identity on exact DECIMAL sums — numerator
    * n·Σxy − Σx·Σy exactly, denominator √(n·Σxx−Σx²)·√(n·Σyy−Σy²)
    * as two separate sqrts (their product can overflow the exact
    * domain; two IEEE sqrts then one multiply is the same fixed
    * chain in both engines), one division, round 6.
    *
    * Scale shape: one daily collapse (the only corpus-sized shuffle),
    * then per lag one equi-join of the tiny daily frame with itself
    * and a map-side-combinable six-sum aggregation — |types|·|lags|
    * output rows.
    */
  def eventsAutocorr(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("c"))
    autocorrFor(daily)
  }

  /** [[eventsAutocorr]]'s algebra over any (event_type, day, c)
    * frame. */
  private[operators] def autocorrFor(daily: DataFrame): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val lagged = AutocorrLags.map { l =>
      daily.select(col("event_type"), col("day"), col("c").as("y"))
        .join(daily.select(col("event_type"),
          date_add(col("day"), l).as("day"), col("c").as("x")),
          Seq("event_type", "day"))
        .select(col("event_type"), lit(l).as("lag"), col("x"), col("y"))
    }.reduce(_ unionByName _)
    lagged.groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"))
      .select(col("event_type"), col("lag"), col("n_pairs"),
        round((col("n_pairs") * col("sxy") - col("sx") * col("sy"))
            .cast("double")
          / (sqrt((col("n_pairs") * col("sxx") - col("sx") * col("sx"))
              .cast("double"))
            * sqrt((col("n_pairs") * col("syy") - col("sy") * col("sy"))
              .cast("double"))), 6).as("acf"))
      .orderBy(col("event_type"), col("lag"))
  }

  /** [[eventsSeasonality]]'s algebra over any (event_type, day, c)
    * daily frame. */
  private[operators] def seasonalityFor(dailyIn: DataFrame): DataFrame = {
    val daily = dailyIn
      .select(col("event_type"), (weekday(col("day")) + 1).as("dow"),
        col("c"))
    val byDow = daily.groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("c")).cast("decimal(38,0)").as("dow_cents"))
    val overall = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("tot_days"),
        sum(col("c")).cast("decimal(38,0)").as("tot_cents"))
    byDow.join(broadcast(overall), "event_type")
      .select(col("event_type"), col("dow"), col("n_days"),
        round(col("dow_cents").cast("double")
          / col("n_days").cast("double") / 100.0, 6).as("avg_daily"),
        round((col("dow_cents") * col("tot_days")).cast("double")
          / (col("tot_cents") * col("n_days")).cast("double"), 9)
          .as("season_index"))
      .orderBy(col("event_type"), col("dow"))
  }
}
