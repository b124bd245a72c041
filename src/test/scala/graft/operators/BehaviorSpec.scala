package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-case and independent-reimplementation coverage for the
  * product-analytics pack (sessionize / funnel / attribution /
  * cohort retention). Planted cases pin the boundary semantics
  * (exact-gap, strict order, lookback edge); the replay tests
  * recompute the graded corpus answer with a straight-line Scala
  * fold and demand equality.
  */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private val M = 60L * 1000000 // one minute in microseconds

  test("sessionize: a gap of exactly SessionGapUs stays in-session; " +
    "one microsecond more splits") {
    // user 1: events at 0, +30min (same session), then +30min+1us
    // after that (new session). user 2: single event.
    val rows = Seq(
      (1L, 1L, 0L),
      (1L, 2L, Behavior.SessionGapUs),
      (1L, 3L, 2 * Behavior.SessionGapUs + 1),
      (2L, 4L, 5L)).toDF("user_id", "event_id", "ts_us")
    val out = Behavior.sessionizeFor(rows).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    // user 1: 2 sessions, 3 events, max 2 events/session, engaged
    // time = 30min (session 1) + 0 (singleton session 2) = 1800 s
    assert(out(1L) == ((2L, 3L, 2L, 1800L)), out(1L).toString)
    assert(out(2L) == ((1L, 1L, 1L, 0L)), out(2L).toString)
  }

  test("sessionize replays the graded corpus against a driver fold") {
    val raw = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = raw.groupBy(_._1).map { case (u, es) =>
      val ts = es.sortBy(e => (e._3, e._2)).map(_._3)
      val sessions = ts.tail.foldLeft(List(List(ts.head))) {
        case (cur :: done, t) =>
          if (t - cur.head > Behavior.SessionGapUs) List(t) :: cur :: done
          else (t :: cur) :: done
        case (Nil, _) => sys.error("unreachable")
      }
      val durs = sessions.map(ss => ss.max - ss.min)
      u -> ((sessions.size.toLong, ts.size.toLong,
        sessions.map(_.size).max.toLong, durs.sum / 1000000L))
    }
    val got = Behavior.sessionize(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected)
  }

  test("funnel: strict order — a click before the first view does " +
    "not convert, a tie does not convert (strictly greater)") {
    val rows = Seq(
      // user 1: full ordered funnel
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // user 2: click BEFORE the first view — stops at view
      (2L, "click", 5L), (2L, "view", 10L), (2L, "purchase", 20L),
      // user 3: click ties the first view's timestamp — not after
      (3L, "view", 10L), (3L, "click", 10L),
      // user 4: never views — contributes to no step
      (4L, "click", 1L), (4L, "purchase", 2L)
    ).toDF("user_id", "event_type", "us")
    val out = Behavior.funnelFor(rows).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out == Map("view" -> 3L, "click" -> 1L, "purchase" -> 1L),
      out.toString)
  }

  test("attribution: lookback edge is inclusive, beyond it or " +
    "touchless credits direct") {
    val W = Behavior.AttributionWindowUs
    val rows = Seq(
      // purchase exactly W after the touch — attributed
      (1L, 1L, "click", 0.0, 0L), (1L, 2L, "purchase", 10.0, W),
      // purchase W+1 after the only touch — direct
      (2L, 3L, "view", 0.0, 0L), (2L, 4L, "purchase", 20.0, W + 1),
      // purchase with no prior event at all — direct
      (3L, 5L, "purchase", 30.0, 100L),
      // latest of two touches wins
      (4L, 6L, "view", 0.0, 0L), (4L, 7L, "click", 0.0, 50L),
      (4L, 8L, "purchase", 40.0, 100L)
    ).toDF("user_id", "event_id", "event_type", "value", "us")
    val out = Behavior.attributionFor(rows).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      "click" -> ((2L, 5000L)), // users 1 and 4
      "direct" -> ((2L, 5000L))), out.toString)
  }

  test("top paths replays a driver session-path recount") {
    val raw = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val paths = raw.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._4, e._2))
      val sessions = sorted.tail.foldLeft(List(List(sorted.head))) {
        case (cur :: done, e) =>
          if (e._4 - cur.head._4 > Behavior.SessionGapUs)
            List(e) :: cur :: done
          else (e :: cur) :: done
        case (Nil, _) => sys.error("unreachable")
      }
      sessions.map(ss =>
        ss.reverse.map(_._3).take(Behavior.PathMaxLen).mkString(">"))
    }
    val counts = paths.groupBy(identity).view.mapValues(_.size.toLong)
    val expected = counts.toSeq
      .sortBy { case (p, n) => (-n, p) }.take(Behavior.PathTop)
    val got = Behavior.topPaths(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("top paths: a planted 100k-event bot session is truncated to " +
    "the PathMaxLen prefix and the operator completes") {
    // one bot key (a replay attack / runaway client: 100k events one
    // second apart, all in ONE session) next to two normal humans —
    // exactly the skew shape the PathMaxLen rank-filter defends
    // against. The bot path must be the 64-event PREFIX, and the
    // human paths must be untouched.
    val bot = (1L to 100000L).map(i =>
      (99L, i, if (i % 2 == 0) "click" else "view", i * 1000000L))
    val humans = Seq(
      (1L, 200001L, "view", 0L), (1L, 200002L, "click", M),
      (2L, 200003L, "view", 0L), (2L, 200004L, "click", M))
    val got = Behavior.topPathsFor(
      (bot ++ humans).toDF("user_id", "event_id", "event_type", "ts_us"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val botPath = (1L to Behavior.PathMaxLen.toLong)
      .map(i => if (i % 2 == 0) "click" else "view").mkString(">")
    assert(got.contains(("view>click", 2L)), got.map(_._1).toString)
    assert(got.contains((botPath, 1L)),
      s"bot path truncated to ${Behavior.PathMaxLen}: " +
        got.map(p => (p._1.take(40), p._2)).toString)
    // nothing longer than the cap survives
    assert(got.forall(_._1.split(">").length <= Behavior.PathMaxLen))
  }

  test("stickiness replays a driver recount of DAU and trailing-7 WAU") {
    val pairs = graft.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val days = pairs.map(_._2).distinct
    val expected = days.map { d =>
      val dau = pairs.count(_._2 == d).toLong
      val wau = pairs.filter { case (_, ad) =>
        !ad.isAfter(d) && ad.isAfter(d.minusDays(7))
      }.map(_._1).distinct.length.toLong
      d.toString -> ((dau, wau,
        BigDecimal(dau.toDouble / wau.toDouble).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toMap
    val got = Behavior.stickiness(spark, sf).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (d, (dau, wau, st)) =>
      assert(got(d)._1 == dau && got(d)._2 == wau, s"day $d counts")
      assert(math.abs(got(d)._3 - st) <= 1e-6, s"day $d stickiness")
    }
  }

  test("cohort retention: planted two-cohort matrix") {
    // cohort 0: custs 1,2 (cust 1 returns in months 1 and 2, cust 2
    // only month 0). cohort 1: cust 3, returns month 3 (offset 2).
    val rows = Seq(
      (1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L),
      (3L, 1L), (3L, 3L)).toDF("o_custkey", "ym")
    val out = Behavior.cohortRetentionFor(rows).collect().map(r =>
      ((r.getLong(0), r.getLong(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out == Map(
      (0L, 1L, 0L) -> ((2L, 2L, 1.0)),
      (0L, 1L, 1L) -> ((1L, 2L, 0.5)),
      (0L, 1L, 2L) -> ((1L, 2L, 0.5)),
      (0L, 2L, 0L) -> ((1L, 1L, 1.0)),
      (0L, 2L, 2L) -> ((1L, 1L, 1.0))), out.toString)
  }
}
