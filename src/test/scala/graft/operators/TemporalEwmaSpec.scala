package graft.operators

import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDate

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Long-span EWMA: the block-renormalized closed form must serve
  * histories far past the 40-day exact-integer headroom (the r10
  * operator REFUSED them), decay across calendar gaps, and stay
  * bit-identical to the one-division closed form on short spans —
  * the form the DuckDB oracle replays.
  */
class TemporalEwmaSpec extends SparkSpec {

  /** Synthetic events: one row per (user, day, cents); ts at noon so
    * date extraction is TZ-robust.
    */
  private def writeEvents(rows: Seq[(Long, Int, Long)]): String = {
    val dir = Files.createTempDirectory("graft-ewma").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val data = rows.zipWithIndex.map { case ((uid, d, cents), i) =>
      Row(i.toLong,
        Timestamp.valueOf(
          LocalDate.parse("2024-01-01").plusDays(d.toLong).atTime(12, 0)),
        uid, "spend", cents.toDouble / 100.0, "{}")
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(data.asJava, schema)
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  /** The sequential reference: s_d = (c_d + s_{d−1})/2 over CALENDAR
    * days (missing days contribute 0 and decay the state), reported
    * at observed days.
    */
  private def sequential(days: Seq[(Int, Long)]): Map[Int, Double] = {
    val byDay = days.toMap
    var s = 0.0
    (days.map(_._1).min to days.map(_._1).max).flatMap { d =>
      s = (byDay.getOrElse(d, 0L).toDouble + s) / 2.0
      if (byDay.contains(d)) Some(d -> s) else None
    }.toMap
  }

  test("a 100-day history (2.5x the old headroom) runs and matches " +
      "the sequential calendar-day recurrence") {
    // user 1 crosses a block boundary with interior gaps; user 2 has
    // a whole-block gap (q jumps 0 -> 2); user 3 is dense over 100 days
    val u1 = Seq(0 -> 12345L, 1 -> 777L, 5 -> 20000L, 39 -> 41L,
      40 -> 999L, 41 -> 5L, 77 -> 314159L)
    val u2 = Seq(0 -> 100000L, 99 -> 42L)
    val u3 = (0 until 100).map(d => d -> (1000L + 7L * d))
    val dir = writeEvents(
      u1.map { case (d, c) => (1L, d, c) } ++
        u2.map { case (d, c) => (2L, d, c) } ++
        u3.map { case (d, c) => (3L, d, c) })
    val got = Temporal.eventsEwma(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("d").toInt) ->
        r.getAs[Double]("ewma")).toMap
    assert(got.size == u1.size + u2.size + u3.size)
    for ((uid, days) <- Seq(1L -> u1, 2L -> u2, 3L -> u3);
        (d, ref) <- sequential(days)) {
      val ours = got((uid, d))
      // the block form does strictly fewer IEEE roundings than the
      // sequential reference (one add per block vs one per day); they
      // agree to well inside the round-6 output grid, up to one
      // half-tie flip at the 6th decimal
      assert(math.abs(ours - BigDecimal(ref)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) <= 1e-6,
        s"user $uid day $d: got $ours, sequential ref $ref")
    }
    // decay across the 98-day gap: user 2's day-99 state is its own
    // day's contribution alone (the 10^5-cent day-0 state has decayed
    // by 2^-99, far below round 6)
    assert(got((2L, 99)) == 21.0)
  }

  test("short spans stay bit-identical to the single-block closed " +
      "form the DuckDB oracle replays") {
    val days = Seq(0 -> 101L, 3 -> 999L, 17 -> 123456L, 39 -> 7L)
    val dir = writeEvents(days.map { case (d, c) => (9L, d, c) })
    val got = Temporal.eventsEwma(spark, dir).collect()
      .map(r => r.getAs[Long]("d").toInt -> r.getAs[Double]("ewma")).toMap
    days.foreach { case (d, _) =>
      // the oracle's form: exact integer prefix, ONE double division
      val pref = days.filter(_._1 <= d)
        .map { case (i, c) => BigInt(c) << i }.sum
      val oracle = BigDecimal(pref.toDouble / math.pow(2.0, (d + 1).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(d) == oracle, s"day $d: got ${got(d)}, oracle $oracle")
    }
  }
}
