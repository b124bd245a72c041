package graft.streaming

import java.sql.Date

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Temporal

/** Streamed CUSUM maintenance must agree with the batch operator at
  * every batch boundary, and the tick fold must be replay-idempotent.
  */
class CusumStreamSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int): Date =
    Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(d - 1))

  // the planted step series the batch spec uses: 10 low, 10 high days
  private val series = (1 to 20).map(d =>
    ("a", day(d), if (d <= 10) 100L else 500L))

  test("streamed daily view reproduces the batch CUSUM after " +
    "arbitrary batch splits") {
    val root = java.nio.file.Files.createTempDirectory("cusum_stream")
      .toString
    CusumStream.bootstrap(spark, root)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Date, Long)]
    val q = CusumStream.maintain(
      mem.toDF().toDF("event_type", "day", "cents"), root)
    try {
      // ragged waves, one day split ACROSS waves (two cent rows for
      // day 7 arrive in different ticks and must sum in the view)
      mem.addData(series.take(6) :+ (("a", day(7), 40L)))
      q.processAllAvailable()
      mem.addData((("a", day(7), 60L)) +: series.slice(7, 13))
      q.processAllAvailable()
      mem.addData(series.drop(13))
      q.processAllAvailable()
      val streamed = CusumStream.changepoints(spark, root).collect()
      val batch = Temporal.cusumFor(series.toDF("event_type", "day", "c")
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("c")).as("c"))).collect()
      assert(streamed.map(_.toString).toSeq ==
        batch.map(_.toString).toSeq)
      val r = streamed.head
      assert(r.getAs[Date]("change_day").toString == "2024-01-10")
      assert(r.getAs[Long]("n_days") == 20L)
    } finally q.stop()
  }

  test("a replayed committed tick folds exactly once") {
    val root = java.nio.file.Files.createTempDirectory("cusum_replay")
      .toString
    CusumStream.bootstrap(spark, root)
    val delta = Seq(("a", day(1), 1L, 100L), ("a", day(2), 1L, 200L))
      .toDF("event_type", "day", "m", "c")
    IvmStream.applyTick(root, Seq("event_type", "day"), Seq("c"),
      delta, 0L)
    // replay of the SAME committed tick must be a no-op
    IvmStream.applyTick(root, Seq("event_type", "day"), Seq("c"),
      delta, 0L)
    val view = IvmStream.currentOf(spark, root)
      .orderBy(col("day")).collect()
    assert(view.map(r => (r.getAs[Date]("day").toString,
      r.getAs[Long]("c"))).toSeq ==
      Seq(("2024-01-01", 100L), ("2024-01-02", 200L)))
  }
}
