package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Temporal

/** Streaming as-of enrichment ≡ the batch operator on an in-order
  * feed, with cross-batch state carrying the last click.
  */
class AsOfStreamSpec extends SparkSpec {
  import spark.implicits._
  import AsOfStream.{Enriched, Ev}

  private def runStream(batches: Seq[Seq[Ev]]): Seq[Enriched] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = AsOfStream.enrich(mem.toDS()).writeStream
      .format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val out = spark.table("asof_out").as[Enriched].collect().toSeq
    spark.sql("DROP TABLE IF EXISTS asof_out")
    out
  }

  test("a click lands in one batch, its purchase in the next: state " +
      "carries the match; same-instant clicks are visible") {
    val out = runStream(Seq(
      Seq(Ev(1, 10_000_000L, "click", 0), Ev(2, 5_000_000L, "view", 0)),
      Seq(Ev(1, 30_000_000L, "purchase", 9.5),
        Ev(2, 7_000_000L, "click", 0),
        Ev(2, 7_000_000L, "purchase", 3.0)), // tie: click visible
      Seq(Ev(3, 50_000_000L, "purchase", 1.0)) // no click ever: drops
    )).sortBy(e => (e.user, e.buyMicros))
    assert(out == Seq(
      Enriched(1, 30_000_000L, 10_000_000L, 20L, 9.5),
      Enriched(2, 7_000_000L, 7_000_000L, 0L, 3.0)), out.toString)
  }

  test("a late (older) click cannot regress the carried frontier — " +
      "later purchases keep the NEWEST prior click") {
    val out = runStream(Seq(
      Seq(Ev(1, 20_000_000L, "click", 0)),
      // contract-violating straggler: older than the carried click
      Seq(Ev(1, 10_000_000L, "click", 0),
        Ev(1, 30_000_000L, "purchase", 5.0))))
    assert(out == Seq(
      Enriched(1, 30_000_000L, 20_000_000L, 10L, 5.0)), out.toString)
  }

  test("streamed enrichment equals the batch as-of join on the graded " +
      "corpus, split at arbitrary batch boundaries") {
    val evs = graft.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_type"), col("value"))
      .orderBy(col("t")).collect()
      .map(r => Ev(r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSeq
    // three arbitrary in-order slices
    val batches = Seq(evs.take(evs.size / 3),
      evs.slice(evs.size / 3, 2 * evs.size / 3),
      evs.drop(2 * evs.size / 3))
    val streamed = runStream(batches)
      .map(e => (e.user, e.buyMicros, e.clickMicros, e.waitS, e.value))
      .sortBy(_.toString)
    val batch = Temporal.asOfJoin(spark, sf)
      .select(col("user_id"), unix_micros(col("buy_ts")),
        unix_micros(col("click_ts")), col("wait_s"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSeq.sortBy(_.toString)
    assert(streamed.length == batch.length,
      s"${streamed.length} vs ${batch.length}")
    streamed.zip(batch).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }
}
