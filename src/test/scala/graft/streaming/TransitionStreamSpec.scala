package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.Temporal

/** Streaming Markov transition maintenance: the stateful pair emitter
  * composed with the IVM fold equals the batch lag-window counts.
  */
class TransitionStreamSpec extends SparkSpec {
  import spark.implicits._
  import TransitionStream.Ev

  private def bootstrapEmpty(path: String): Unit = {
    val schema = StructType(Seq(
      StructField("prev_type", StringType),
      StructField("event_type", StringType),
      StructField("n", LongType), StructField("s", LongType)))
    IvmStream.bootstrap(spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema), path)
  }

  private def runStream(path: String, batches: Seq[Seq[Ev]]): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Ev]
    val q = TransitionStream.maintain(mem.toDS(), path)
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
  }

  test("a transition straddling a batch boundary is counted once, " +
      "through the carried state") {
    val path = Files.createTempDirectory("trs").toString + "/view"
    bootstrapEmpty(path)
    runStream(path, Seq(
      Seq(Ev(1, 10, 1, "view"), Ev(1, 20, 2, "click")),
      Seq(Ev(1, 30, 3, "purchase")))) // pair (click -> purchase) crosses
    val out = TransitionStream.countsOf(spark, path).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("view", "click") -> 1L,
      ("click", "purchase") -> 1L), out.toString)
  }

  test("a contract-violating late event is dropped, never regressing " +
      "the carried frontier or emitting a wrong pair") {
    val path = Files.createTempDirectory("trl").toString + "/view"
    bootstrapEmpty(path)
    runStream(path, Seq(
      Seq(Ev(1, 10, 1, "view"), Ev(1, 30, 3, "click")),
      // ts=20 is BEHIND the carried (30, click) frontier: pairing it
      // would claim click -> straggler in event-time order — wrong.
      // It must vanish; the following purchase pairs with the click.
      Seq(Ev(1, 20, 2, "straggler"), Ev(1, 40, 4, "purchase"))))
    val out = TransitionStream.countsOf(spark, path).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("view", "click") -> 1L,
      ("click", "purchase") -> 1L), out.toString)
  }

  test("streamed maintained counts equal the batch lag-window counts " +
      "on the graded corpus") {
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("event_type"))
      .orderBy(col("t"), col("event_id")).collect()
      .map(r => Ev(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq
    val path = Files.createTempDirectory("trsf").toString + "/view"
    bootstrapEmpty(path)
    runStream(path, Seq(evs.take(evs.size / 3),
      evs.slice(evs.size / 3, 2 * evs.size / 3),
      evs.drop(2 * evs.size / 3)))
    val streamed = TransitionStream.countsOf(spark, path).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = Temporal.eventTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch,
      s"streamed ${streamed.size} cells vs batch ${batch.size}")
  }
}
