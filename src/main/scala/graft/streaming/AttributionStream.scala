package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Per-user state carried between micro-batches: the most recent
  * non-purchase touch seen so far. 24 bytes per ACTIVE user — the
  * key discipline of the streaming twins ([[AsOfStream]] carries one
  * long per user the same way). */
case class TouchState(touch_type: String, touch_us: Long)

/** One attributed conversion emitted by [[AttributionStream]]. */
case class Attributed(user_id: Long, event_id: Long, channel: String,
    cents: Long)

/** Continuous last-touch attribution — the streaming face of
  * `Behavior.attribution` (`events_attribution`): as events flow,
  * every purchase is credited to the user's most recent non-purchase
  * touch within the lookback, or to `direct`, AT ARRIVAL TIME — the
  * shape a marketing dashboard consumes, where the batch operator is
  * the end-of-day restatement.
  *
  * One `flatMapGroupsWithState` keyed on user_id. Each batch's rows
  * are re-ordered by (us, event_id) before folding, so intra-batch
  * disorder is absorbed; ACROSS batches the feed must be per-user
  * time-ordered (the [[AsOfStream]] contract — in production a
  * watermark-deferred intake stage provides it; an out-of-order
  * touch arriving after its purchase is an attribution restatement
  * only the batch operator can express). On an in-order feed the
  * emitted conversions aggregate EXACTLY to the batch answer at
  * every batch boundary, however the input is split
  * (AttributionStreamSpec pins this against `attributionFor`).
  *
  * At scale: state is one touch per active user, emitted rows are
  * purchases only, and the single shuffle is the groupByKey on
  * user_id — no window, no join, no event retention.
  */
object AttributionStream {

  /** Same lookback as the batch operator — the parity contract. */
  val LookbackUs: Long = graft.operators.Behavior.AttributionWindowUs

  /** rows: (user_id, event_id, event_type, value, us). */
  def attributed(events: Dataset[(Long, Long, String, Double, Long)])
      : Dataset[Attributed] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[TouchState, Attributed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state) =>
          var st = state.getOption.orNull
          val out = Seq.newBuilder[Attributed]
          rows.toSeq.sortBy(r => (r._5, r._2)).foreach { r =>
            if (r._3 != "purchase") st = TouchState(r._3, r._5)
            else {
              val ch =
                if (st != null && r._5 - st.touch_us <= LookbackUs)
                  st.touch_type
                else "direct"
              // EXACTLY the batch operator's round(value*100, 0):
              // Spark's Round on a double is BigDecimal.valueOf +
              // HALF_UP (half away from zero for BOTH signs) —
              // math.round would diverge on negative halves (refunds),
              // silently breaking the streamed≡batch parity contract
              out += Attributed(uid, r._2, ch,
                java.math.BigDecimal.valueOf(r._4 * 100)
                  .setScale(0, java.math.RoundingMode.HALF_UP).longValue())
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }
}
