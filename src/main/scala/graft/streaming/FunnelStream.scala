package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.Behavior

/** Per-user funnel progress carried between micro-batches: the
  * highest step completed so far (0 = none) and the anchor time of
  * that completion — 12 bytes per active user. */
case class FunnelState(step: Int, anchor_us: Long)

/** One step completion emitted by [[FunnelStream]]: user u completed
  * `step_idx` (1-based into [[Behavior.FunnelSteps]]) at `us`. */
case class StepCompletion(user_id: Long, step_idx: Int, us: Long)

/** Continuous funnel tracking — the streaming face of
  * `Behavior.funnel` (`events_funnel_steps`): as events arrive, each
  * user advances through the ordered steps (view → click →
  * purchase), a step counting only when it lands STRICTLY after the
  * anchor of the previous one; every advance is emitted the moment
  * it happens. Counting completions per step then equals the batch
  * funnel's `n_users` exactly at every batch boundary
  * (FunnelStreamSpec pins this under ragged splits).
  *
  * The state machine mirrors the batch semantics because the batch
  * anchors are greedy-minimal: the first view is the earliest view,
  * the first qualifying click is the earliest click after it, and so
  * on — so processing events in time order and advancing at the
  * first opportunity reproduces the same anchors. Same in-order
  * contract as [[AttributionStream]] (intra-batch disorder absorbed
  * by a sort, cross-batch order required).
  *
  * At scale: state is 12 bytes per user who has ENTERED the funnel —
  * users who have never matched step 1 leave NO state behind (their
  * implicit state is the default, so nothing is written for them),
  * which at 100 TB is the difference between state ∝ funnel entrants
  * and state ∝ every user id ever observed. Terminal-step users MUST
  * stay in state: dropping them would let a returning converted user
  * restart the funnel and double-count (batch semantics anchor each
  * user at most once per step — FunnelStreamSpec pins the
  * no-recount case). Emissions are at most |steps| per user EVER,
  * and the single shuffle is the groupByKey.
  */
object FunnelStream {

  /** rows: (user_id, event_id, event_type, us). */
  def completions(events: Dataset[(Long, Long, String, Long)])
      : Dataset[StepCompletion] = {
    import events.sparkSession.implicits._
    val steps = Behavior.FunnelSteps
    events.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, StepCompletion](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state) =>
          var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          val out = Seq.newBuilder[StepCompletion]
          rows.toSeq.sortBy(r => (r._4, r._2)).foreach { r =>
            if (st.step < steps.length && r._3 == steps(st.step) &&
                (st.step == 0 || r._4 > st.anchor_us)) {
              st = FunnelState(st.step + 1, r._4)
              out += StepCompletion(uid, st.step, r._4)
            }
          }
          // write only for funnel ENTRANTS: a step-0 state is the
          // default and reconstructs for free, so persisting it would
          // grow state with every user ever seen instead of every
          // user who matched step 1. NEVER remove a terminal-step
          // state — see the object doc.
          if (st.step > 0) state.update(st)
          out.result().iterator
      }
  }
}
