package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState, OutputMode}

/** Streaming as-of enrichment — the third face of the as-of family
  * (batch union+window: Temporal.asOfJoin; first-class operator:
  * plans.AsOfJoin; and this, the continuous form): every purchase is
  * emitted enriched with the user's latest click at or before it, one
  * trigger behind the stream.
  *
  * State is the MINIMAL sufficient statistic — one long per user (the
  * last click instant), not a buffer of events: the as-of semantics
  * only ever need the latest prior right row, so the
  * `flatMapGroupsWithState` state neither grows with history nor
  * needs eviction. Within a micro-batch rows are sorted by
  * (ts, kind) before folding — "click" < "purchase" lexically, so a
  * click at the same instant is visible to that purchase, matching
  * the batch twin's (ts, event_type) window order and ASOF's `>=`.
  *
  * Contract: the feed is in order ACROSS batches per user (a batch
  * never carries an event older than a previous batch's — true for
  * replayed logs and event-time-partitioned feeds). A late click
  * cannot retro-enrich an already-emitted purchase; the batch
  * operator is the replay/backfill tool, as everywhere else in the
  * streaming pack (AsOfStreamSpec pins streamed ≡ batch on an
  * in-order feed split at arbitrary batch boundaries).
  */
object AsOfStream {

  case class Ev(user: Long, tsMicros: Long, kind: String, value: Double)

  case class Enriched(user: Long, buyMicros: Long, clickMicros: Long,
      waitS: Long, value: Double)

  /** Per-user state: the last click instant (codegen'd encoders need
    * the class public). Updates are MONOTONE — [[fold]] only advances
    * the instant, so a feed violating the in-order contract cannot
    * regress the frontier: a late (older) click is ignored rather
    * than silently swapped under later purchases. True replays are
    * already covered by the state store's versioning.
    */
  case class LastClick(tsMicros: Long)

  /** Fold one user's batch slice over the carried last-click state. */
  private def fold(user: Long, rows: Iterator[Ev],
      state: GroupState[LastClick]): Iterator[Enriched] = {
    val sorted = rows.toIndexedSeq.sortBy(e => (e.tsMicros, e.kind))
    var last = state.getOption.map(_.tsMicros)
    val out = Seq.newBuilder[Enriched]
    sorted.foreach { e =>
      if (e.kind == "click" && !last.exists(_ >= e.tsMicros))
        last = Some(e.tsMicros)
      else if (e.kind == "purchase") last.foreach { ct =>
        // second-grain wait like the batch twin's unix_timestamp diff
        out += Enriched(user, e.tsMicros, ct,
          e.tsMicros / 1000000L - ct / 1000000L, e.value)
      }
    }
    last.foreach(ts => state.update(LastClick(ts)))
    out.result().iterator
  }

  /** Enrich a streaming event frame; the caller starts the sink. */
  def enrich(events: Dataset[Ev]): Dataset[Enriched] = {
    require(events.isStreaming, "enrich expects a streaming frame")
    import events.sparkSession.implicits._
    events.groupByKey(_.user)
      .flatMapGroupsWithState[LastClick, Enriched](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(fold)
  }
}
