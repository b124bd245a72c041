package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.Mix

/** Arrival-time mixture sampling — the streaming form of [[Mix]]:
  * documents land on the stream and each SOURCE admits while its
  * running token total is under the fixed budget
  * ([[Mix.ArrivalBudget]]), then closes. The production use: cap each
  * source's contribution as data arrives, without a batch boundary or
  * a second pass.
  *
  * Physical shape: one `flatMapGroupsWithState` keyed on the source —
  * state is ONE long per source (tokens admitted so far), so total
  * state is O(sources) regardless of stream length, and sources
  * distribute by hash across executors. Within a micro-batch docs are
  * processed in doc_id order, so the decision sequence is
  * deterministic and EQUAL to the batch twin [[Mix.mixArrival]]
  * (pinned in MixStreamSpec; the twin itself is DuckDB-oracled as
  * `mix_arrival`).
  */
object MixStream {

  case class TokDoc(doc_id: Long, source: String, n_tokens: Long)
  case class Admitted(doc_id: Long, source: String, n_tokens: Long,
      cum_before: Long)

  /** The shared admission fold: admit while the tokens admitted
    * BEFORE the doc are under budget (the crossing doc is kept).
    */
  private[streaming] def admitFold(docs: Iterator[TokDoc],
      prior: Long): (Long, Seq[Admitted]) = {
    var used = prior
    val out = docs.toSeq.sortBy(_.doc_id).flatMap { d =>
      if (used < Mix.ArrivalBudget) {
        val before = used
        used += d.n_tokens
        Some(Admitted(d.doc_id, d.source, d.n_tokens, before))
      } else None
    }
    (used, out)
  }

  def admitted(docs: DataFrame): Dataset[Admitted] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .as[TokDoc]
      .groupByKey(_.source)
      .flatMapGroupsWithState[Long, Admitted](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state) =>
          val (used, adm) = admitFold(rows, state.getOption.getOrElse(0L))
          state.update(used)
          adm.iterator
      }
  }
}
