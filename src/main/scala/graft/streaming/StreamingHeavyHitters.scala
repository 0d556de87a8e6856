package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy-hitter alerting — the streaming twin of batch q84:
  * emit each key EXACTLY ONCE, at the moment its cumulative count crosses
  * the alert threshold.
  *
  * Batch q84 asks "which keys exceed share n/64 of the finished stream";
  * an unbounded stream has no final n, so the streaming form uses an
  * absolute threshold (the standard alerting semantics). Parity with a
  * batch recount is exact: the flagged set after the stream drains equals
  * `SELECT k FROM stream GROUP BY k HAVING count(*) >= threshold` — counts
  * are integer state, so arrival order and micro-batch boundaries cannot
  * change the set (only the crossing TIME, which is inherently
  * order-defined).
  *
  * State per key is (count, alerted) — two fields, O(distinct keys). At
  * 100 TB the key domain (tokens, URLs) makes that unbounded; the scale
  * path is the same two-pass shape as q84: a per-executor Misra-Gries
  * prefilter in `transform` before the keyed state, so only candidate
  * keys ever reach state — or a `GroupStateTimeout` TTL when alerts may
  * recur per window. The exact keyed form here is the correctness anchor
  * the spec gates against the batch recount. */
object StreamingHeavyHitters {

  case class KeyEvent(k: String, event_id: Long)
  case class HitState(n: Long, alerted: Boolean)
  case class Alert(k: String, n_at_alert: Long)

  def alerts(events: Dataset[KeyEvent], threshold: Long): Dataset[Alert] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[KeyEvent], state: GroupState[HitState]) =>
          val prev = state.getOption.getOrElse(HitState(0L, alerted = false))
          val n = prev.n + batch.size
          val crossed = !prev.alerted && n >= threshold
          state.update(HitState(n, prev.alerted || crossed))
          if (crossed) Iterator.single(Alert(key, n)) else Iterator.empty
      }
  }
}
