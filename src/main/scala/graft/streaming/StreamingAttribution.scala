package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-touch attribution — the streaming twin of batch q119:
  * click/view events update a per-user "last touch" state, and every
  * purchase immediately emits its attribution (the most recent touch
  * at-or-before it within the window, else "none").
  *
  * State per user is ONE (ts, type) pair — O(1) forever, the streaming
  * advantage over the batch union+window which re-sorts history every run.
  * On in-order delivery per user (the same contract as
  * [[StreamingPacker]]/[[StreamingUpsert]]'s replay), the emitted
  * attributions equal batch q119's pre-aggregation relation row for row;
  * micro-batch boundaries can't change the answer because the within-batch
  * sort and the carried state reconstruct the same total order q119's
  * window sorts by: (ts, touch-before-purchase, event_id).
  *
  * A production deployment would add an event-time timeout to age out
  * users whose window has passed; the attribution window itself already
  * bounds how stale a credited touch can be.
  */
object StreamingAttribution {

  case class Ev(userId: Long, tsUs: Long, eventId: Long, eventType: String)
  case class Attribution(userId: Long, purchaseId: Long, touch: String, gapUs: Long)

  /** Per-user state: the latest touch (public — the state encoder's
    * generated code needs constructor access). */
  case class Touch(tsUs: Long, eventId: Long, eventType: String)

  val WindowUs: Long = 3600000000L // 1 hour, the q119 constant
  /** Sentinel gap for unattributed purchases (batch q119 reports NULL; a
    * case-class field can't, so the spec maps -1 <-> null). */
  val NoGap: Long = -1L

  def attribute(events: Dataset[Ev]): Dataset[Attribution] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }

  /** Batch-replay reference for the spec: fold one user's full in-order
    * log through the same transition. */
  def replay(log: Seq[Ev]): Seq[Attribution] = {
    var st = Option.empty[Touch]
    sortBatch(log).flatMap { e =>
      val (out, st2) = transition(e, st)
      st = st2
      out
    }
  }

  /** Within a micro-batch, touches sort before purchases at the same ts —
    * the q119 window order (ts, kind, event_id). */
  private def sortBatch(es: Seq[Ev]): Seq[Ev] =
    es.sortBy(e => (e.tsUs, kind(e.eventType), e.eventId))

  private def kind(t: String): Int = if (t == "purchase") 1 else 0

  private def transition(e: Ev, st: Option[Touch]): (Option[Attribution], Option[Touch]) =
    e.eventType match {
      case "click" | "view" =>
        // in-order contract makes this monotone; keep max defensively
        val better = st.forall(t =>
          e.tsUs > t.tsUs || (e.tsUs == t.tsUs && e.eventId >= t.eventId))
        (None, if (better) Some(Touch(e.tsUs, e.eventId, e.eventType)) else st)
      case "purchase" =>
        val attributed = st.filter(t => e.tsUs - t.tsUs <= WindowUs)
        val att = Attribution(e.userId, e.eventId,
          attributed.map(_.eventType).getOrElse("none"),
          attributed.map(t => e.tsUs - t.tsUs).getOrElse(NoGap))
        (Some(att), st)
      case _ => (None, st)
    }

  private def step(
      userId: Long,
      events: Iterator[Ev],
      state: GroupState[Touch]): Iterator[Attribution] = {
    var st = state.getOption
    val out = Seq.newBuilder[Attribution]
    sortBatch(events.toSeq).foreach { e =>
      val (o, st2) = transition(e, st)
      o.foreach(out += _)
      st = st2
    }
    st.foreach(state.update)
    out.result().iterator
  }
}
