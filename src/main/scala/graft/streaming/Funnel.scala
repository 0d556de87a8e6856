package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel analysis — the streaming twin of q45: per user, the
  * first signup, the first purchase at-or-after it, and whether conversion
  * happened within the horizon.
  *
  * State per user is O(1) + a small purchase buffer: the first signup seen,
  * and the `maxPendingPurchases` SMALLEST purchase timestamps (a purchase can
  * only be the answer if it's among the smallest — retaining the k smallest
  * makes results exact whenever a user has <= k purchases inside the
  * watermark horizon, and keeps state bounded regardless of stream length).
  * A user's funnel record is emitted exactly once, when the event-time
  * watermark passes their last activity + the horizon (EventTimeTimeout).
  * After emission the state becomes a TOMBSTONE (emitted=true) retained for
  * `TombstoneUs` past the user's last activity: re-activity inside that
  * window refreshes the tombstone and is NOT re-emitted, so a user row is
  * emitted at most once per tombstone lifetime (vs. the pre-fix behavior
  * where any post-emission event re-created fresh state and produced a
  * duplicate row). A user silent for longer than the tombstone horizon who
  * then reappears is indistinguishable from a new user — that bound is the
  * price of bounded state, and is the documented divergence from batch
  * q45's unbounded first-purchase semantics.
  */
object Funnel {

  case class FunnelEvent(user_id: Long, event_type: String, ts_us: Long)
  case class FunnelState(signupUs: Long, pending: List[Long], lastSeenUs: Long,
                         emitted: Boolean = false)
  case class Conversion(user_id: Long, signup_us: Long, purchase_us: Option[Long], converted_1h: Long)

  val HorizonUs: Long = 3600000000L    // 1 h
  val TombstoneUs: Long = 86400000000L // 24 h of post-emission dedup memory

  def conversions(
      events: Dataset[FunnelEvent],
      watermarkDelay: String = "30 minutes",
      maxPendingPurchases: Int = 32): Dataset[Conversion] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", watermarkDelay)
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        processUser(maxPendingPurchases))
  }

  private def processUser(maxPending: Int)(
      userId: Long,
      events: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[Conversion] = {
    if (events.isEmpty && state.hasTimedOut) {
      val s = state.get
      if (s.emitted || s.signupUs < 0) {
        // tombstone expiry, or purchases-only user: nothing (more) to emit
        state.remove()
        return Iterator.empty
      }
      // emit once, then hold a tombstone so later events for this user
      // cannot re-create fresh state and duplicate the row
      state.update(FunnelState(s.signupUs, Nil, s.lastSeenUs, emitted = true))
      // clamp: the watermark may already be past lastSeen+tombstone (a big
      // event-time jump); a timeout below the watermark is rejected
      state.setTimeoutTimestamp(math.max(
        s.lastSeenUs / 1000 + TombstoneUs / 1000, state.getCurrentWatermarkMs + 1))
      val firstPurchase = s.pending.filter(_ >= s.signupUs).sorted.headOption
      return Iterator(Conversion(userId, s.signupUs, firstPurchase,
        if (firstPurchase.exists(_ - s.signupUs <= HorizonUs)) 1L else 0L))
    }
    var s = state.getOption.getOrElse(FunnelState(-1L, Nil, 0L))
    if (s.emitted) {
      // already emitted: swallow late/re-activity, refresh the tombstone
      val last = events.foldLeft(s.lastSeenUs)((m, e) => math.max(m, e.ts_us))
      state.update(s.copy(lastSeenUs = last))
      state.setTimeoutTimestamp(math.max(
        last / 1000 + TombstoneUs / 1000, state.getCurrentWatermarkMs + 1))
      return Iterator.empty
    }
    for (e <- events) {
      s = e.event_type match {
        case "signup" =>
          val first = if (s.signupUs < 0) e.ts_us else math.min(s.signupUs, e.ts_us)
          s.copy(signupUs = first, lastSeenUs = math.max(s.lastSeenUs, e.ts_us))
        case "purchase" =>
          // keep the k smallest purchase times; anything larger can only be
          // the answer if all smaller ones precede the final first-signup,
          // in which case one of the retained k is still correct or the
          // user had > k purchases (documented approximation bound)
          val kept = (e.ts_us :: s.pending).sorted.take(maxPending)
          s.copy(pending = kept, lastSeenUs = math.max(s.lastSeenUs, e.ts_us))
        case _ =>
          s.copy(lastSeenUs = math.max(s.lastSeenUs, e.ts_us))
      }
    }
    state.update(s)
    // finalize once the watermark passes last activity + horizon
    state.setTimeoutTimestamp(s.lastSeenUs / 1000 + HorizonUs / 1000 + 1)
    Iterator.empty
  }
}
