package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators for the events stream.
  *
  * The reference is pure batch (SURVEY §2.10); these are the engine's
  * streaming extensions, designed so their BATCH twins (q10_sessionize,
  * q19_event_windows) compute identical results — the standard
  * lambda-architecture check, used by StreamingSpec.
  *
  * Scale: state is per-user (one open session, 32 bytes); watermark bounds
  * state growth; the shuffle is the groupByKey on user_id only.
  */
object Sessionizer {

  case class Event(user_id: Long, event_id: Long, ts_us: Long, value: Double)
  case class SessionState(startUs: Long, endUs: Long, nEvents: Long)
  case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  /** Gap-based sessionization with event-time timeout. Emits a session when
    * a gap > `gapUs` is observed within a key's batch, or when the watermark
    * passes the open session's end + gap (timeout). */
  def sessionize(events: Dataset[Event], gapUs: Long, watermarkDelay: String = "30 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", watermarkDelay)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        processUser(gapUs))
  }

  private def processUser(gapUs: Long)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (events.isEmpty && state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(Session(userId, s.startUs, s.endUs, s.nEvents))
    }
    val sorted = events.toArray.sortBy(e => (e.ts_us, e.event_id))
    val out = scala.collection.mutable.ArrayBuffer.empty[Session]
    var cur = state.getOption
    for (e <- sorted) {
      cur match {
        case Some(s) if e.ts_us - s.endUs > gapUs =>
          out += Session(userId, s.startUs, s.endUs, s.nEvents)
          cur = Some(SessionState(e.ts_us, e.ts_us, 1))
        case Some(s) =>
          cur = Some(SessionState(s.startUs, math.max(s.endUs, e.ts_us), s.nEvents + 1))
        case None =>
          cur = Some(SessionState(e.ts_us, e.ts_us, 1))
      }
    }
    cur.foreach { s =>
      state.update(s)
      // close the session once the watermark passes its end + gap
      state.setTimeoutTimestamp((s.endUs + gapUs) / 1000 + 1)
    }
    out.iterator
  }

  /** Stream-stream interval join: each purchase event joined to the signup
    * events of the same user within the preceding `intervalUs`. Watermarks
    * on BOTH sides + the time-range condition bound the join state — the
    * canonical streaming-join shape (batch twin: q31's as-of join, which
    * keeps only the latest; the interval join keeps all matches in range).
    */
  def purchasesWithRecentSignups(
      purchases: Dataset[Event],
      signups: Dataset[Event],
      intervalUs: Long,
      watermarkDelay: String = "30 minutes"): org.apache.spark.sql.DataFrame = {
    // NOTE: interval carries full microsecond granularity (INTERVAL n
    // MICROSECONDS) — dividing down to seconds would truncate sub-second
    // lookbacks
    val p = purchases
      .withColumn("p_ts", timestamp_micros(col("ts_us")))
      .withWatermark("p_ts", watermarkDelay)
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("p_ts"), col("ts_us").as("p_ts_us"))
    val sWm = signups
      .withColumn("s_ts", timestamp_micros(col("ts_us")))
      .withWatermark("s_ts", watermarkDelay)
      .select(col("user_id").as("s_user"), col("event_id").as("signup_id"),
        col("s_ts"), col("ts_us").as("s_ts_us"))
    p.join(sWm,
      col("p_user") === col("s_user") &&
        col("s_ts") >= col("p_ts") - expr(s"INTERVAL $intervalUs MICROSECONDS") &&
        col("s_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("signup_id"), col("p_user").as("user_id"),
        col("p_ts_us"), col("s_ts_us"))
  }

  /** Tumbling 1 h event-time windowed aggregation: per-window event count
    * and value sum. (q19's batch version additionally groups by event_type,
    * which [[Event]] does not carry — group further upstream if needed.) */
  def windowedCounts(events: Dataset[Event]): Dataset[(Long, Long, Double)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("n"), col("sum_value"))
      .as[(Long, Long, Double)]
  }

  /** Hopping (sliding) event-time windows — the streaming twin of the
    * batch q44: `length`-wide windows every `hop`, so each event lands in
    * length/hop windows. Same state model as tumbling (one row per open
    * window), watermark-bounded. */
  def hoppingCounts(
      events: Dataset[Event],
      length: String = "1 hour", hop: String = "30 minutes"): Dataset[(Long, Long, Double)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), length, hop))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("n"), col("sum_value"))
      .as[(Long, Long, Double)]
  }
}
