package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming z-score anomaly detection — the streaming twin of batch q72:
  * each event is scored against the running mean/stddev of its event_type's
  * history BEFORE it, and emitted when |z| > threshold with at least
  * `minHistory` prior events.
  *
  * State per event_type is exactly the batch query's expanding-window
  * aggregate: (count, sum, sum-of-squares) of the ×1000-quantized values —
  * three longs, O(1) forever, no watermark needed (the key domain is the
  * event-type vocabulary, not users or time). Because the moments are
  * integer sums, state is exact regardless of how the stream is partitioned
  * or batched; the z computation is the same scalar chain as q72's.
  *
  * Ordering caveat (the documented divergence from batch): the batch twin
  * scores in global (ts_us, event_id) order; the stream scores in arrival
  * order, sorting within each micro-batch by (ts_us, event_id). When events
  * arrive in event-time order across batches — the spec's setup — the two
  * are identical; out-of-order arrivals score against the history seen so
  * far, which is the standard online-detector semantics. */
object AnomalyDetector {

  case class ValueEvent(event_id: Long, event_type: String, ts_us: Long, value: Double)
  case class Moments(n: Long, s: Long, ss: Long)
  case class Anomaly(event_id: Long, event_type: String, v: Long, n_prior: Long, z: Double)

  val MinHistory = 30
  val Threshold = 3.0

  def anomalies(events: Dataset[ValueEvent]): Dataset[Anomaly] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(scoreGroup)
  }

  private def scoreGroup(
      eventType: String,
      events: Iterator[ValueEvent],
      state: GroupState[Moments]): Iterator[Anomaly] = {
    var m = state.getOption.getOrElse(Moments(0L, 0L, 0L))
    val out = Vector.newBuilder[Anomaly]
    // within a micro-batch, score in event-time order (batch-twin parity)
    for (e <- events.toSeq.sortBy(ev => (ev.ts_us, ev.event_id))) {
      val v = math.floor(e.value * 1000).toLong
      if (m.n >= MinHistory) {
        val mean = m.s.toDouble / m.n
        val varr = (m.ss.toDouble - m.s.toDouble * m.s / m.n) / (m.n - 1)
        if (varr > 0) {
          val z = (v - mean) / math.sqrt(varr)
          if (math.abs(z) > Threshold) out += Anomaly(e.event_id, eventType, v, m.n, z)
        }
      }
      m = Moments(m.n + 1, m.s + v, m.ss + v * v)
    }
    state.update(m)
    out.result().iterator
  }
}
