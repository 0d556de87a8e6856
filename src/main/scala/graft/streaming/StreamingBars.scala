package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming OHLC bars — the streaming twin of batch q125: event-time
  * 6-hour windows with a 1-hour watermark; open/close are the same
  * struct-min/max aggregates the batch query uses (argmin/argmax by
  * (ts, event_id) — fully supported inside a streaming windowed
  * HashAggregate, no flatMapGroupsWithState needed).
  *
  * Append mode: a bar is emitted exactly once, when the watermark passes
  * its window end — so bars are CLOSED and immutable downstream, and state
  * per open window is one candidate bar (partial aggregation works in
  * streaming exactly as in batch). `window('6 hours')` aligns to the epoch,
  * which is bit-identical to batch q125's `ts_us div 21600000000`
  * bucketing. */
object StreamingBars {

  case class Ev(eventType: String, tsUs: Long, eventId: Long, vm: Long)

  def bars(events: Dataset[Ev]): DataFrame =
    events
      .withColumn("tsx", timestamp_micros(col("tsUs")))
      .withWatermark("tsx", "1 hour")
      .groupBy(col("eventType"), window(col("tsx"), "6 hours").as("w"))
      .agg(count(lit(1)).as("n"),
        min(struct(col("tsUs"), col("eventId"), col("vm"))).as("o"),
        max(struct(col("tsUs"), col("eventId"), col("vm"))).as("c"),
        max(col("vm")).as("hi"), min(col("vm")).as("lo"))
      .select(col("eventType"),
        expr("unix_micros(w.start) div 21600000000").as("bucket"),
        col("n"), col("o.vm").as("open"), col("hi"), col("lo"), col("c.vm").as("close"))
}
