package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming windowed quantile sketch — the streaming face of batch
  * q145's log-octave histogram. Per (eventType, event-time window) the
  * state is one counter per occupied octave (bucket = bit-length of the
  * value, ≤64 counters regardless of throughput), kept as ordinary
  * windowed-aggregation state and emitted on window close — the
  * [[StreamingDrift]]/[[StreamingDistinct]] emission discipline. The
  * approximate quantile (within one octave of exact BY CONSTRUCTION) is
  * [[estimate]]'s integer fold downstream.
  */
object StreamingQuantile {

  case class Ev(eventType: String, tsUs: Long, v: Long)

  /** Per-(type, window, octave) counts, emitted on window close. */
  def octaves(
      events: Dataset[Ev],
      windowLen: String = "6 hours",
      watermark: String = "1 hour"): DataFrame = {
    val windowMicros = Windows.windowMicros(windowLen)
    events
      .withColumn("tsx", timestamp_micros(col("tsUs")))
      .withWatermark("tsx", watermark)
      // the sketch is defined over POSITIVE magnitudes; non-positive v
      // clamps to octave 1 (bin() of a negative long is 64 bits of two's
      // complement and shiftleft(1L, 64) wraps — garbage, not an error)
      .withColumn("b", length(bin(greatest(col("v"), lit(1L)))))
      .groupBy(col("eventType"), window(col("tsx"), windowLen).as("w"), col("b"))
      .agg(count(lit(1)).as("c"))
      .select(col("eventType"),
        expr(s"unix_micros(w.start) div ${windowMicros}L").as("bucket"),
        col("b"), col("c"))
  }

  /** Fold emitted octave counts into the q145 approximate quantile
    * (upper octave boundary 2^b at the rank crossing) per
    * (eventType, bucket) — batch-side, pure integer. */
  def estimate(octs: DataFrame, p: (Int, Int) = (1, 2)): DataFrame = {
    val (num, den) = p
    import org.apache.spark.sql.expressions.Window
    val wf = Window.partitionBy(col("eventType"), col("bucket"))
    octs
      .withColumn("cum", sum(col("c")).over(wf.orderBy(col("b"))))
      .withColumn("n", sum(col("c")).over(wf))
      .groupBy(col("eventType"), col("bucket"))
      .agg(min(when(col("cum") >= expr(s"($num * n + $den - 1) div $den"), col("b")))
        .as("bq"))
      .select(col("eventType"), col("bucket"),
        expr("shiftleft(1L, bq)").as("approx_q"))
  }
}
