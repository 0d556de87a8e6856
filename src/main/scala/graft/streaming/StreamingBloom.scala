package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Streaming windowed Bloom-filter build — the streaming face of q153's
  * deterministic membership sketch. Per (eventType, event-time window)
  * the stream keeps the 63-bit-word table as ordinary windowed
  * aggregation state (a bit_or per word: AT MOST ~66 longs per open
  * window per type regardless of throughput — bit_or is associative and
  * commutative, so ingestion order and micro-batch splits cannot change
  * the words), and emits the words when the watermark closes the window.
  * Downstream membership testing is the same two-probe bit check as
  * batch q153; a closed window's word table is bit-equal to building the
  * batch bloom over that window's rows — StreamingBloomSpec proves it
  * across arbitrary micro-batch splits.
  *
  * This completes the mergeable-sketch family's streaming column:
  * distinct ([[StreamingDistinct]] HLL max-merge), quantile
  * ([[StreamingQuantile]] octave counters), membership (bit_or words).
  */
object StreamingBloom {

  case class Ev(eventType: String, userId: Long, tsUs: Long)

  /** Per-(type, window) bloom words, emitted on window close. Two probes
    * per key from the portable 28-bit hash (m = 4096 positions in
    * 63-bit words — the sign bit stays clear, the q153 convention). */
  def words(
      events: Dataset[Ev],
      windowLen: String = "6 hours",
      watermark: String = "1 hour"): DataFrame = {
    val windowMicros = Windows.windowMicros(windowLen)
    events
      .withColumn("tsx", timestamp_micros(col("tsUs")))
      .withWatermark("tsx", watermark)
      .withColumn("h", TextOps.portableHash28(
        concat(lit("bf:"), col("userId").cast("string"))))
      .select(col("eventType"), col("tsx"),
        explode(array(expr("h % 4096"), expr("(h div 4096) % 4096"))).as("p"))
      .groupBy(col("eventType"), window(col("tsx"), windowLen).as("wd"),
        expr("p div 63").as("w"))
      .agg(expr("bit_or(shiftleft(1L, CAST(p % 63 AS INT)))").as("bits"))
      .select(col("eventType"),
        expr(s"unix_micros(wd.start) div ${windowMicros}L").as("bucket"),
        col("w"), col("bits"))
  }

  /** The batch twin over the same rows: identical words per
    * (eventType, bucket) — what a closed streaming window must equal. */
  def batchWords(events: Dataset[Ev], windowLen: String): DataFrame = {
    val windowMicros = Windows.windowMicros(windowLen)
    events.toDF()
      .withColumn("h", TextOps.portableHash28(
        concat(lit("bf:"), col("userId").cast("string"))))
      .select(col("eventType"),
        expr(s"tsUs div ${windowMicros}L").as("bucket"),
        explode(array(expr("h % 4096"), expr("(h div 4096) % 4096"))).as("p"))
      .groupBy(col("eventType"), col("bucket"), expr("p div 63").as("w"))
      .agg(expr("bit_or(shiftleft(1L, CAST(p % 63 AS INT)))").as("bits"))
  }

}
