package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Streaming windowed distinct-count — the streaming face of the q35/q138
  * deterministic HLL. Per (eventType, event-time window) the stream keeps
  * the 64-register table as ordinary windowed-aggregation state (a max per
  * register: AT MOST 64 ints per open window per type, regardless of
  * throughput — the whole point of sketching an unbounded stream), and
  * emits the registers once the watermark closes the window. The estimate
  * is then [[estimate]]'s trivial integer fold — done downstream, exactly
  * the [[StreamingDrift]] emission discipline, so append mode guarantees
  * one immutable register set per closed (window, type).
  *
  * Registers are built with the SAME portable hash/rho as batch q35, so a
  * closed window's estimate is bit-equal to running the batch query over
  * that window's rows — StreamingDistinctSpec proves it across arbitrary
  * micro-batch splits.
  */
object StreamingDistinct {

  case class Ev(eventType: String, userId: Long, tsUs: Long)

  /** Per-(type, window) HLL registers, emitted on window close. `bucket`
    * is the window index (start div windowLen — divisor derived from the
    * SAME string that sized the window). */
  def registers(
      events: Dataset[Ev],
      windowLen: String = "6 hours",
      watermark: String = "1 hour"): DataFrame = {
    val windowMicros = Windows.windowMicros(windowLen)
    events
      .withColumn("tsx", timestamp_micros(col("tsUs")))
      .withWatermark("tsx", watermark)
      .withColumn("h", TextOps.portableHash28(
        concat(lit("hll:"), col("userId").cast("string"))))
      .select(col("eventType"), col("tsx"), (col("h") % 64).as("idx"),
        expr("h div 64").as("w"))
      .withColumn("rho", when(col("w") === 0, lit(23))
        .otherwise(lit(23) - length(bin(col("w")))))
      .groupBy(col("eventType"), window(col("tsx"), windowLen).as("wd"), col("idx"))
      .agg(max(col("rho")).as("mreg"))
      .select(col("eventType"),
        expr(s"unix_micros(wd.start) div ${windowMicros}L").as("bucket"),
        col("idx"), col("mreg"))
  }

  /** Fold emitted registers into the q35 integer estimate per
    * (eventType, bucket) — batch-side, engine-portable (one integer
    * division, no libm). */
  def estimate(regs: DataFrame): DataFrame =
    regs.groupBy(col("eventType"), col("bucket"))
      .agg(sum(expr("shiftleft(1L, cast(23 - mreg AS int))")).as("sp"),
        count(lit(1)).as("nr"))
      .select(col("eventType"), col("bucket"), expr(
        "(709L * 4096L * 8388608L) div (1000L * (sp + (64 - nr) * 8388608L))")
        .as("hll_est"))
}
