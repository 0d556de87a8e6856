package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.operators.{SketchOps, TextOps}

/** Streaming windowed KMV distinct sketch — the streaming face of
  * q90/q164. Per (eventType, event-time window) the stream keeps the
  * bounded min-k set as ordinary windowed-aggregation state (AT MOST k
  * longs per open window per type regardless of throughput — the
  * [[StreamingDistinct]] state discipline with the KMV sketch instead
  * of HLL registers), and emits the sketch once the watermark closes
  * the window. Because [[graft.functions.MinKDistinct]] is a distinct
  * min-k — associative, commutative, duplicate-insensitive — a closed
  * window's sketch is bit-equal to the batch build over that window's
  * rows for ANY micro-batch arrival order (StreamingKmvSpec proves it).
  *
  * Downstream the sketches stay ALGEBRAIC: [[setAlgebra]] runs the
  * shared [[SketchOps.kmvAlgebra]] between two event types per closed
  * window, so union / intersection / difference distinct estimates of
  * live traffic cost one k-array join per window — the q164 semantics
  * on a stream.
  */
object StreamingKmv {

  case class Ev(eventType: String, userId: Long, tsUs: Long)

  /** Per-(type, window) KMV sketch, emitted on window close. `bucket`
    * indexes the window (start div windowLen). */
  def sketches(
      events: Dataset[Ev],
      k: Int = 64,
      windowLen: String = "6 hours",
      watermark: String = "1 hour"): DataFrame = {
    val windowMicros = Windows.windowMicros(windowLen)
    val minK = udaf(new graft.functions.MinKDistinct.MinK(k),
      org.apache.spark.sql.Encoders.scalaLong)
    events
      .withColumn("tsx", timestamp_micros(col("tsUs")))
      .withWatermark("tsx", watermark)
      .withColumn("h", TextOps.portableHash28(
        concat(lit("kmv:"), col("userId").cast("string"))))
      .groupBy(col("eventType"), window(col("tsx"), windowLen).as("wd"))
      .agg(minK(col("h")).as("mins"))
      .select(col("eventType"),
        expr(s"unix_micros(wd.start) div ${windowMicros}L").as("bucket"),
        col("mins"))
  }

  /** Distinct estimate per emitted sketch: exact size when unsaturated,
    * (k-1)·2^28 div kth otherwise — the q90 fold. */
  def estimate(sketches: DataFrame, k: Int = 64): DataFrame =
    sketches.select(col("eventType"), col("bucket"),
      when(size(col("mins")) < k, size(col("mins")).cast("long"))
        .otherwise(expr(s"(${k - 1} * ${SketchOps.HashDomain}L) div element_at(mins, $k)"))
        .as("kmv_est"))

  /** q164's set algebra between two event types per closed window:
    * est(A∪B / A∩B / A∖B) + Jaccard bp from the emitted sketches. A
    * window where only ONE type emitted still gets a row — the absent
    * side is the EMPTY sketch (theta convention: complete set, zero
    * counts), so "B saw nothing" reads as est_inter=0 / est_union=
    * est(A), never as a silently missing window. */
  def setAlgebra(sketches: DataFrame, typeA: String, typeB: String,
      k: Int = 64): DataFrame = {
    val emptySk = array().cast("array<bigint>")
    val a = sketches.filter(col("eventType") === typeA)
      .select(col("bucket").as("a_bucket"), col("mins").as("a_mins"))
    val b = sketches.filter(col("eventType") === typeB)
      .select(col("bucket").as("b_bucket"), col("mins").as("b_mins"))
    val joined = a.join(b, col("a_bucket") === col("b_bucket"), "full_outer")
      .select(coalesce(col("a_bucket"), col("b_bucket")).as("bucket"),
        coalesce(col("a_mins"), emptySk).as("am"),
        coalesce(col("b_mins"), emptySk).as("bm"))
    SketchOps.kmvAlgebra(joined, k)
      .select(col("bucket"), col("theta"), col("n_union"), col("n_inter"),
        col("est_union"), col("est_inter"), col("est_anotb"), col("jaccard_bp"))
      .orderBy(col("bucket"))
  }
}
