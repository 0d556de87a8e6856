package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming drift monitor — the streaming face of batch q133: events
  * bucket MAP-SIDE against a STATIC reference-bin table (the week-1 decile
  * cuts a batch job computed), and event-time windows emit per-bin counts
  * once closed. The chi-square readout is then a trivial fold over each
  * closed window's 10 counts — done downstream (or in the spec), because a
  * drift DECISION wants the whole window, and append-mode emission
  * guarantees exactly one immutable count set per (window, type, bin).
  *
  * Shapes that matter at scale: the reference cuts are a stream-static
  * BROADCAST join (never a shuffle of the stream), bins are an integer
  * fold over a 9-element array, and state per open window is 10 counters
  * per event type — bounded regardless of throughput.
  */
object StreamingDrift {

  case class Ev(eventType: String, tsUs: Long, vm: Long)
  /** Reference decile cuts per type (9 ascending cut values). */
  case class RefBins(eventType: String, cuts: Array[Long])

  def binCounts(
      events: Dataset[Ev],
      ref: Dataset[RefBins],
      windowLen: String = "6 hours",
      watermark: String = "1 hour"): DataFrame = {
    // bucket = window index = start div windowLen ([[Windows.windowMicros]]:
    // derived from the SAME string that sized the window, so distinct
    // closed windows can never collapse to one label)
    val windowMicros = Windows.windowMicros(windowLen)
    events
      .withColumn("tsx", timestamp_micros(col("tsUs")))
      .withWatermark("tsx", watermark)
      .join(broadcast(ref), Seq("eventType"))
      .withColumn("bin", expr("size(filter(cuts, c -> vm > c)) + 1"))
      .groupBy(col("eventType"), window(col("tsx"), windowLen).as("w"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("eventType"),
        expr(s"unix_micros(w.start) div ${windowMicros}L").as("bucket"),
        col("bin"), col("n"))
  }

  /** Batch reference-cut computation (exact ntile(10) maxima — the q133
    * recipe) over a reference DataFrame of (eventType, vm, orderCol). */
  def referenceCuts(ref: DataFrame)(implicit s: SparkSession): Dataset[RefBins] = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    ref
      .withColumn("tile", ntile(10).over(
        Window.partitionBy(col("eventType")).orderBy(col("vm"), col("ord"))))
      .filter(col("tile") <= 9)
      .groupBy(col("eventType"), col("tile")).agg(max(col("vm")).as("cut"))
      .groupBy(col("eventType"))
      .agg(sort_array(collect_list(col("cut"))).as("cuts"))
      .as[RefBins]
  }
}
