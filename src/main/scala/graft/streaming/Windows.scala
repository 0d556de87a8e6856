package graft.streaming

/** Shared event-time window arithmetic for the streaming twins. */
object Windows {

  /** Micros per window for a Spark window-duration string — derived from
    * the SAME string that sizes the window, so a bucket label
    * (`unix_micros(w.start) div windowMicros`) is always a unique window
    * index under ANY windowLen (the StreamingDrift round-5 advice item:
    * a hard-coded divisor collapsed distinct windows once the struct was
    * dropped). Month-bearing intervals are rejected — they have no fixed
    * micro length. */
  def windowMicros(windowLen: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(windowLen))
    require(iv.months == 0, s"windowLen must be a fixed duration: $windowLen")
    iv.days * 86400000000L + iv.microseconds
  }
}
