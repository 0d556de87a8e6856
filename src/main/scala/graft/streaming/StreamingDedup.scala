package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming exact dedup for a document stream: the streaming twin of
  * q14/q36. State = one entry per content hash, bounded by the watermark
  * (Spark drops dedup state older than the event-time horizon), which is
  * what makes exact dedup feasible on an unbounded stream — the classic
  * training-data-ingest shape: new documents flow in, only first-seen
  * content survives within the dedup horizon.
  */
object StreamingDedup {

  case class Doc(doc_id: Long, text: String, ts_us: Long)

  /** First-seen-content documents within the watermark horizon.
    *
    * `dropDuplicatesWithinWatermark` — NOT plain `dropDuplicates` — is what
    * bounds the state: plain dropDuplicates only evicts state when the
    * event-time column is part of the dedup key, so keying on content_hash
    * alone would grow state forever on an unbounded stream. */
  def dedup(docs: Dataset[Doc], watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")
      .select(col("doc_id"), col("content_hash"), col("ts_us"))
}
