package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.metrics.MetricsCalculator
import graft.model.{EngineConfig, FileEntry, TableMetricsWide}

/** Streaming diagnostics: the metrics pipeline over a STREAM of file
  * entries (the natural seam SURVEY §2.10 identifies — a snapshot-diff or
  * manifest-tail stream). Each micro-batch recomputes the affected tables'
  * metrics via `foreachBatch`, reusing the exact batch pipeline — the
  * standard pattern for making a batch engine incremental without
  * duplicating operator logic.
  *
  * Each micro-batch is diagnosed INDEPENDENTLY (a batch = one snapshot's
  * file set). Cumulative-over-the-stream metrics are the caller's concern:
  * accumulate batches in `onBatch` (e.g. append to a table and re-aggregate)
  * — this operator deliberately keeps no cross-batch state.
  */
object MetricsStream {

  /** Start a streaming query that runs `onBatch` with the per-batch wide
    * metrics of every table present in that micro-batch. */
  def start(
      entries: Dataset[FileEntry],
      manifestCountPerTable: Long,
      cfg: EngineConfig = EngineConfig.default)(
      onBatch: (Dataset[TableMetricsWide], Long) => Unit): StreamingQuery = {
    entries.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: Dataset[FileEntry], batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val mc = batch.select("table").distinct().as[String]
          .map(t => (t, manifestCountPerTable))
        onBatch(MetricsCalculator.computeMetricsWide(batch, mc, cfg), batchId)
      }
      .start()
  }
}
