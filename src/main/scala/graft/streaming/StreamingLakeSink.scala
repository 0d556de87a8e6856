package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CDC → REAL LAYOUT sink (the eighteenth batch twin, and the
  * one that ties the streaming family to the lake-write family): each
  * micro-batch of changes is compacted batch-locally with the q76
  * latest-wins discipline ([[graft.operators.CdcOps.latestWins]] keeps
  * the winning upsert per key; the delete set is what that filter
  * dropped), then committed to an on-disk v2 table as ONE
  * [[graft.sources.LayoutMaintenance.commitMerge]] — one data file +
  * one equality-delete file per trigger, cost O(micro-batch).
  *
  * Convergence contract (StreamingLakeSinkSpec): for an in-ORDER change
  * log split at ARBITRARY micro-batch boundaries, the table's
  * merge-on-read state after the last trigger equals the batch
  * latest-wins merge of the whole log — per-key versions are
  * non-decreasing across ordered batches, so each commit's tombstones
  * only ever kill strictly older rows. (Cross-batch REORDERING is the
  * log transport's contract, exactly as for a real CDC sink; in-batch
  * disorder is absorbed by the local compaction.)
  *
  * At 100 TB: the table's existing files are never read or rewritten by
  * a commit — the sink's steady-state cost is the change rate, and the
  * accumulating tombstones are exactly what
  * [[graft.sources.LayoutMaintenance.rewriteDataFiles]] periodically
  * folds away.
  */
object StreamingLakeSink {

  import StreamingUpsert.Change

  /** One micro-batch → one commit. Exposed for the spec's direct use. */
  def commitBatch(batch: Dataset[Change], tableDir: String): Unit = {
    val spark = batch.sparkSession
    val rows = batch.toDF()
    if (!rows.isEmpty) {
      val winners = graft.operators.CdcOps
        .latestWins(rows, Seq("k"), "version", "op")
        .withColumn("op", lit("U"))
      // keys whose winner was a delete: tombstone only, no re-add
      val deleted = rows.select(col("k")).distinct()
        .join(winners.select(col("k")), Seq("k"), "left_anti")
        .withColumn("version", lit(0L)).withColumn("op", lit("D"))
        .withColumn("price", lit(0.0))
        .select(col("k"), col("version"), col("op"), col("price"))
      graft.sources.LayoutMaintenance.commitMerge(spark, tableDir,
        winners.select(col("k"), col("version"), col("op"), col("price"))
          .unionByName(deleted),
        Seq("k"), "op")
    }
  }

  /** Start the streaming sink: foreachBatch → commitBatch. */
  def start(changes: Dataset[Change], tableDir: String,
      checkpointDir: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Change], _: Long) =>
        commitBatch(batch, tableDir)
      }
      .start()
}
