package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming incremental-rollup maintenance — the streaming twin of
  * batch q178: a snapshot changelog flows in as a stream of signed
  * per-file deltas (the base snapshot's files are just +1 deltas), and
  * the maintained state is the per-content (file count, rows, bytes)
  * rollup a table consumer would otherwise recompute by rescanning.
  *
  * The fold is a Complete-mode aggregation of associative/commutative
  * exact integer sums, so the final state is identical under ANY
  * micro-batch split of the delta stream — the same reason the batch
  * fold is partitioning-proof. State is content-kind-sized (≤3 rows):
  * a consumer can keep a 100 TB table's rollup current from
  * metadata-sized deltas at any arrival granularity (per commit, per
  * file, or arbitrary re-batchings in between).
  */
object StreamingMaintenance {

  /** One changelog row: sign +1 for an added file, -1 for a removed
    * one; `content` is the Iceberg content kind (0 data, 1/2 deletes). */
  case class Delta(content: Int, sign: Long, rc: Long, bytes: Long)

  def totals(deltas: Dataset[Delta]): DataFrame =
    deltas.groupBy(col("content"))
      .agg(sum(col("sign")).as("n_files"),
        sum(col("sign") * col("rc")).as("total_rows"),
        sum(col("sign") * col("bytes")).as("total_bytes"))

  /** Batch reference: the q178 fold over the same deltas. */
  def replay(deltas: Seq[Delta]): Map[Int, (Long, Long, Long)] =
    deltas.groupBy(_.content).map { case (c, ds) =>
      c -> (ds.map(_.sign).sum,
        ds.map(d => d.sign * d.rc).sum,
        ds.map(d => d.sign * d.bytes).sum)
    }
}
