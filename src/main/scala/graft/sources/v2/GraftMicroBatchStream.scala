package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Incremental STREAMING reads from the layout:
  * `spark.readStream.format("graft-iceberg").load(tableDir)` tails the
  * table's commit history — the offset IS the snapshot id, each
  * micro-batch is exactly the data files a snapshot range appended
  * (resolved through the same manifest machinery as
  * [[graft.sources.IcebergManifestSource.changesBetween]]: a
  * metadata-sized diff, zero data I/O to plan), and rows come off the
  * same per-file parquet readers the batch scan uses. Restart safety is
  * the standard source contract: offsets serialize into the checkpoint,
  * `planInputPartitions(start, end)` is deterministic for a given
  * range. Append-only streams are the contract (Iceberg's own
  * incremental read restriction); a rewrite/compaction commit would
  * surface its output files as "added" — run maintenance on a paused
  * stream or filter by sequence downstream.
  *
  * At 100 TB: discovering a new commit costs one metadata-document read
  * + one manifest-list diff; the stream's steady-state work is the
  * append rate, never the table size.
  */
private[v2] class GraftMicroBatchStream(dir: String,
    required: StructType) extends MicroBatchStream {

  private def spark = SparkSession.active

  /** The PUBLISHED head (`current-snapshot-id`), falling back to
    * history-last only for legacy metadata without the pointer. A
    * WAP-staged snapshot ([[graft.sources.LayoutMaintenance.stageAppend]])
    * appends to the history while the head stays put, and a rollback
    * retains later snapshots in history — tailing history-last would
    * stream unaudited/rolled-back data, violating the isolation the
    * write-audit-publish flow promises readers. */
  private def currentSnapshot: Long =
    graft.sources.LayoutMaintenance.currentSnapshot(spark, dir)
      .getOrElse(0L)

  override def initialOffset(): Offset = GraftSnapOffset(0L)

  override def latestOffset(): Offset = GraftSnapOffset(currentSnapshot)

  override def deserializeOffset(json: String): Offset =
    GraftSnapOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  /** Data files appended in (start, end]. start == 0 means "from before
    * the first snapshot": everything visible at `end`. */
  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GraftSnapOffset].snapshotId
    val to = end.asInstanceOf[GraftSnapOffset].snapshotId
    if (to == 0L || to == from) return Array.empty
    val paths: Seq[String] =
      if (from == 0L) {
        // Full-snapshot initial load: the stream's append-only contract
        // cannot apply tombstones, so a start snapshot carrying live
        // position/equality deletes would silently emit logically-deleted
        // rows. Fail fast — rewrite the table to a tombstone-free
        // snapshot (graft.Cli rewrite) before tailing it from scratch.
        val entries = graft.sources.IcebergManifestSource
          .statsFromTableDir(spark, dir, "t", Nil, Some(to))
          .select("file_path", "content").collect()
        require(!entries.exists(_.getInt(1) != 0),
          s"graft-iceberg streaming: initial snapshot $to of $dir carries " +
            "delete files; the append-only stream cannot apply tombstones. " +
            "Rewrite to a tombstone-free snapshot before streaming.")
        entries.filter(_.getInt(1) == 0).map(_.getString(0)).toSeq
      }
      else
        graft.sources.IcebergManifestSource
          .changesBetween(spark, dir, "t", from, to)
          .filter(org.apache.spark.sql.functions.col("change") === "added" &&
            org.apache.spark.sql.functions.col("content") === 0)
          .select("file_path").collect().map(_.getString(0)).toSeq
    paths.sorted.map(p => GraftFilePartition(p): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(required)
}

private[v2] case class GraftSnapOffset(snapshotId: Long) extends Offset {
  override def json(): String = snapshotId.toString
}
