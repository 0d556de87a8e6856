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
  * range. The INITIAL load is a full merge-on-read catch-up (the start
  * snapshot's tombstones apply exactly as in the batch scan);
  * INCREMENTAL batches are append-only, Iceberg's own incremental-read
  * restriction — a rewrite/compaction commit would surface its output
  * files as "added", so run maintenance on a paused stream or filter by
  * sequence downstream.
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
    if (from == 0L) {
      // Full-snapshot initial load: a MERGE-ON-READ catch-up. The start
      // snapshot's live tombstones apply exactly as in the batch scan
      // (position deletes by row ordinal, equality deletes by key tuple
      // resolved from `equality_ids`), so tailing a table from scratch
      // never emits logically-deleted rows. Only eq-deletes WITHOUT
      // metadata ids fail fast (morPartitionFor's guard) — silently
      // resurrecting rows is the one unacceptable outcome. Incremental
      // batches below stay append-only (Iceberg's own restriction).
      // no bootstrap schema: eq ids must resolve against the FULL file
      // schema, not the stream's (possibly projected) read schema
      val table = new GraftTable(dir, Some(to), Nil)
      return table.dataFiles.sortBy(_.path)
        .map(f => table.morPartitionFor(f): InputPartition).toArray
    }
    val paths: Seq[String] =
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
