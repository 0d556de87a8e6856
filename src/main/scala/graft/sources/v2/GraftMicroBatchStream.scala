package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset,
  ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow}
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
    required: StructType, maxFilesPerTrigger: Option[Int] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def spark = SparkSession.active

  /** `Trigger.AvailableNow` pin: the head observed when the trigger
    * started. Batches drain up to here and the query stops — commits
    * that land mid-drain wait for the next run (the contract the
    * trigger promises). */
  @volatile private var availableNowHead: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowHead = Some(currentSnapshot)

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def reportLatestOffset(): Offset = GraftSnapOffset(currentSnapshot)

  /** Rate-limited offset advance (`maxFilesPerTrigger`): the batch end
    * is the FURTHEST snapshot whose cumulative added-data-file count
    * stays within the budget — always at least one snapshot, so a
    * single oversized commit still drains (Spark's own file-source
    * semantics). Offsets are snapshot ids, so admission is
    * commit-granular: one manifest-stats pass attributes files to
    * commits by their data sequence number (this layout stamps
    * sequence == committing snapshot id), metadata-sized work. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val head = availableNowHead.getOrElse(currentSnapshot)
    val from = start.asInstanceOf[GraftSnapOffset].snapshotId
    if (head <= from) return GraftSnapOffset(from)
    val budget = limit match {
      case mf: ReadMaxFiles => Some(mf.maxFiles())
      case composite: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
        composite.getReadLimits.collectFirst { case mf: ReadMaxFiles => mf.maxFiles() }
      case _ => None
    }
    budget match {
      case None => GraftSnapOffset(head)
      case Some(maxFiles) =>
        // (seq → added data files) from ONE distributed manifest pass at
        // the head snapshot; candidate ends are the history ids in range
        val seqCounts = graft.sources.IcebergManifestSource
          .statsFromTableDir(spark, dir, "t", Nil, Some(head))
          .filter(org.apache.spark.sql.functions.col("content") === 0 &&
            org.apache.spark.sql.functions.col("sequence_number") > from)
          .groupBy("sequence_number").count()
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        val candidates = graft.sources.LayoutMaintenance
          .snapshotIds(spark, dir)
          .filter(id => id > from && id <= head).sorted
        var end = from
        var used = 0L
        var stopped = false
        candidates.foreach { id =>
          if (!stopped) {
            val add = seqCounts.filter(c => c._1 > end && c._1 <= id).map(_._2).sum
            // the FIRST candidate is always taken (an oversized single
            // commit must still drain); later ones only while in budget
            if (end == from || used + add <= maxFiles) { end = id; used += add }
            else stopped = true
          }
        }
        // no history ids in range (expired/rolled-back interval): fall
        // back to draining to the head in one batch
        GraftSnapOffset(if (end == from) head else end)
    }
  }

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
