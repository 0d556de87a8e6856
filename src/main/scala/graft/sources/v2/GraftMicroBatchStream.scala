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

  private def currentSnapshot: Long =
    graft.sources.LayoutMaintenance.snapshotList(spark, dir)
      .lastOption.map(_._1).getOrElse(0L)

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
      if (from == 0L)
        graft.sources.IcebergManifestSource
          .statsFromTableDir(spark, dir, "t", Nil, Some(to))
          .filter(org.apache.spark.sql.functions.col("content") === 0)
          .select("file_path").collect().map(_.getString(0)).toSeq
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
