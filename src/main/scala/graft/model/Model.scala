package graft.model

/** Core data model for the metadata-analytics engine.
  *
  * Re-expresses the reference's data model (see
  * `/root/reference/icebergdiag/metrics/table_metric.py:9-18,86-96` and
  * `table_metrics.py:17-19`) as Spark-friendly case classes: the input
  * relation is a `Dataset[FileEntry]`, one row per data/delete file of a
  * table snapshot.
  */

/** Dotted table identity (reference: `icebergdiag/metrics/table.py:1-23`). */
final case class TableRef(database: String, name: String) {
  def fullName: String = if (database.isEmpty) name else s"$database.$name"
}

object TableRef {
  /** `"db.tbl"` -> (db, tbl); no dot -> ("", name). Split at the FIRST dot
    * (maxsplit=1 semantics). */
  def fromFullName(full: String): TableRef = {
    val i = full.indexOf('.')
    if (i < 0) TableRef("", full) else TableRef(full.substring(0, i), full.substring(i + 1))
  }
}

/** Iceberg data-file content ids (public Iceberg spec values, also used by
  * the `files` metadata table). */
object FileContent {
  val Data: Int = 0
  val PositionDeletes: Int = 1
  val EqualityDeletes: Int = 2
}

/** One manifest entry: the engine's input row.
  *
  * `table` carries the owning table so that thousands of tables can be
  * analyzed in ONE union-all Spark plan (grouping column), which is the
  * 100 TB-scale design; single-table callers set it to a constant.
  * `partitionKey` is the canonical string form of the partition tuple
  * (reference `table_metrics.py:86-91`); it is an internal grouping key
  * only, never displayed.
  */
final case class FileEntry(
    table: String,
    content: Int,
    partitionKey: String,
    sizeBytes: Long)

/** Per-(table, partition) aggregate + compaction-simulation results; the
  * output of the engine's first (and only wide) shuffle. */
final case class PartitionStats(
    table: String,
    partitionKey: String,
    fileCount: Long,     // all content types
    totalSize: Long,     // all content types
    scanOverhead: Long,  // sum(readCost) * msPerScan, all content types
    dataFileCount: Long, // content == DATA only
    dataFileSize: Long,
    afterGroupCount: Long, // bin-packed group count (data files only)
    afterOverhead: Long)   // sum(readCost(groupSize)) * msPerScan

/** Cost-model constants (reference `table_metrics.py:17-19`). These ARE the
  * engine's "statistics"; defaults must match the reference for parity. */
final case class EngineConfig(
    fetchSize: Long = 32L * 1024 * 1024,
    maxGroupBytes: Long = 750L * 1024 * 1024,
    msPerScan: Long = 1L)

object EngineConfig {
  val default: EngineConfig = EngineConfig()
}

sealed trait MetricKind
object MetricKind {
  case object IntK extends MetricKind
  case object DurationK extends MetricKind // milliseconds
  case object SizeK extends MetricKind     // bytes
}

/** The 9-metric catalog, ordered as the reference's `MetricName` enum
  * (`table_metric.py:9-18`) with kind/visibility flags from the factory map
  * (`table_metric.py:86-96`). */
sealed abstract class MetricName(
    val ordinal: Int,
    val display: String,
    val kind: MetricKind,
    val displayInLocal: Boolean,
    val displayImprovement: Boolean)
    extends Serializable

object MetricName {
  import MetricKind._
  case object FullScanOverhead     extends MetricName(0, "Full Scan Overhead", DurationK, true, true)
  case object WorstScanOverhead    extends MetricName(1, "Worst Partition Scan Overhead", DurationK, true, true)
  case object FileCount            extends MetricName(2, "Total File Count", IntK, true, true)
  case object WorstFileCount       extends MetricName(3, "Worst Partition File Count", IntK, true, true)
  case object AvgFileSize          extends MetricName(4, "Avg Data File Size", SizeK, true, false)
  case object WorstAvgFileSize     extends MetricName(5, "Worst Partition Avg Data File Size", SizeK, false, false)
  case object TotalTableSize       extends MetricName(6, "Total Table Size", SizeK, true, true)
  case object LargestPartitionSize extends MetricName(7, "Largest Partition Size", SizeK, true, true)
  case object TotalPartitions      extends MetricName(8, "Total Partitions", IntK, true, true)

  val all: Seq[MetricName] = Seq(
    FullScanOverhead, WorstScanOverhead, FileCount, WorstFileCount, AvgFileSize,
    WorstAvgFileSize, TotalTableSize, LargestPartitionSize, TotalPartitions)

  def fromDisplay(s: String): MetricName =
    all.find(_.display == s).getOrElse(throw new IllegalArgumentException(s"Unknown metric name: $s"))
}

/** One metric value in long (tidy) form. `before`/`after` are Doubles: the
  * reference mixes ints (counts, ms, bytes) and Python-float averages; all
  * fit exactly in a Double at realistic scales. */
final case class MetricRow(
    table: String,
    ordinal: Int,
    metric: String,
    before: Double,
    after: Option[Double]) {
  def name: MetricName = MetricName.all(ordinal)
}

/** Wide one-row-per-table metric record — the natural Spark shape (output of
  * a single `groupBy(table).agg(...)`). */
final case class TableMetricsWide(
    table: String,
    fullScanOverheadBefore: Long,
    fullScanOverheadAfter: Long,
    worstScanOverheadBefore: Long,
    worstScanOverheadAfter: Long,
    fileCountBefore: Long,
    fileCountAfter: Long,
    worstFileCountBefore: Long,
    worstFileCountAfter: Long,
    avgFileSize: Double,
    worstAvgFileSize: Double,
    totalTableSize: Long,
    largestPartitionSize: Long,
    totalPartitions: Long) {

  /** Long-form rows in the reference's metric order. Metrics without a
    * simulated 'after' (averages, sizes, partition count) get None — exactly
    * the reference's `after_metrics.get(name)` behavior
    * (`table_metrics.py:84,116-121`). */
  def toRows: Seq[MetricRow] = Seq(
    MetricRow(table, 0, "FULL_SCAN_OVERHEAD", fullScanOverheadBefore.toDouble, Some(fullScanOverheadAfter.toDouble)),
    MetricRow(table, 1, "WORST_SCAN_OVERHEAD", worstScanOverheadBefore.toDouble, Some(worstScanOverheadAfter.toDouble)),
    MetricRow(table, 2, "FILE_COUNT", fileCountBefore.toDouble, Some(fileCountAfter.toDouble)),
    MetricRow(table, 3, "WORST_FILE_COUNT", worstFileCountBefore.toDouble, Some(worstFileCountAfter.toDouble)),
    MetricRow(table, 4, "AVG_FILE_SIZE", avgFileSize, None),
    MetricRow(table, 5, "WORST_AVG_FILE_SIZE", worstAvgFileSize, None),
    MetricRow(table, 6, "TOTAL_TABLE_SIZE", totalTableSize.toDouble, None),
    MetricRow(table, 7, "LARGEST_PARTITION_SIZE", largestPartitionSize.toDouble, None),
    MetricRow(table, 8, "TOTAL_PARTITIONS", totalPartitions.toDouble, None))
}
