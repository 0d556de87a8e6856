package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.{MetricRow, TableRef}

/** Remote-diagnostics response parsing (reference
  * `diagnostics/response.py:14-86`): the analysis document's nested JSON is
  * navigated by dot-paths into the same 9-metric surface, including the
  * after-values local mode can't compute (WORST_AVG_FILE_SIZE). Per the
  * survey's security note, only the *parsing/metric semantics* are
  * reproduced — nothing is posted anywhere and no credentials are read.
  *
  * The reference's `NestedDictAccessor` dot-path navigation maps 1:1 onto
  * Spark's nested-field resolution: `col("table.totalFilesCount")`.
  */
object RemoteMetrics {

  private val partitionStruct = StructType(Seq(
    StructField("name", StringType),
    StructField("totalSizeBytes", LongType),
    StructField("targetSizeBytes", LongType),
    StructField("currentScanOverheadMillis", LongType),
    StructField("targetScanOverheadMillis", LongType),
    StructField("totalFilesCount", LongType),
    StructField("targetFilesCount", LongType),
    StructField("totalDataFileCount", LongType),
    StructField("totalDataFileSizeBytes", LongType)))

  val responseSchema: StructType = StructType(Seq(
    StructField("analysisResults", ArrayType(StructType(Seq(
      StructField("table", StructType(Seq(
        StructField("name", StringType),
        StructField("totalSizeBytes", LongType),
        StructField("targetSizeBytes", LongType),
        StructField("currentScanOverheadMillis", LongType),
        StructField("targetScanOverheadMillis", LongType),
        StructField("totalFilesCount", LongType),
        StructField("targetFilesCount", LongType),
        StructField("totalPartitionsCount", LongType),
        StructField("totalDataFileCount", LongType),
        StructField("totalDataFileSizeBytes", LongType)))),
      StructField("largestPartition", partitionStruct),
      StructField("worstOverheadPartition", partitionStruct),
      StructField("worstFilesCountPartition", partitionStruct),
      StructField("worstAvgFileSizePartition", partitionStruct))))),
    StructField("errors", ArrayType(StructType(Seq(
      StructField("table", StringType),
      StructField("error", StringType)))))))

  /** `size/count` with 0-guard (reference `response.py:51-64`). */
  private def avg(size: org.apache.spark.sql.Column, count: org.apache.spark.sql.Column) =
    when(count === 0 || count.isNull, lit(0.0)).otherwise(size.cast("double") / count.cast("double"))

  /** Parse response JSON documents into long-form metric rows (all 9 metrics
    * per table, enum order) + an error relation — the reference's
    * out-of-band `(table, message)` channel as a second Dataset. */
  def parse(docs: Dataset[String]): (Dataset[MetricRow], Dataset[(String, String)]) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val parsed = docs.select(col("value"), from_json(col("value"), responseSchema).as("r"))

    // a document from_json cannot parse would otherwise vanish silently —
    // route it to the error channel (the reference raises; we report).
    // PERMISSIVE from_json returns an all-null struct for bad input, so
    // "malformed" = both top-level arrays null.
    val isMalformed = col("r").isNull ||
      (col("r.analysisResults").isNull && col("r.errors").isNull)
    val malformed = parsed.filter(isMalformed)
      .select(lit("<unparseable>").as("table"),
        concat(lit("malformed response document: "), substring(col("value"), 1, 80)).as("error"))
      .as[(String, String)]

    val results = parsed.filter(!isMalformed)
      .select(explode(col("r.analysisResults")).as("a"))
      .select(
        col("a.table.name").as("table"),
        col("a.table.currentScanOverheadMillis").cast("double").as("fso_b"),
        col("a.table.targetScanOverheadMillis").cast("double").as("fso_a"),
        col("a.worstOverheadPartition.currentScanOverheadMillis").cast("double").as("wso_b"),
        col("a.worstOverheadPartition.targetScanOverheadMillis").cast("double").as("wso_a"),
        col("a.table.totalFilesCount").cast("double").as("fc_b"),
        col("a.table.targetFilesCount").cast("double").as("fc_a"),
        col("a.worstFilesCountPartition.totalFilesCount").cast("double").as("wfc_b"),
        col("a.worstFilesCountPartition.targetFilesCount").cast("double").as("wfc_a"),
        // avg metrics (response.py:51-64): before = dataFileSize/dataFileCount,
        // after = targetSize/targetFilesCount, each under its own prefix
        avg(col("a.table.totalDataFileSizeBytes"), col("a.table.totalDataFileCount")).as("avg_b"),
        avg(col("a.table.targetSizeBytes"), col("a.table.targetFilesCount")).as("avg_a"),
        avg(col("a.worstAvgFileSizePartition.totalDataFileSizeBytes"),
          col("a.worstAvgFileSizePartition.totalDataFileCount")).as("wavg_b"),
        avg(col("a.worstAvgFileSizePartition.targetSizeBytes"),
          col("a.worstAvgFileSizePartition.targetFilesCount")).as("wavg_a"),
        col("a.table.totalSizeBytes").cast("double").as("tts_b"),
        col("a.table.targetSizeBytes").cast("double").as("tts_a"),
        col("a.largestPartition.totalSizeBytes").cast("double").as("lps_b"),
        col("a.largestPartition.targetSizeBytes").cast("double").as("lps_a"),
        col("a.table.totalPartitionsCount").cast("double").as("tp_b"))

    // null-safe extraction: a response missing a numeric field reports 0 for
    // that metric instead of NPE-aborting the whole job (deviation from the
    // reference, which raises KeyError per document; documented trade)
    val rows = results.flatMap { r =>
      val table = Option(r.getString(0)).getOrElse("<unnamed>")
      def d(i: Int): Double = if (r.isNullAt(i)) 0.0 else r.getDouble(i)
      Seq(
        MetricRow(table, 0, "FULL_SCAN_OVERHEAD", d(1), Some(d(2))),
        MetricRow(table, 1, "WORST_SCAN_OVERHEAD", d(3), Some(d(4))),
        MetricRow(table, 2, "FILE_COUNT", d(5), Some(d(6))),
        MetricRow(table, 3, "WORST_FILE_COUNT", d(7), Some(d(8))),
        MetricRow(table, 4, "AVG_FILE_SIZE", d(9), Some(d(10))),
        MetricRow(table, 5, "WORST_AVG_FILE_SIZE", d(11), Some(d(12))),
        MetricRow(table, 6, "TOTAL_TABLE_SIZE", d(13), Some(d(14))),
        MetricRow(table, 7, "LARGEST_PARTITION_SIZE", d(15), Some(d(16))),
        MetricRow(table, 8, "TOTAL_PARTITIONS", d(17), None))
    }

    // errors lacking a table name are dropped (response.py:43-48)
    val errors = parsed.filter(!isMalformed)
      .select(explode(col("r.errors")).as("e"))
      .select(col("e.table"), col("e.error"))
      .filter(col("table").isNotNull && col("table") =!= "")
      .na.fill("Unknown Error", Seq("error"))
      .as[(String, String)]

    (rows, errors.union(malformed))
  }
}
