package graft.metrics

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{FileEntry, TableMetricsWide}

/** Thousand-table fan-out: the flagship multi-table design (SURVEY §3.2)
  * at realistic catalog width. The reference diagnoses tables one at a
  * time from a 10-thread driver pool (`manager.py:60-72`); here ALL
  * tables' manifest entries fan into ONE `Dataset[FileEntry]` and the
  * whole catalog is diagnosed by a single job whose shuffle count is
  * INDEPENDENT of table count — table is just another grouping key, so
  * 1,000 (or 100,000) tables cost the same two exchanges as four
  * (FanoutSpec asserts exactly that; q98 gates the same plan's values on
  * 4 real tables against the oracle).
  *
  * The synthetic corpus is generated DISTRIBUTED via `spark.range` — one
  * row per (table, file) with deterministic pseudo-random sizes (a
  * Knuth-multiplicative hash of the row id; no RNG, so every run and
  * both sides of any comparison see identical bytes) — never a
  * driver-side list of 64k entries.
  */
object Fanout {

  /** `nTables` tables × `filesPerTable` files over 16 hive-ish partitions,
    * ~2% delete files, sizes 1 MiB..129 MiB. */
  def syntheticEntries(spark: SparkSession, nTables: Int,
      filesPerTable: Int = 64): Dataset[FileEntry] = {
    import spark.implicits._
    spark.range(nTables.toLong * filesPerTable)
      .select(
        format_string("tbl_%05d", (col("id") / filesPerTable).cast("long")).as("table"),
        when(col("id") % 50 === 0, lit(1)).otherwise(lit(0)).as("content"),
        format_string("{\"day\":%d}", col("id") % 16).as("partitionKey"),
        (lit(1048576L) + (col("id") * 2654435761L) % 134217728L).as("sizeBytes"))
      .as[FileEntry]
  }

  /** Two manifests per table — also generated distributed. */
  def manifestCounts(spark: SparkSession, nTables: Int): Dataset[(String, Long)] = {
    import spark.implicits._
    spark.range(nTables.toLong)
      .select(format_string("tbl_%05d", col("id")).as("_1"), lit(2L).as("_2"))
      .as[(String, Long)]
  }

  /** The whole-catalog diagnosis as one plan: 9 metrics per table. */
  def run(spark: SparkSession, nTables: Int,
      filesPerTable: Int = 64): Dataset[TableMetricsWide] =
    MetricsCalculator.computeMetricsWide(
      syntheticEntries(spark, nTables, filesPerTable),
      manifestCounts(spark, nTables))
}
