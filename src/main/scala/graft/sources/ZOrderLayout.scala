package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.MortonCode

/** Z-order layout writer: cluster a table's files so min/max file skipping
  * works on TWO columns at once.
  *
  * `write` range-partitions by the Morton code of the two (grid-normalized)
  * cluster columns and sorts within partitions, so each of the `nFiles`
  * output files covers a compact 2-D tile — a predicate on EITHER column
  * intersects only the tiles that actually contain its range. A
  * single-column sort gives narrow min/max on that column only; insertion
  * order gives neither.
  *
  * Normalization maps each column onto a `bits`-bit grid over its
  * [min, max] span — computed in ONE aggregate job (no global window, no
  * driver-side data): the write path stays a scan + range exchange at any
  * scale. Heavily skewed domains get uneven tiles (quantile boundaries
  * would even them out at the cost of a sketch pass); file skipping still
  * applies, just with coarser tiles in the dense region. Pair with
  * [[Compactor]] for OPTIMIZE-style table maintenance.
  */
object ZOrderLayout {

  /** Morton key for two numeric columns normalized onto a `bits`-bit grid
    * over the given [min, max] spans. */
  def zorderKey(a: Column, aMin: Double, aMax: Double,
      b: Column, bMin: Double, bMax: Double, bits: Int = 16): Column = {
    val grid = (1L << bits) - 1
    def norm(c: Column, mn: Double, mx: Double) = {
      val span = math.max(mx - mn, java.lang.Double.MIN_NORMAL)
      val cell = floor((c.cast("double") - mn) / span * (grid + 1)).cast("long")
      // explicit null gate: least/greatest SKIP nulls (a null value would
      // otherwise land in the max cell); clamp both ends so stale stats
      // (value outside [mn, mx]) degrade to edge tiles, not wrapped codes
      when(c.isNull, lit(null).cast("long"))
        .otherwise(greatest(lit(0L), least(lit(grid), cell)))
    }
    MortonCode.morton(norm(a, aMin, aMax), norm(b, bMin, bMax), bits)
  }

  /** Rewrite `df` into `outDir` as `nFiles` z-ordered parquet files. */
  def write(df: DataFrame, colA: String, colB: String, outDir: String, nFiles: Int): Unit = {
    val stats = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).head()
    if (stats.isNullAt(0) || stats.isNullAt(2)) {
      // empty input (or an all-null cluster column): nothing to cluster —
      // write the data as-is rather than NPE on absent stats
      df.write.mode("overwrite").parquet(outDir)
      return
    }
    val z = zorderKey(col(colA), stats.getDouble(0), stats.getDouble(1),
      col(colB), stats.getDouble(2), stats.getDouble(3))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Fraction of files a range predicate on `column` must scan, judged by
    * per-file min/max stats — the measurable effect of the layout. */
  def scanFraction(spark: SparkSession, dir: String,
      column: String, lo: Double, hi: Double): Double = {
    val perFile = spark.read.parquet(dir)
      .withColumn("__f", input_file_name())
      .groupBy(col("__f"))
      .agg(min(col(column).cast("double")).as("mn"),
        max(col(column).cast("double")).as("mx"))
      .collect()
    if (perFile.isEmpty) return 0.0
    // a file with all-null stats carries no values in range -> skippable
    val hit = perFile.count(r =>
      !r.isNullAt(1) && !r.isNullAt(2) && r.getDouble(2) >= lo && r.getDouble(1) <= hi)
    hit.toDouble / perFile.length
  }
}
