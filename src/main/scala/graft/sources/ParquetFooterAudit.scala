package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-column storage audit from parquet FOOTERS only — the
  * schema-design lever at 100 TB (which columns pay for the bytes, what
  * compression actually bought) read from KBs of metadata per file,
  * never the data pages. One task per file via the file-list RDD; each
  * task opens the footer with parquet-hadoop (the same reader Spark's
  * own scans use) and emits one row per (file, column):
  * (table, column, n_rowgroups, rows, compressed_bytes,
  * uncompressed_bytes) — callers aggregate to taste. DuckDB's
  * `parquet_metadata()` reads the identical numbers, which
  * ParquetFooterAuditSpec uses as its fixture-free ground truth
  * (column set == schema, per-column rows == file rows, compressed sum
  * bounded by physical file size).
  */
object ParquetFooterAudit {

  /** Footer rows for (table, path) pairs. Distributed one-task-per-file. */
  def audit(spark: SparkSession, files: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size, 32)))
      .flatMap { case (table, path) =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(path), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val blocks = r.getFooter.getBlocks
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(String, String, Long, Long, Long, Long)]
          blocks.forEach { b =>
            b.getColumns.forEach { c =>
              out += ((table, c.getPath.toDotString, 1L, b.getRowCount,
                c.getTotalSize, c.getTotalUncompressedSize))
            }
          }
          out.toSeq
        } finally r.close()
      }
    rdd.toDF("table", "column", "n_rowgroups", "rows",
        "compressed_bytes", "uncompressed_bytes")
      .groupBy(col("table"), col("column"))
      .agg(sum(col("n_rowgroups")).as("n_rowgroups"),
        sum(col("rows")).as("rows"),
        sum(col("compressed_bytes")).as("compressed_bytes"),
        sum(col("uncompressed_bytes")).as("uncompressed_bytes"))
      .withColumn("ratio_bp",
        expr("compressed_bytes * 10000 div uncompressed_bytes"))
  }

  /** Audit every `<name>.parquet` table under a data root (dirs welcome:
    * each part file contributes its footers). */
  def auditRoot(spark: SparkSession, dataRoot: String,
      glob: String = "*"): DataFrame = {
    val rx = java.util.regex.Pattern.compile(
      graft.functions.Pure.globToRegex(glob))
    val files = Option(new java.io.File(dataRoot).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet")
        && rx.matcher(f.getName.stripSuffix(".parquet")).matches())
      .sortBy(_.getName)
      .flatMap { f =>
        val table = f.getName.stripSuffix(".parquet")
        val parts: Seq[java.io.File] =
          if (f.isFile) Seq(f)
          else org.apache.commons.io.FileUtils
            .listFiles(f, Array("parquet"), true)
            .toArray(Array.empty[java.io.File]).toSeq
        parts.map(p => (table, p.getAbsolutePath))
      }
    audit(spark, files.toIndexedSeq)
  }
}
