package org.apache.spark.sql.graftbridge

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetFileWriter, ParquetOutputFormat}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

/** Driver-side twin of the single-task parquet write
  * (`df.coalesce(1).write.parquet`) for DRIVER-SIZED frames — the
  * fixture/tombstone grain where launching a whole Spark write job
  * (commit protocol, staging dir, part-file rename, footer re-read for
  * the count) costs more than the encode itself.
  *
  * Byte-identity contract: the file is encoded by the SAME
  * [[ParquetWriteSupport]] a Spark write task uses, configured with the
  * SAME session keys `ParquetUtils.prepareWrite` sets, so for identical
  * rows in identical order the produced file is byte-identical to the
  * task-written one (pinned by SingleFileWriterSpec). That keeps every
  * downstream fact — `file.length()` manifest sizes, footer stats,
  * `_metadata.row_index` ordinals — exactly what the cluster arm would
  * have produced.
  *
  * This lives in the `org.apache.spark.sql` namespace because
  * `ParquetWriteSupport`, `SessionState` and `executeCollect` are
  * `private[sql]` — the same shim pattern as [[ColumnBridge]]. */
object SingleFileWriter {

  /** All rows of `df` as InternalRows IF there are at most `cap` of them
    * — ONE action, the kmFit LIMIT-probe pattern: when the probe comes
    * back short the rows ARE the result; past the cap the caller falls
    * back to the cluster write arm, which recomputes (correct, just not
    * driver-sized). Row order is the frame's partition-concatenation
    * order — exactly the order `coalesce(1)` feeds a single write task. */
  def collectUpTo(df: DataFrame, cap: Int): Option[Array[InternalRow]] = {
    val probe = df.limit(cap + 1).queryExecution.executedPlan.executeCollect()
    if (probe.length <= cap) Some(probe) else None
  }

  /** The hadoop conf a Spark parquet write task sees: the session's
    * hadoop conf plus the keys `ParquetUtils.prepareWrite` sets from the
    * SQL conf (schema, legacy format, timestamp type, field ids, rebase
    * modes, compression, no job summaries). */
  private def writeConf(spark: org.apache.spark.sql.SparkSession,
      schema: StructType): Configuration = {
    val sqlConf = spark.sessionState.conf
    val conf = spark.sessionState.newHadoopConf()
    ParquetWriteSupport.setSchema(schema, conf)
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sqlConf.writeLegacyParquetFormat.toString)
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sqlConf.parquetOutputTimestampType.toString)
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sqlConf.parquetFieldIdWriteEnabled.toString)
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sqlConf.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key,
      sqlConf.getConf(SQLConf.PARQUET_REBASE_MODE_IN_WRITE).toString)
    conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key,
      sqlConf.getConf(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE).toString)
    conf.set(ParquetOutputFormat.WRITE_SUPPORT_CLASS,
      classOf[ParquetWriteSupport].getName)
    conf.set(ParquetOutputFormat.JOB_SUMMARY_LEVEL, "NONE")
    conf
  }

  /** The session's effective parquet codec — the same resolution
    * `ParquetOptions` performs for an option-less `.write.parquet`. */
  private def codecOf(spark: org.apache.spark.sql.SparkSession): CompressionCodecName = {
    val name = spark.sessionState.conf.parquetCompressionCodec
    CompressionCodecName.valueOf(
      (if (name.equalsIgnoreCase("none")) "uncompressed" else name).toUpperCase)
  }

  /** ORC twin of [[writeRowsParquet]]: the SAME `OrcOutputWriter` a
    * Spark write task uses, configured with the same session keys
    * `OrcFileFormat.prepareWrite` sets (compression; the schema rides the
    * writer's own options), so the file is byte-identical to the
    * single-task write (pinned by SingleFileWriterSpec). */
  def writeRowsOrc(spark: org.apache.spark.sql.SparkSession,
      schema: StructType, rows: Array[InternalRow],
      dest: java.io.File): Long = {
    import org.apache.spark.sql.execution.datasources.orc.{OrcOptions, OrcOutputWriter}
    org.apache.commons.io.FileUtils.deleteQuietly(dest)
    val sqlConf = spark.sessionState.conf
    val conf = spark.sessionState.newHadoopConf()
    conf.set(org.apache.orc.OrcConf.COMPRESS.getAttribute,
      new OrcOptions(Map.empty[String, String], sqlConf).compressionCodec)
    val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      conf, new org.apache.hadoop.mapreduce.TaskAttemptID())
    val writer = new OrcOutputWriter(dest.getAbsolutePath, schema, ctx,
      sqlConf.orcVectorizedWriterBatchSize)
    var i = 0
    try {
      while (i < rows.length) { writer.write(rows(i)); i += 1 }
    } finally writer.close()
    rows.length.toLong
  }

  /** Encode `rows` (already on the driver) as ONE parquet file at `dest`,
    * byte-identical to the single-task write of the same rows. Returns
    * the row count. */
  def writeRowsParquet(spark: org.apache.spark.sql.SparkSession,
      schema: StructType, rows: Array[InternalRow],
      dest: java.io.File): Long = {
    org.apache.commons.io.FileUtils.deleteQuietly(dest)
    val conf = writeConf(spark, schema)
    val writer = new ParquetOutputFormat[InternalRow]()
      .getRecordWriter(conf, new Path(dest.getAbsolutePath), codecOf(spark),
        ParquetFileWriter.Mode.OVERWRITE)
    var i = 0
    try {
      while (i < rows.length) { writer.write(null, rows(i)); i += 1 }
    } finally writer.close(null)
    rows.length.toLong
  }
}
