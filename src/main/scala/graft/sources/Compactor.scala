package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.EngineConfig

/** EXECUTABLE compaction — the write-path twin of the metrics pipeline.
  *
  * The reference only SIMULATES compaction (greedy 750 MiB bin-packing of
  * data files, `table_metrics.py:200-217` overshoot-close semantics) to
  * report would-be improvements; this operator actually performs the
  * rewrite: each input file is assigned to a bin by the SAME packer the
  * simulation uses ([[graft.functions.Pure.buildPartitionGroups]]
  * semantics), and all bins are rewritten in ONE distributed job — no
  * driver-side copy loop:
  *
  *   read(files) → broadcast-join(file → bin) → repartition(bin) →
  *   write.partitionBy(bin)
  *
  * `repartition(col)` hashes each bin's rows into exactly one task, and the
  * partitioned write splits a task's rows per bin value — so the output has
  * exactly one file per bin, written fully in parallel. Hive-partitioned
  * inputs keep their partition columns; the `__bin` directory level is an
  * artifact readers drop (`spark.read.parquet(out).drop("__bin")`).
  *
  * Scale: the only driver-side work is the file LISTING (a metadata
  * operation, same order as reading a manifest); the data movement is one
  * shuffle keyed by bin — no skew, because bins are size-capped by
  * construction.
  */
object Compactor {

  case class FileBin(path: String, size: Long, partition: String, bin: Int)
  case class CompactionResult(filesBefore: Long, filesAfter: Long, bytesTotal: Long, outDir: String)

  /** Assign every data file under `dir` (recursive; hive `k=v` dirs define
    * partitions) to a compaction bin: ascending-size greedy pack per
    * partition, closing a bin only after it exceeds `maxGroupBytes`
    * (reference overshoot semantics). Bin ids are globally unique. */
  def plan(spark: SparkSession, dir: String, maxGroupBytes: Long = EngineConfig.default.maxGroupBytes): Seq[FileBin] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = fs.getFileStatus(p).getPath
    val files = FileEntrySource.listDataFiles(fs, base).map { case (path, len, rel) =>
      val pk = FileEntrySource.canonicalKey(
        rel.split('/').filter(_.contains('=')).toSeq
          .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) })
      (path.toUri.getPath, len, pk)
    }
    var nextBin = 0
    files.groupBy(_._3).toSeq.sortBy(_._1).flatMap { case (pk, fsOfPk) =>
      val sorted = fsOfPk.sortBy(f => (f._2, f._1)) // size asc, path tiebreak
      var current = 0L
      val assigned = sorted.map { case (path, size, _) =>
        if (current > maxGroupBytes) { nextBin += 1; current = 0L }
        current += size
        FileBin(path, size, pk, nextBin)
      }
      nextBin += 1 // partitions never share a bin
      assigned
    }.toSeq
  }

  /** Rewrite `inDir` into `outDir` with one parquet file per bin. */
  def compact(
      spark: SparkSession, inDir: String, outDir: String,
      maxGroupBytes: Long = EngineConfig.default.maxGroupBytes): CompactionResult = {
    val bins = plan(spark, inDir, maxGroupBytes)
    if (bins.isEmpty) return CompactionResult(0, 0, 0, outDir)
    import spark.implicits._
    val binDf = bins.toDF().select(col("path"), col("bin").as("__bin"))
    // normalize input_file_name's URI form with the SAME parser the listing
    // used (Path.toUri.getPath): strips scheme AND authority and decodes
    // percent-encoding — a regex would keep hdfs://host:port authorities or
    // encoded spaces in the key and silently empty the join
    val toBarePath = udf((s: String) => new Path(s).toUri.getPath)
    val data = spark.read.parquet(inDir)
      .withColumn("path", toBarePath(input_file_name()))
    data.join(broadcast(binDf), Seq("path"))
      .drop("path")
      .repartition(col("__bin"))
      .write.mode("overwrite").partitionBy("__bin").parquet(outDir)
    // row-preservation gate (footer-metadata counts — no data scan): a
    // path-key mismatch must fail loudly, never ship a lossy "compaction"
    val rowsIn = spark.read.parquet(inDir).count()
    val rowsOut = spark.read.parquet(outDir).count()
    if (rowsIn != rowsOut)
      throw new IllegalStateException(
        s"compaction row mismatch: $inDir has $rowsIn rows, $outDir has $rowsOut — " +
          "file-path keys failed to join (scheme/encoding drift?)")
    CompactionResult(bins.length, bins.map(_.bin).distinct.length, bins.map(_.size).sum, outDir)
  }
}
