package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Compactor

/** Executable compaction: the write path must (a) produce exactly one file
  * per planned bin, (b) preserve the data, and (c) agree with the
  * SIMULATION's packer (same group count the metrics pipeline predicts). */
class CompactorSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def tmp(name: String) =
    TestTmp.dir(name)

  test("compaction: one output file per bin, data preserved") {
    import spark.implicits._
    val in = tmp("graft_cmp_in")
    val out = tmp("graft_cmp_out")
    // 12 similar-size small files
    spark.range(12000).select(col("id"), (col("id") % 7).as("v"))
      .repartition(12).write.mode("overwrite").parquet(in)
    val sizes = Compactor.plan(spark, in, maxGroupBytes = Long.MaxValue).map(_.size)
    assert(sizes.length == 12)
    // cap so ~3 files fit per bin (overshoot-close => bins exceed the cap)
    val cap = sizes.sorted.take(3).sum - 1
    val result = Compactor.compact(spark, in, out, maxGroupBytes = cap)
    assert(result.filesBefore == 12)
    assert(result.filesAfter > 1 && result.filesAfter < 12)
    // one physical parquet file per bin
    val outFiles = new java.io.File(out).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(f => f.getName.endsWith(".parquet"))
    assert(outFiles.length == result.filesAfter)
    // content equality (multiset)
    val before = spark.read.parquet(in).as[(Long, Long)].collect().sorted.toSeq
    val after = spark.read.parquet(out).drop("__bin").as[(Long, Long)].collect().sorted.toSeq
    assert(after == before)
  }

  test("compaction plan agrees with the simulation's packer") {
    import graft.functions.Pure
    val in = tmp("graft_cmp_sim")
    spark.range(9000).repartition(9).write.mode("overwrite").parquet(in)
    val fileSizes = Compactor.plan(spark, in, maxGroupBytes = Long.MaxValue).map(_.size)
    val cap = fileSizes.sorted.take(2).sum - 1
    val predictedGroups = Pure.buildPartitionGroups(fileSizes, cap).length
    val planned = Compactor.plan(spark, in, maxGroupBytes = cap)
    assert(planned.map(_.bin).distinct.length == predictedGroups)
    // bins respect the overshoot-close rule: every bin except possibly the
    // last exceeds the cap once closed OR is a singleton chain
    val binSums = planned.groupBy(_.bin).view.mapValues(_.map(_.size).sum).toMap
    val closed = planned.map(_.bin).distinct.sorted.dropRight(1)
    closed.foreach { b => assert(binSums(b) > cap, s"bin $b closed below cap") }
  }

  test("compaction of hive-partitioned input keeps partitions separate") {
    import spark.implicits._
    val in = tmp("graft_cmp_part")
    val out = tmp("graft_cmp_part_out")
    spark.range(6000).select(col("id"), (col("id") % 2).as("day"))
      .repartition(6).write.mode("overwrite").partitionBy("day").parquet(in)
    val planned = Compactor.plan(spark, in, maxGroupBytes = 1L)
    // bins never span partitions
    planned.groupBy(_.bin).values.foreach { fs =>
      assert(fs.map(_.partition).distinct.length == 1)
    }
    val result = Compactor.compact(spark, in, out, maxGroupBytes = Long.MaxValue)
    assert(result.filesAfter == 2) // one bin per day partition
    val total = spark.read.parquet(out).drop("__bin").count()
    assert(total == 6000)
  }

  test("empty directory compacts to an empty result") {
    val in = tmp("graft_cmp_empty")
    val result = Compactor.compact(spark, in, tmp("graft_cmp_empty_out"))
    assert(result == Compactor.CompactionResult(0, 0, 0, result.outDir))
  }
}
