package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import graft.streaming.{StreamingLakeSink, StreamingUpsert}
import graft.streaming.StreamingUpsert.Change
import graft.sources.{IcebergLayoutWriter, LayoutMaintenance, MorRead}

/** The streaming CDC → real-layout sink: an in-order change log split at
  * arbitrary micro-batch boundaries converges to the batch latest-wins
  * merge, with one commitMerge per non-empty trigger. */
class StreamingLakeSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val log = Seq(
    Change(1, 1, "U", 10.0), Change(2, 1, "U", 20.0), Change(3, 1, "U", 30.0),
    Change(2, 2, "U", 25.0), Change(4, 2, "U", 40.0),
    Change(3, 3, "D", 0.0), Change(1, 3, "U", 15.0),
    Change(5, 4, "U", 50.0), Change(4, 4, "D", 0.0), Change(2, 4, "U", 29.0))

  private def emptyTable(tag: String): java.io.File = {
    val tbl = new java.io.File(s"target/tmp-lakesink-$tag")
    org.apache.commons.io.FileUtils.deleteQuietly(tbl)
    IcebergLayoutWriter.writeTable(tbl, Nil)
    tbl
  }

  private def tableState(tbl: java.io.File): Map[Long, Double] = {
    val df = MorRead.readTable(spark, tbl.getPath, Seq("k"))
    if (df.columns.isEmpty) Map.empty
    else df.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
  }

  private def batchExpected: Map[Long, Double] = {
    import spark.implicits._
    graft.operators.CdcOps.latestWins(log.toDF(), Seq("k"), "version", "op")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
  }

  test("arbitrary ordered splits converge to the batch merge (direct commits)") {
    import spark.implicits._
    for (splits <- Seq(Seq(10), Seq(3, 7, 10), Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 10))) {
      val tbl = emptyTable(s"direct${splits.size}")
      var from = 0
      splits.foreach { to =>
        StreamingLakeSink.commitBatch(log.slice(from, to).toDS(), tbl.getPath)
        from = to
      }
      assert(tableState(tbl) == batchExpected, s"diverged at splits $splits")
      // one commit per non-empty batch on top of the empty base snapshot
      assert(LayoutMaintenance.snapshotIds(spark, tbl.getPath).size == 1 + splits.size)
    }
  }

  test("through the real streaming machinery (foreachBatch sink)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tbl = emptyTable("stream")
    val ckpt = new java.io.File("target/tmp-lakesink-ckpt")
    org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
    val input = MemoryStream[Change]
    val q = StreamingLakeSink.start(input.toDS(), tbl.getPath, ckpt.getPath)
    try {
      input.addData(log.take(5): _*); q.processAllAvailable()
      input.addData(log.drop(5): _*); q.processAllAvailable()
      assert(tableState(tbl) == batchExpected)
    } finally q.stop()
    // deletes really are tombstones until rewrite folds them away
    val before = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, tbl.getPath, "t", Nil)
      .filter(col("content") === 2).count()
    assert(before >= 2L, "expected equality-delete files from the commits")
    LayoutMaintenance.rewriteDataFiles(spark, tbl.getPath, Seq("k"))
    assert(tableState(tbl) == batchExpected, "rewrite changed the relation")
  }
}
