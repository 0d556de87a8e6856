package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.sources.{IcebergLayoutWriter, IcebergManifestSource}
import graft.sources.IcebergLayoutWriter.ManifestEntrySpec
import graft.streaming.StreamingMaintenance
import graft.streaming.StreamingMaintenance.Delta

/** Streaming incremental maintenance: folding a REAL layout's changelog
  * as a stream must converge to the same per-content rollup as the batch
  * fold AND as a direct recompute of the target snapshot — across
  * arbitrary micro-batch splits (per-commit, per-file, lopsided). */
class StreamingMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def fixtureDeltas(): (Seq[Delta], Map[Int, (Long, Long, Long)]) = {
    val tbl = new java.io.File("target/tmp-stream-maint")
    org.apache.commons.io.FileUtils.deleteQuietly(tbl)
    def df(name: String, rc: Long, seq: Long, content: Int = 0) =
      ManifestEntrySpec(status = 1, content = content, filePath = name,
        recordCount = rc, sizeBytes = rc * 100L, sequenceNumber = seq)
    val snap1 = Seq(df("a.parquet", 10L, 1L), df("b.parquet", 20L, 1L),
      df("c.parquet", 30L, 1L))
    val snap2 = Seq(df("ab.parquet", 30L, 2L), df("c.parquet", 30L, 1L),
      df("d.parquet", 7L, 2L), df("del.parquet", 4L, 2L, content = 1))
    IcebergLayoutWriter.writeTableSnapshots(tbl,
      Seq(1L -> snap1, 2L -> snap2))
    // base snapshot as +1 deltas, then the real changelog 1 -> 2
    val base = IcebergManifestSource
      .statsFromTableDir(spark, tbl.getPath, "t", Nil, Some(1L)).collect()
      .map(r => Delta(r.getInt(2), 1L, r.getLong(5), r.getLong(4))).toSeq
    val changes = IcebergManifestSource
      .changesBetween(spark, tbl.getPath, "t", 1L, 2L).collect()
      .map(r => Delta(r.getInt(1),
        if (r.getString(2) == "added") 1L else -1L,
        r.getLong(3), r.getLong(4))).toSeq
    // truth: direct recompute of snapshot 2
    val truth = IcebergManifestSource
      .statsFromTableDir(spark, tbl.getPath, "t", Nil, Some(2L)).collect()
      .groupBy(_.getInt(2)).map { case (c, rows) =>
        c -> (rows.length.toLong, rows.map(_.getLong(5)).sum,
          rows.map(_.getLong(4)).sum)
      }
    (base ++ changes, truth)
  }

  test("streamed changelog fold equals batch fold and direct recompute, any split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (deltas, truth) = fixtureDeltas()
    assert(StreamingMaintenance.replay(deltas) == truth,
      "batch fold must equal the direct snapshot-2 recompute")

    val splits: Seq[Seq[Seq[Delta]]] = Seq(
      Seq(deltas),                                  // one batch
      deltas.map(Seq(_)),                           // per-file
      Seq(deltas.take(4), deltas.drop(4)))          // lopsided commit-ish
    splits.zipWithIndex.foreach { case (batches, i) =>
      val input = MemoryStream[Delta]
      val q = StreamingMaintenance.totals(input.toDS())
        .writeStream.format("memory").queryName(s"maint$i")
        .outputMode("complete").start()
      try {
        batches.foreach { b =>
          if (b.nonEmpty) { input.addData(b: _*); q.processAllAvailable() }
        }
        val got = spark.table(s"maint$i")
          .as[(Int, Long, Long, Long)].collect()
          .map(r => r._1 -> (r._2, r._3, r._4)).toMap
        assert(got == truth, s"split $i diverged: $got vs $truth")
      } finally q.stop()
    }
  }
}
