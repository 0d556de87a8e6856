package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.sources.{IcebergLayoutWriter, IcebergManifestSource,
  LayoutMaintenance, MorRead}
import graft.sources.IcebergLayoutWriter.ManifestEntrySpec

/** The commit path past the driver-entry ceiling: commitAppend switches
  * to MANIFEST REUSE (the previous snapshot's manifest files referenced
  * verbatim in the new list, added files in fresh manifests, the driver
  * touching only the KB-sized manifest list) instead of materializing
  * per-file entries. Driven at a TOY cap and pinned entry-for-entry
  * against the ordinary driver-walk path on a twin table. */
class CommitScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  /** Build a table at `tag` and run `appends` commits of one file each,
    * with recorded k-bounds; file contents/names identical across twins
    * so entry relations are comparable. */
  private def build(tag: String, appends: Int): java.io.File = {
    import spark.implicits._
    val tbl = new java.io.File(s"target/tmp-scale-$tag")
    org.apache.commons.io.FileUtils.deleteQuietly(tbl)
    val dataDir = new java.io.File(tbl, "data"); dataDir.mkdirs()
    (0 until appends).foreach { i =>
      val f = new java.io.File(dataDir, s"f$i.parquet")
      val lo = i * 100L; val hi = lo + 99L
      val n = IcebergLayoutWriter.writeSingleParquet(
        (lo to hi).map(k => (k, k % 7)).toDF("k", "b").sort(col("k")), f)
      LayoutMaintenance.commitAppend(spark, tbl.getPath, Seq(
        ManifestEntrySpec(status = 1, content = 0,
          filePath = f.getAbsolutePath, recordCount = n,
          sizeBytes = f.length(),
          lower = Map(1 -> IcebergLayoutWriter.boundLong(lo)),
          upper = Map(1 -> IcebergLayoutWriter.boundLong(hi)))))
    }
    tbl
  }

  private def entryRelation(tbl: java.io.File): Seq[(String, Int, Long, Long, Long, Long)] =
    IcebergManifestSource
      .statsFromTableDir(spark, tbl.getPath, "t", Seq((1, "k", LongType)))
      .select(col("file_path"), col("content"), col("record_count"),
        col("sequence_number"), col("lo_k"), col("hi_k"))
      .collect()
      .map(r => (r.getString(0).split('/').last, r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1).toSeq

  test("append past the cap reuses manifests; entries match the driver walk") {
    val capped = build("capped", 3)
    val walked = build("walked", 3)
    val headBefore = LayoutMaintenance.snapshotIds(spark, capped.getPath).last
    val oldList = new java.io.File(new java.io.File(capped, "metadata"),
      s"snap-$headBefore-manifest-list.avro")
    val oldManifests = IcebergManifestSource.manifestPathSeqs(
      spark.sparkContext.hadoopConfiguration,
      oldList.getAbsolutePath).map(_._1).toSet
    assert(oldManifests.nonEmpty)

    def appendOne(tbl: java.io.File): Unit = {
      import spark.implicits._
      val f = new java.io.File(new java.io.File(tbl, "data"), "f3.parquet")
      val n = IcebergLayoutWriter.writeSingleParquet(
        (300L to 399L).map(k => (k, k % 7)).toDF("k", "b").sort(col("k")), f)
      LayoutMaintenance.commitAppend(spark, tbl.getPath, Seq(
        ManifestEntrySpec(status = 1, content = 0,
          filePath = f.getAbsolutePath, recordCount = n,
          sizeBytes = f.length(),
          lower = Map(1 -> IcebergLayoutWriter.boundLong(300L)),
          upper = Map(1 -> IcebergLayoutWriter.boundLong(399L)))))
    }
    // toy cap: 3 carried entries > 2 forces the reuse path on `capped`
    val key = "spark.graft.maxDriverFileEntries"
    spark.conf.set(key, "2")
    try appendOne(capped) finally spark.conf.unset(key)
    appendOne(walked) // ordinary driver-walk append on the twin

    // the decoded entry relations (paths, seqs, counts, BOUNDS) must be
    // identical — the reuse path may not disturb one carried byte
    assert(entryRelation(capped) == entryRelation(walked))
    // manifest REUSE pinned: every pre-commit manifest file is
    // referenced VERBATIM by the new head's list
    val headAfter = LayoutMaintenance.snapshotIds(spark, capped.getPath).last
    val newList = new java.io.File(new java.io.File(capped, "metadata"),
      s"snap-$headAfter-manifest-list.avro")
    val newManifests = IcebergManifestSource.manifestPathSeqs(
      spark.sparkContext.hadoopConfiguration,
      newList.getAbsolutePath).map(_._1).toSet
    assert(oldManifests.subsetOf(newManifests),
      "fast append must reference the previous manifests verbatim")
    assert(newManifests.size == oldManifests.size + 1)
    // lineage + readability
    assert(LayoutMaintenance.snapshotIds(spark, capped.getPath) ==
      Seq(1L, 2L, 3L, 4L))
    assert(MorRead.readTable(spark, capped.getPath).count() == 400L)
    // summary totals extended from the previous snapshot's summary
    val sums = LayoutMaintenance.snapshotSummaries(spark, capped.getPath)
      .find(_._1 == headAfter).map(_._3).getOrElse(Map.empty)
    assert(sums.get("total-data-files").contains("4"))
    assert(sums.get("total-records").contains("400"))
  }

  test("a later ordinary commit stacks cleanly on a reuse-committed snapshot") {
    import spark.implicits._
    val tbl = build("stack", 3)
    val key = "spark.graft.maxDriverFileEntries"
    spark.conf.set(key, "2")
    try {
      val f = new java.io.File(new java.io.File(tbl, "data"), "f3.parquet")
      val n = IcebergLayoutWriter.writeSingleParquet(
        (300L to 349L).map(k => (k, k % 7)).toDF("k", "b"), f)
      LayoutMaintenance.commitAppend(spark, tbl.getPath, Seq(
        ManifestEntrySpec(status = 1, content = 0,
          filePath = f.getAbsolutePath, recordCount = n,
          sizeBytes = f.length())))
    } finally spark.conf.unset(key)
    // back under the cap: the next commit walks entries as usual and
    // must read the reuse-written list without loss (incl. a DELETE)
    val (_, nDel) = LayoutMaintenance.commitDeleteWhere(spark, tbl.getPath,
      col("k") >= 340L)
    assert(nDel == 10L)
    assert(MorRead.readTable(spark, tbl.getPath).count() == 340L)
  }
}
