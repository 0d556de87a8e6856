package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{IcebergLayoutWriter, IcebergManifestSource,
  LayoutMaintenance, MetadataTables, MorRead}
import graft.sources.IcebergLayoutWriter.ManifestEntrySpec

/** The v2 WRITE path: MERGE upsert commits (equality-delete + data file
  * at a fresh sequence), write-audit-publish staging (head isolation
  * until fast-forward), and the metadata-tables inspection surface over
  * both. Everything runs against real on-disk layouts. */
class CommitWriteSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def freshTable(tag: String,
      rows: Seq[(Long, String, Long)]): java.io.File = {
    import spark.implicits._
    val tbl = new java.io.File(s"target/tmp-commit-$tag")
    org.apache.commons.io.FileUtils.deleteQuietly(tbl)
    val dataDir = new java.io.File(tbl, "data"); dataDir.mkdirs()
    val bf = new java.io.File(dataDir, "base.parquet")
    val n = IcebergLayoutWriter.writeSingleParquet(
      rows.toDF("k", "name", "v").sort(col("k")), bf)
    IcebergLayoutWriter.writeTable(tbl, Seq(ManifestEntrySpec(status = 1,
      content = 0, filePath = bf.getAbsolutePath, recordCount = n,
      sizeBytes = bf.length(), sequenceNumber = 1L)))
    tbl
  }

  private def state(tbl: java.io.File): Seq[(Long, String, Long)] =
    MorRead.readTable(spark, tbl.getPath, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  test("commitUpsert data files carry harvested bounds for declared stat fields") {
    import spark.implicits._
    val tbl = freshTable("ubounds", Seq((1L, "a", 10L), (2L, "b", 20L)))
    // declare pushdown.fields the way a catalog descriptor does
    java.nio.file.Files.write(
      new java.io.File(tbl, "graft-table.json").toPath,
      """{"properties": {"pushdown.fields": "k:1:long"}}"""
        .getBytes("UTF-8"))
    LayoutMaintenance.commitUpsert(spark, tbl.getPath,
      Seq((2L, "bb", 22L), (5L, "e", 50L)).toDF("k", "name", "v"),
      Seq("k"))
    val rows = IcebergManifestSource
      .statsFromTableDir(spark, tbl.getPath, "t",
        Seq((1, "k", org.apache.spark.sql.types.LongType)))
      .filter(col("content") === 0 && col("sequence_number") === 2)
      .select("lo_k", "hi_k").collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 2L &&
      rows.head.getLong(1) == 5L,
      s"upsert file must record harvested k bounds: ${rows.mkString}")
  }

  test("commitUpsert: updates replace, inserts append, untouched rows survive") {
    import spark.implicits._
    val tbl = freshTable("upsert", Seq(
      (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    val (snap, n) = LayoutMaintenance.commitUpsert(spark, tbl.getPath,
      Seq((2L, "b2", 200L), (9L, "i", 900L)).toDF("k", "name", "v"), Seq("k"))
    assert(snap == 2L && n == 2L)
    assert(state(tbl) == Seq((1L, "a", 10L), (2L, "b2", 200L),
      (3L, "c", 30L), (9L, "i", 900L)))
  }

  test("commitUpsert stacks: a second upsert supersedes the first (sequence order)") {
    import spark.implicits._
    val tbl = freshTable("upsert2", Seq((1L, "a", 10L), (2L, "b", 20L)))
    LayoutMaintenance.commitUpsert(spark, tbl.getPath,
      Seq((2L, "b2", 200L)).toDF("k", "name", "v"), Seq("k"))
    val (snap3, _) = LayoutMaintenance.commitUpsert(spark, tbl.getPath,
      Seq((2L, "b3", 300L), (1L, "a2", 100L)).toDF("k", "name", "v"), Seq("k"))
    assert(snap3 == 3L)
    assert(state(tbl) == Seq((1L, "a2", 100L), (2L, "b3", 300L)))
    // time travel still sees the intermediate state through snapshot 2
    val mid = IcebergManifestSource
      .statsFromTableDir(spark, tbl.getPath, "t", Nil, Some(2L))
      .filter(col("content") === 0).count()
    assert(mid == 2L, "snapshot 2 must hold base + first upsert data files")
  }

  test("commitUpsert carries existing entries verbatim (paths + sequences)") {
    import spark.implicits._
    val tbl = freshTable("carry", Seq((1L, "a", 10L)))
    LayoutMaintenance.commitUpsert(spark, tbl.getPath,
      Seq((5L, "x", 50L)).toDF("k", "name", "v"), Seq("k"))
    val ent = IcebergManifestSource
      .statsFromTableDir(spark, tbl.getPath, "t", Nil)
      .select("file_path", "content", "sequence_number")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(ent.count(_._2 == 0) == 2 && ent.count(_._2 == 2) == 1)
    assert(ent.filter(_._1.endsWith("base.parquet")).map(_._3) == Seq(1L),
      "carried base file must keep sequence 1")
    assert(ent.filterNot(_._1.endsWith("base.parquet")).map(_._3).distinct == Seq(2L))
  }

  test("commitDelete removes keys; rewriteDataFiles preserves state, drops tombstones") {
    import spark.implicits._
    val tbl = freshTable("crud", Seq(
      (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L)))
    LayoutMaintenance.commitUpsert(spark, tbl.getPath,
      Seq((2L, "b2", 200L), (7L, "g", 700L)).toDF("k", "name", "v"), Seq("k"))
    val (delSnap, nk) = LayoutMaintenance.commitDelete(spark, tbl.getPath,
      Seq(3L, 7L, 99L).toDF("k"), Seq("k"))
    assert(delSnap == 3L && nk == 3L)
    val expected = Seq((1L, "a", 10L), (2L, "b2", 200L), (4L, "d", 40L))
    assert(state(tbl) == expected)
    val (snap, n, before, after) =
      LayoutMaintenance.rewriteDataFiles(spark, tbl.getPath, Seq("k"))
    assert(snap == 4L && n == 3L && before == 2 && after == 1)
    assert(state(tbl) == expected, "rewrite changed the visible relation")
    // exactly one file survives and it is a data file
    val byContent = IcebergManifestSource
      .statsFromTableDir(spark, tbl.getPath, "t", Nil)
      .select("content").collect().map(_.getInt(0)).toSeq
    assert(byContent == Seq(0), s"files after rewrite: $byContent")
    // history intact: the pre-rewrite snapshot still time-travels
    val mor3 = MorRead.readTable(spark, tbl.getPath, Seq("k"))
    assert(mor3.columns.toSeq == Seq("k", "name", "v"))
  }

  test("commitUpsert on a PARTITIONED table: carried partitions survive, shapes split") {
    import spark.implicits._
    val tbl = new java.io.File("target/tmp-commit-part")
    org.apache.commons.io.FileUtils.deleteQuietly(tbl)
    val dataDir = new java.io.File(tbl, "data"); dataDir.mkdirs()
    val entries = Seq(1, 2).map { mth =>
      val f = new java.io.File(dataDir, s"m$mth.parquet")
      val n = IcebergLayoutWriter.writeSingleParquet(
        Seq((mth * 10L, s"r$mth", mth * 100L)).toDF("k", "name", "v"), f)
      ManifestEntrySpec(status = 1, content = 0, filePath = f.getAbsolutePath,
        partition = Seq("m" -> mth), recordCount = n, sizeBytes = f.length(),
        sequenceNumber = 1L)
    }
    IcebergLayoutWriter.writeTable(tbl, entries,
      partitionSpec = Seq(("m", "identity", 1)))
    val (snap, n) = LayoutMaintenance.commitUpsert(spark, tbl.getPath,
      Seq((10L, "r1b", 111L)).toDF("k", "name", "v"), Seq("k"))
    assert(snap == 2L && n == 1L)
    assert(state(tbl) == Seq((10L, "r1b", 111L), (20L, "r2", 200L)))
    // the carried files keep their partition keys; the new file is shape-split
    val pks = IcebergManifestSource
      .statsFromTableDir(spark, tbl.getPath, "t", Nil)
      .filter(org.apache.spark.sql.functions.col("content") === 0)
      .select("partitionKey").collect().map(_.getString(0)).sorted.toSeq
    assert(pks.count(_.contains("\"m\"")) == 2, s"partition keys lost: $pks")
  }

  test("commitUpsert after position deletes: both tombstone kinds compose") {
    import spark.implicits._
    val tbl = freshTable("mixed", Seq(
      (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    LayoutMaintenance.commitDeleteWhere(spark, tbl.getPath,
      org.apache.spark.sql.functions.col("k") === 2L)
    LayoutMaintenance.commitUpsert(spark, tbl.getPath,
      Seq((3L, "c2", 300L)).toDF("k", "name", "v"), Seq("k"))
    // pos tombstone still kills k=2 (data_seq 1 <= del seq 2); eq
    // tombstone at seq 3 kills the ORIGINAL k=3 but not its replacement
    assert(state(tbl) == Seq((1L, "a", 10L), (3L, "c2", 300L)))
    val contents = IcebergManifestSource
      .statsFromTableDir(spark, tbl.getPath, "t", Nil)
      .select("content").collect().map(_.getInt(0)).toSeq.sorted
    assert(contents == Seq(0, 0, 1, 2), s"files: $contents")
  }

  test("commitMerge: one commit applies mixed upserts and deletes") {
    import spark.implicits._
    val tbl = freshTable("merge", Seq(
      (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    val (snap, nUp, nDel) = LayoutMaintenance.commitMerge(spark, tbl.getPath,
      Seq((2L, "b2", 200L, "U"), (3L, "c", 0L, "D"), (9L, "i", 900L, "U"))
        .toDF("k", "name", "v", "op"), Seq("k"), "op")
    assert(snap == 2L && nUp == 2L && nDel == 1L)
    assert(state(tbl) == Seq((1L, "a", 10L), (2L, "b2", 200L), (9L, "i", 900L)))
  }

  test("commitDeleteWhere: predicate rows die via position tombstones, files survive") {
    import spark.implicits._
    val tbl = freshTable("posdel", Seq(
      (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L)))
    val (snap, n) = LayoutMaintenance.commitDeleteWhere(spark, tbl.getPath,
      org.apache.spark.sql.functions.col("v") >= 30L)
    assert(snap == 2L && n == 2L)
    assert(state(tbl) == Seq((1L, "a", 10L), (2L, "b", 20L)))
    // a second predicate delete stacks on the survivors only
    val (snap3, n3) = LayoutMaintenance.commitDeleteWhere(spark, tbl.getPath,
      org.apache.spark.sql.functions.col("name") === "a")
    assert(snap3 == 3L && n3 == 1L)
    assert(state(tbl) == Seq((2L, "b", 20L)))
    // data file untouched; two position-delete files now carried
    val byContent = IcebergManifestSource
      .statsFromTableDir(spark, tbl.getPath, "t", Nil)
      .select("content").collect().map(_.getInt(0)).toSeq.sorted
    assert(byContent == Seq(0, 1, 1), s"files: $byContent")
  }

  test("stageAppend isolates until fastForward publishes (WAP)") {
    val tbl = freshTable("wap", Seq((1L, "a", 10L)))
    val headBefore = MetadataTables.files(spark, tbl.getPath)
      .select("file_path").collect().map(_.getString(0)).sorted.toSeq
    val staged = LayoutMaintenance.stageAppend(spark, tbl.getPath,
      Seq(ManifestEntrySpec(status = 1, content = 0,
        filePath = "data/staged.parquet", recordCount = 4L, sizeBytes = 64L)),
      branch = "audit")
    assert(staged == 2L)
    // head unmoved; branch sees the staged file; refs table is truthful
    assert(MetadataTables.files(spark, tbl.getPath)
      .select("file_path").collect().map(_.getString(0)).sorted.toSeq == headBefore)
    assert(MetadataTables.files(spark, tbl.getPath, Some(staged)).count() == 2L)
    val refs = MetadataTables.refs(spark, tbl.getPath).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(refs("audit") == 2L)
    val published = LayoutMaintenance.fastForward(spark, tbl.getPath, "audit")
    assert(published == 2L)
    assert(MetadataTables.files(spark, tbl.getPath).count() == 2L)
    val refs2 = MetadataTables.refs(spark, tbl.getPath).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(refs2("main") == 2L && refs2("audit") == 2L)
    val hist = MetadataTables.history(spark, tbl.getPath)
      .filter(col("is_current_ancestor")).count()
    assert(hist == 2L)
  }

  test("failing audit: dropRef withholds publish, head and main never move") {
    val tbl = freshTable("wapfail", Seq((1L, "a", 10L)))
    val staged = LayoutMaintenance.stageAppend(spark, tbl.getPath,
      Seq(ManifestEntrySpec(status = 1, content = 0,
        filePath = "data/bad.parquet", recordCount = 0L, sizeBytes = 0L)),
      branch = "audit")
    // the audit gate finds an empty file -> drop the branch, nothing publishes
    val staged0 = MetadataTables.files(spark, tbl.getPath, Some(staged))
      .filter(org.apache.spark.sql.functions.col("record_count") <= 0).count()
    assert(staged0 == 1L, "fixture must stage a failing file")
    LayoutMaintenance.dropRef(spark, tbl.getPath, "audit")
    assert(MetadataTables.refs(spark, tbl.getPath).collect()
      .forall(_.getString(0) != "audit"))
    assert(MetadataTables.files(spark, tbl.getPath).count() == 1L,
      "head moved despite the failed audit")
    intercept[IllegalArgumentException] {
      LayoutMaintenance.dropRef(spark, tbl.getPath, "main")
    }
    // the dead snapshot sits in history until reachability GC reclaims
    // it (keep-last expiry can't: the abandoned snapshot is the newest)
    assert(LayoutMaintenance.snapshotIds(spark, tbl.getPath) == Seq(1L, 2L))
    val (kept, deleted) = LayoutMaintenance.expireUnreferenced(spark, tbl.getPath)
    assert(kept == Seq(1L),
      "GC must keep the CURRENT snapshot, drop the abandoned staged one")
    assert(deleted > 0, "the staged snapshot's metadata files must go")
    assert(MetadataTables.files(spark, tbl.getPath).count() == 1L)
  }

  test("rewrite then expire: old data files become orphans, cleanly listable") {
    import spark.implicits._
    val tbl = freshTable("rworphan", Seq((1L, "a", 10L), (2L, "b", 20L)))
    LayoutMaintenance.commitUpsert(spark, tbl.getPath,
      Seq((2L, "b2", 200L)).toDF("k", "name", "v"), Seq("k"))
    LayoutMaintenance.rewriteDataFiles(spark, tbl.getPath, Seq("k"))
    // all three commits still reference base/upsert/eqdel through history
    val (kept, _) = LayoutMaintenance.expireSnapshots(spark, tbl.getPath, keepLast = 1)
    assert(kept.size == 1)
    // after expiry only the rewrite file is reachable; everything else
    // under data/ is an orphan the GC would reclaim
    val reachable = IcebergManifestSource
      .statsFromTableDir(spark, tbl.getPath, "t", Nil)
      .select("file_path").collect().map(_.getString(0)).toSet
    assert(reachable.size == 1 && reachable.head.contains("rewrite-"))
    val onDisk = new java.io.File(tbl, "data").listFiles().map(_.getAbsolutePath).toSet
    val orphans = onDisk -- reachable
    assert(orphans.exists(_.contains("base")) && orphans.exists(_.contains("upsert")) &&
      orphans.exists(_.contains("eqdel")), s"expected orphans, got $orphans")
    assert(state(tbl) == Seq((1L, "a", 10L), (2L, "b2", 200L)),
      "the surviving snapshot must still read correctly after expiry")
  }

  test("metadata tables: partitions rollup splits data from delete files") {
    val tbl = new java.io.File("target/tmp-commit-meta")
    org.apache.commons.io.FileUtils.deleteQuietly(tbl)
    IcebergLayoutWriter.writeTable(tbl, Seq(
      ManifestEntrySpec(status = 1, content = 0, filePath = "d1.parquet",
        partition = Seq("m" -> 1), recordCount = 10L, sizeBytes = 100L),
      ManifestEntrySpec(status = 1, content = 0, filePath = "d2.parquet",
        partition = Seq("m" -> 1), recordCount = 5L, sizeBytes = 50L),
      ManifestEntrySpec(status = 1, content = 0, filePath = "d3.parquet",
        partition = Seq("m" -> 2), recordCount = 7L, sizeBytes = 70L),
      ManifestEntrySpec(status = 1, content = 1, filePath = "pd.parquet",
        partition = Seq("m" -> 1), recordCount = 2L, sizeBytes = 8L),
      ManifestEntrySpec(status = 1, content = 2, filePath = "ed.parquet",
        partition = Seq("m" -> 2), recordCount = 1L, sizeBytes = 4L)))
    val rows = MetadataTables.partitions(spark, tbl.getPath)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    assert(rows == Seq(
      ("""{"m":1}""", 2L, 15L, 150L, 1L, 0L),
      ("""{"m":2}""", 1L, 7L, 70L, 0L, 1L)))
  }
}
