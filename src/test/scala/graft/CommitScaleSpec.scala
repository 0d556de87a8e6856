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

  private val capKey = "spark.graft.maxDriverFileEntries"

  private def atToyCap[T](body: => T): T = {
    spark.conf.set(capKey, "2")
    try body finally spark.conf.unset(capKey)
  }

  /** Entry relation tolerant of bound-less entries (merge/delete files). */
  private def fullRelation(tbl: java.io.File)
      : Seq[(String, Int, Long, Long, Option[Long], Option[Long])] =
    IcebergManifestSource
      .statsFromTableDir(spark, tbl.getPath, "t", Seq((1, "k", LongType)))
      .select(col("file_path"), col("content"), col("record_count"),
        col("sequence_number"), col("lo_k"), col("hi_k"))
      .collect()
      .map(r => (r.getString(0).split('/').last, r.getInt(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
      .sortBy(_._1).toSeq

  private def stateOf(tbl: java.io.File, eqKeys: Seq[String] = Nil): Set[(Long, Long)] =
    MorRead.readTable(spark, tbl.getPath, eqKeys)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("MERGE past the cap: manifest reuse, entries + state match the driver walk") {
    import spark.implicits._
    val capped = build("mcap", 3)
    val walked = build("mwalk", 3)
    val oldManifests = IcebergManifestSource.manifestPathSeqs(
      spark.sparkContext.hadoopConfiguration,
      new java.io.File(new java.io.File(capped, "metadata"),
        s"snap-3-manifest-list.avro").getAbsolutePath).map(_._1).toSet
    def mergeOne(tbl: java.io.File): Unit =
      LayoutMaintenance.commitMerge(spark, tbl.getPath,
        Seq((5L, 99L, "U"), (150L, 0L, "D")).toDF("k", "b", "op"),
        Seq("k"), "op")
    atToyCap { mergeOne(capped) }
    mergeOne(walked)
    assert(fullRelation(capped) == fullRelation(walked))
    assert(stateOf(capped, Seq("k")) == stateOf(walked, Seq("k")))
    assert(stateOf(capped, Seq("k")).exists(_ == (5L, 99L)))
    assert(!stateOf(capped, Seq("k")).exists(_._1 == 150L))
    // reuse pinned: every pre-merge manifest referenced verbatim
    val headAfter = LayoutMaintenance.snapshotIds(spark, capped.getPath).last
    val newManifests = IcebergManifestSource.manifestPathSeqs(
      spark.sparkContext.hadoopConfiguration,
      new java.io.File(new java.io.File(capped, "metadata"),
        s"snap-$headAfter-manifest-list.avro").getAbsolutePath)
      .map(_._1).toSet
    assert(oldManifests.subsetOf(newManifests),
      "past-the-cap MERGE must reference previous manifests verbatim")
  }

  test("rewrite_data_files past the cap: no entry walk, tombstones folded, state preserved") {
    val capped = build("rwcap", 3)
    val walked = build("rwwalk", 3)
    def delAndRewrite(tbl: java.io.File, cap: Boolean): Unit = {
      val (_, nd) = LayoutMaintenance.commitDeleteWhere(spark, tbl.getPath,
        col("k") % 100L === 7L)
      assert(nd == 3L)
      if (cap) atToyCap {
        LayoutMaintenance.rewriteDataFiles(spark, tbl.getPath, Nil)
      } else LayoutMaintenance.rewriteDataFiles(spark, tbl.getPath, Nil)
    }
    delAndRewrite(capped, cap = true)
    delAndRewrite(walked, cap = false)
    assert(fullRelation(capped) == fullRelation(walked))
    assert(stateOf(capped) == stateOf(walked))
    assert(stateOf(capped).size == 297)
    assert(fullRelation(capped).count(_._2 != 0) == 0,
      "rewrite must fold tombstones away on the past-the-cap path too")
  }

  /** [[build]], but appends 2+ land through the REUSE path so each
    * commit's manifest stays a separate file — the shape a streaming
    * ingest leaves, and the one where verbatim manifest reuse is
    * observable. */
  private def buildMulti(tag: String, appends: Int): java.io.File = {
    import spark.implicits._
    val tbl = new java.io.File(s"target/tmp-scale-$tag")
    org.apache.commons.io.FileUtils.deleteQuietly(tbl)
    val dataDir = new java.io.File(tbl, "data"); dataDir.mkdirs()
    (0 until appends).foreach { i =>
      val f = new java.io.File(dataDir, s"f$i.parquet")
      val lo = i * 100L; val hi = lo + 99L
      val n = IcebergLayoutWriter.writeSingleParquet(
        (lo to hi).map(k => (k, k % 7)).toDF("k", "b").sort(col("k")), f)
      val entry = ManifestEntrySpec(status = 1, content = 0,
        filePath = f.getAbsolutePath, recordCount = n,
        sizeBytes = f.length(),
        lower = Map(1 -> IcebergLayoutWriter.boundLong(lo)),
        upper = Map(1 -> IcebergLayoutWriter.boundLong(hi)))
      if (i == 0)
        LayoutMaintenance.commitAppend(spark, tbl.getPath, Seq(entry))
      else {
        // cap 0: EVERY append reuses, so each commit's manifest stays
        // its own file (cap 2 only trips at 3+ carried entries)
        spark.conf.set(capKey, "0")
        try LayoutMaintenance.commitAppend(spark, tbl.getPath, Seq(entry))
        finally spark.conf.unset(capKey)
      }
    }
    tbl
  }

  test("targeted COW delete past the cap: untouched manifests ride verbatim, touched rewrite in tasks") {
    val capped = buildMulti("cowcap", 3)
    val walked = buildMulti("cowwalk", 3)
    def cowOne(tbl: java.io.File): Long =
      LayoutMaintenance.commitDeleteWhereCow(spark, tbl.getPath,
        col("k").between(100L, 105L))._2
    val before = IcebergManifestSource.manifestPathSeqs(
      spark.sparkContext.hadoopConfiguration,
      new java.io.File(new java.io.File(capped, "metadata"),
        s"snap-3-manifest-list.avro").getAbsolutePath).map(_._1)
    assert(atToyCap { cowOne(capped) } == 6L)
    assert(cowOne(walked) == 6L)
    assert(fullRelation(capped) == fullRelation(walked))
    assert(stateOf(capped) == stateOf(walked))
    assert(stateOf(capped).size == 294)
    // exactly the manifests NOT holding f1.parquet are referenced verbatim
    val headAfter = LayoutMaintenance.snapshotIds(spark, capped.getPath).last
    val after = IcebergManifestSource.manifestPathSeqs(
      spark.sparkContext.hadoopConfiguration,
      new java.io.File(new java.io.File(capped, "metadata"),
        s"snap-$headAfter-manifest-list.avro").getAbsolutePath).map(_._1)
    val untouched = before.filter(p => IcebergManifestSource
      .statsFromManifests(spark, Seq(p), "t", Nil)
      .select("file_path").collect().map(_.getString(0))
      .forall(!_.endsWith("f1.parquet")))
    assert(untouched.nonEmpty && untouched.forall(after.contains),
      "untouched manifests must be referenced verbatim")
    assert(!before.filterNot(untouched.contains).exists(after.contains),
      "the touched manifest must be retired from the list")
  }

  test("MOR delta commit past the cap: posdel lands via reuse; dead reference still conflicts") {
    import spark.implicits._
    val capped = build("dcap", 3)
    val walked = build("dwalk", 3)
    def posdel(tbl: java.io.File, name: String, target: String,
        pos: Long): ManifestEntrySpec = {
      val f = new java.io.File(new java.io.File(tbl, "data"), name)
      val t = new java.io.File(new java.io.File(tbl, "data"), target)
        .getAbsolutePath
      val n = IcebergLayoutWriter.writeSingleParquet(
        Seq((t, pos)).toDF("file_path", "pos"), f)
      ManifestEntrySpec(status = 1, content = 1,
        filePath = f.getAbsolutePath, recordCount = n, sizeBytes = f.length())
    }
    def target(tbl: java.io.File): String = new java.io.File(
      new java.io.File(tbl, "data"), "f0.parquet").getAbsolutePath
    atToyCap {
      LayoutMaintenance.commitDeltaFiles(spark, capped.getPath,
        Seq(posdel(capped, "pd.parquet", "f0.parquet", 0L)),
        referencedDataFiles = Seq(target(capped)))
    }
    LayoutMaintenance.commitDeltaFiles(spark, walked.getPath,
      Seq(posdel(walked, "pd.parquet", "f0.parquet", 0L)),
      referencedDataFiles = Seq(target(walked)))
    assert(fullRelation(capped) == fullRelation(walked))
    assert(stateOf(capped) == stateOf(walked))
    assert(stateOf(capped).size == 299)
    // the DISTRIBUTED liveness check fires on a dead reference too
    val e = intercept[graft.sources.CommitConflictException] {
      atToyCap {
        LayoutMaintenance.commitDeltaFiles(spark, capped.getPath,
          Seq(posdel(capped, "pd2.parquet", "f0.parquet", 1L)),
          referencedDataFiles =
            Seq(target(capped).replace("f0.parquet", "gone.parquet")))
      }
    }
    assert(e.getMessage.contains("no longer live"))
  }

  test("DV supersede holds past the cap: two DV deletes leave one live vector per file") {
    val tbl = build("dvcap", 3)
    atToyCap {
      LayoutMaintenance.commitDeleteWhereDv(spark, tbl.getPath, col("k") === 3L)
      LayoutMaintenance.commitDeleteWhereDv(spark, tbl.getPath, col("k") === 5L)
    }
    val dvs = IcebergManifestSource
      .statsFromTableDir(spark, tbl.getPath, "t", Nil)
      .filter(col("content") === 1).select("file_path", "file_format")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(dvs.forall(_._2 == "PUFFIN"))
    val perTarget = dvs.flatMap(p =>
      graft.sources.DeletionVectors.read(new java.io.File(p._1)))
      .groupBy(_._1).view.mapValues(_.flatMap(_._2).toSet).toMap
    assert(perTarget.values.map(_.size).sum == 2)
    assert(perTarget.forall(_._2.subsetOf(Set(3L, 5L))))
    assert(dvs.size == 1, s"one superseding DV expected, got $dvs")
    assert(MorRead.readTable(spark, tbl.getPath).count() == 298L)
  }

  test("WAP staging past the cap: branch + wap.id appends reuse manifests, head isolated") {
    val tbl = buildMulti("wapcap", 3)
    // branch staging
    atToyCap {
      LayoutMaintenance.stageAppend(spark, tbl.getPath,
        Seq(dataFile(tbl, "staged.parquet", 3)), branch = "audit")
    }
    // head untouched, branch sees the staged file
    assert(MorRead.readTable(spark, tbl.getPath).count() == 300L)
    val branchId = IcebergManifestSource
      .refSnapshotId(spark, tbl.getPath, "audit").get
    assert(LayoutMaintenance.snapshotIds(spark, tbl.getPath).last == branchId)
    assert(fullRelation(tbl).map(_._1).toSet == // head relation unchanged
      Set("f0.parquet", "f1.parquet", "f2.parquet"))
    // wap.id staging past the cap on a second table
    val tbl2 = buildMulti("wapidcap", 3)
    spark.conf.set("spark.wap.id", "ignored") // not read by the API path
    try atToyCap {
      LayoutMaintenance.stageAppendWap(spark, tbl2.getPath,
        Seq(dataFile(tbl2, "staged2.parquet", 4)), wapId = "aud-1")
    } finally spark.conf.unset("spark.wap.id")
    assert(MorRead.readTable(spark, tbl2.getPath).count() == 300L)
    val staged = LayoutMaintenance.snapshotSummaries(spark, tbl2.getPath)
      .collectFirst { case (id, _, kv) if kv.get("wap.id").contains("aud-1")
        => id }
    assert(staged.nonEmpty, "wap.id summary tag must survive the reuse path")
    // publish via cherry-pick AT THE CAP TOO: the staged rows land on
    // the head through the reuse-shaped publish
    atToyCap { LayoutMaintenance.publishChanges(spark, tbl2.getPath, "aud-1") }
    assert(MorRead.readTable(spark, tbl2.getPath).count() == 400L)
    assert(stateOf(tbl2).size == 400)
  }

  test("rewrite_position_deletes past the cap: data manifests ride verbatim, one posdel survives") {
    val capped = buildMulti("rpdcap", 3)
    val walked = buildMulti("rpdwalk", 3)
    def prep(tbl: java.io.File): Unit = {
      LayoutMaintenance.commitDeleteWhere(spark, tbl.getPath, col("k") === 5L)
      LayoutMaintenance.commitDeleteWhere(spark, tbl.getPath, col("k") === 105L)
    }
    prep(capped); prep(walked)
    val headBefore = LayoutMaintenance.snapshotIds(spark, capped.getPath).last
    val dataManifestsBefore = IcebergManifestSource.manifestPathSeqContents(
      spark.sparkContext.hadoopConfiguration,
      new java.io.File(new java.io.File(capped, "metadata"),
        s"snap-$headBefore-manifest-list.avro").getAbsolutePath)
      .filter(_._3 == 0).map(_._1)
    assert(dataManifestsBefore.nonEmpty)
    val (_, before, after, pairs) = atToyCap {
      LayoutMaintenance.rewritePositionDeletes(spark, capped.getPath)
    }
    val (_, b2, a2, p2) = LayoutMaintenance
      .rewritePositionDeletes(spark, walked.getPath)
    assert((before, after, pairs) == (b2, a2, p2))
    assert(before == 2 && after == 1 && pairs == 2L)
    assert(stateOf(capped) == stateOf(walked))
    assert(stateOf(capped).size == 298)
    // data manifests referenced VERBATIM on the capped path
    val headAfter = LayoutMaintenance.snapshotIds(spark, capped.getPath).last
    val lists = IcebergManifestSource.manifestPathSeqs(
      spark.sparkContext.hadoopConfiguration,
      new java.io.File(new java.io.File(capped, "metadata"),
        s"snap-$headAfter-manifest-list.avro").getAbsolutePath).map(_._1)
    assert(dataManifestsBefore.forall(lists.contains),
      s"data manifests must ride verbatim: $dataManifestsBefore vs $lists")
  }

  test("clone past the cap is BY REFERENCE: list copy, shared bytes, expiry never reaches the source") {
    val src = buildMulti("clsrc", 3)
    val dst = new java.io.File("target/tmp-scale-cldst")
    org.apache.commons.io.FileUtils.deleteQuietly(dst)
    val (cloneId, nFiles) = atToyCap {
      LayoutMaintenance.snapshotTable(spark, src.getPath, dst.getPath)
    }
    assert(nFiles == 3)
    assert(stateOf(dst) == stateOf(src))
    assert(fullRelation(dst) == fullRelation(src)) // seqs/bounds verbatim
    // the clone's list references the SOURCE's manifest files in place
    val cloneManifests = IcebergManifestSource.manifestPathSeqs(
      spark.sparkContext.hadoopConfiguration,
      new java.io.File(new java.io.File(dst, "metadata"),
        s"snap-$cloneId-manifest-list.avro").getAbsolutePath).map(_._1)
    assert(cloneManifests.nonEmpty &&
      cloneManifests.forall(_.contains("tmp-scale-clsrc")),
      s"by-reference clone must point at the source's manifests: $cloneManifests")
    // clone diverges with its own commit, then expires its history —
    // the source's referenced manifests MUST survive (ownership guard)
    LayoutMaintenance.commitAppend(spark, dst.getPath,
      Seq(dataFile(dst, "mine.parquet", 9)))
    LayoutMaintenance.expireSnapshots(spark, dst.getPath, keepLast = 1)
    assert(cloneManifests.forall(p => new java.io.File(p).exists()),
      "expiring clone history must never delete the source's files")
    assert(stateOf(src).size == 300) // source untouched end to end
    assert(MorRead.readTable(spark, dst.getPath).count() == 400L)
  }

  test("rewrite_data_files with a target size: task-parallel multi-file output, state exact") {
    val tbl = build("rwtgt", 3)
    LayoutMaintenance.commitDeleteWhere(spark, tbl.getPath, col("k") === 7L)
    val pre = stateOf(tbl)
    assert(pre.size == 299)
    // target ≈ a third of the data: the rewrite must emit SEVERAL files
    val totalBytes = fullRelation(tbl).filter(_._2 == 0)
      .map(r => new java.io.File(new java.io.File(tbl, "data"), r._1).length())
      .sum
    val (_, rows, before, after) = LayoutMaintenance.rewriteDataFiles(
      spark, tbl.getPath, Nil, sortCols = Seq("k"),
      targetFileSizeBytes = Some(totalBytes / 3))
    assert(rows == 299L && before == 3)
    assert(after > 1, s"expected a multi-file rewrite, got $after")
    assert(stateOf(tbl) == pre)
    assert(fullRelation(tbl).count(_._2 != 0) == 0, "tombstones folded")
    // range-distributed + sorted: the output files' k ranges are DISJOINT
    val ranges = fullRelation(tbl).map { r =>
      val f = new java.io.File(new java.io.File(tbl, "data"), r._1)
      val ks = spark.read.parquet(f.getAbsolutePath).select("k")
        .collect().map(_.getLong(0))
      (ks.min, ks.max)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"output ranges must be disjoint: $ranges")
      case _ => ()
    }
  }

  test("rewriteSmallFiles: overshoot groups fold, large files ride verbatim (executed bin-pack)") {
    import spark.implicits._
    val tbl = new java.io.File("target/tmp-scale-binpack")
    org.apache.commons.io.FileUtils.deleteQuietly(tbl)
    val dataDir = new java.io.File(tbl, "data"); dataDir.mkdirs()
    // 6 small files (~3-4 KB each) + 1 large file, committed one by one
    val sizes = scala.collection.mutable.Map.empty[String, Long]
    (0 until 6).foreach { i =>
      val f = new java.io.File(dataDir, s"s$i.parquet")
      val lo = i * 10L
      val n = IcebergLayoutWriter.writeSingleParquet(
        (lo until lo + 10L).map(k => (k, s"v$k")).toDF("k", "v"), f)
      sizes(f.getName) = f.length()
      LayoutMaintenance.commitAppend(spark, tbl.getPath, Seq(
        ManifestEntrySpec(status = 1, content = 0,
          filePath = f.getAbsolutePath, recordCount = n,
          sizeBytes = f.length())))
    }
    val big = new java.io.File(dataDir, "big.parquet")
    val nBig = IcebergLayoutWriter.writeSingleParquet(
      (1000L until 6000L).map(k => (k, s"v$k")).toDF("k", "v"), big)
    LayoutMaintenance.commitAppend(spark, tbl.getPath, Seq(
      ManifestEntrySpec(status = 1, content = 0,
        filePath = big.getAbsolutePath, recordCount = nBig,
        sizeBytes = big.length())))
    val before = MorRead.readTable(spark, tbl.getPath)
      .collect().map(_.toSeq).toSet
    // threshold between small and big; group cap = ~3 small files
    val smallCap = big.length() // strict <: big excluded
    val groupCap = sizes.values.toSeq.sorted.take(3).sum
    val (snap, compacted, groups) = LayoutMaintenance.rewriteSmallFiles(
      spark, tbl.getPath, maxGroupBytes = groupCap,
      smallFileBytes = smallCap)
    assert(compacted == 6)
    // the EXACT overshoot prediction: same loop the metric report runs
    val expectedGroups = {
      var g = 0; var cur = 0L; var nonEmpty = false
      sizes.values.toSeq.sorted.foreach { s =>
        if (cur > groupCap) { g += 1; cur = 0L; nonEmpty = false }
        cur += s; nonEmpty = true
      }
      if (nonEmpty) g + 1 else g
    }
    assert(groups == expectedGroups,
      s"executed packer must match the simulated one: $groups vs $expectedGroups")
    // big file carried VERBATIM; small files replaced by the groups
    val live = fullRelation(tbl).map(_._1).toSet
    assert(live.contains("big.parquet"))
    assert(!live.exists(_.startsWith("s")), live.toString)
    assert(live.size == 1 + groups)
    // state exact, snapshot appended (history preserved)
    assert(MorRead.readTable(spark, tbl.getPath)
      .collect().map(_.toSeq).toSet == before)
    assert(LayoutMaintenance.snapshotIds(spark, tbl.getPath).last == snap)
    // idempotence at the same thresholds: consolidated files are now
    // either large or single-group — nothing left to fold
    val smallAfter = fullRelation(tbl).count(r =>
      r._1 != "big.parquet")
    val (snap2, c2, g2) = LayoutMaintenance.rewriteSmallFiles(
      spark, tbl.getPath, maxGroupBytes = groupCap,
      smallFileBytes = smallCap)
    assert(if (smallAfter >= 2) c2 >= 0 else c2 == 0)
    val _ = (snap2, g2)
  }

  test("rewriteSmallFiles on a PARTITIONED table: groups never span partitions, values kept") {
    import spark.implicits._
    val tbl = new java.io.File("target/tmp-scale-binpart")
    org.apache.commons.io.FileUtils.deleteQuietly(tbl)
    val dataDir = new java.io.File(tbl, "data"); dataDir.mkdirs()
    // two partitions, three small files each
    (0 until 6).foreach { i =>
      val part = (i % 2).toLong
      val f = new java.io.File(dataDir, s"p$i.parquet")
      val n = IcebergLayoutWriter.writeSingleParquet(
        (0 until 10).map(j => (i * 10L + j, part)).toDF("k", "pt"), f)
      LayoutMaintenance.commitAppend(spark, tbl.getPath, Seq(
        ManifestEntrySpec(status = 1, content = 0,
          filePath = f.getAbsolutePath, recordCount = n,
          sizeBytes = f.length(), partition = Seq(("pt", part)))),
        partitionSpec = Seq(("pt", "identity", 2)))
    }
    val pre = MorRead.readTable(spark, tbl.getPath).collect().map(_.toSeq).toSet
    val (_, compacted, groups) = LayoutMaintenance.rewriteSmallFiles(
      spark, tbl.getPath, maxGroupBytes = Long.MaxValue / 4,
      smallFileBytes = Long.MaxValue / 4)
    assert(compacted == 6)
    assert(groups == 2, s"one group per partition expected, got $groups")
    // every consolidated file kept its partition values
    val parts = IcebergManifestSource
      .statsFromTableDir(spark, tbl.getPath, "t", Nil)
      .filter(col("content") === 0)
      .select("partitionKey").collect().map(_.getString(0)).sorted.toSeq
    assert(parts == Seq("""{"pt":0}""", """{"pt":1}"""), parts.toString)
    assert(MorRead.readTable(spark, tbl.getPath)
      .collect().map(_.toSeq).toSet == pre)
  }

  test("replace-all past the cap carries nothing: RTAS shape at scale") {
    val tbl = build("racap", 3)
    val f = dataFile(tbl, "fresh.parquet", 3)
    atToyCap {
      LayoutMaintenance.commitReplaceAll(spark, tbl.getPath, Seq(f))
    }
    val rel = fullRelation(tbl)
    assert(rel.map(_._1) == Seq("fresh.parquet"))
    assert(MorRead.readTable(spark, tbl.getPath).count() == 100L)
    // history preserved
    assert(LayoutMaintenance.snapshotIds(spark, tbl.getPath).size == 4)
  }

  private def dataFile(tbl: java.io.File, name: String,
      i: Int): ManifestEntrySpec = {
    import spark.implicits._
    val f = new java.io.File(new java.io.File(tbl, "data"), name)
    val lo = i * 100L; val hi = lo + 99L
    val n = IcebergLayoutWriter.writeSingleParquet(
      (lo to hi).map(k => (k, k % 7)).toDF("k", "b").sort(col("k")), f)
    ManifestEntrySpec(status = 1, content = 0,
      filePath = f.getAbsolutePath, recordCount = n, sizeBytes = f.length(),
      lower = Map(1 -> IcebergLayoutWriter.boundLong(lo)),
      upper = Map(1 -> IcebergLayoutWriter.boundLong(hi)))
  }
}
