package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{IcebergLayoutWriter, IcebergManifestSource,
  LayoutMaintenance, MorRead}
import graft.sources.IcebergLayoutWriter.ManifestEntrySpec

/** `write.format.default` through the MAINTENANCE write paths: every
  * data-moving commit (upsert, merge, COW delete survivors, full
  * rewrite in both arms, bin-pack group output) must emit the table's
  * declared format — compacting an ORC/AVRO-default table must never
  * silently flip it to parquet. Delete files (position + equality
  * tombstones) stay parquet by design (`write.delete.format.default`
  * territory). Each case pins (a) the physical extension + manifest
  * `file_format` of the new files and (b) state equality through the
  * MOR read — format is a representation choice, never a semantics
  * change. */
class MaintenanceFormatSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  /** Build a 3-file table at `tag` with `write.format.default` = `fmt`
    * declared in its metadata properties (what ALTER TABLE SET
    * TBLPROPERTIES lands through the catalog). */
  private def build(tag: String, fmt: String): java.io.File = {
    import spark.implicits._
    val tbl = new java.io.File(s"target/tmp-mfmt-$tag")
    org.apache.commons.io.FileUtils.deleteQuietly(tbl)
    val dataDir = new java.io.File(tbl, "data"); dataDir.mkdirs()
    (0 until 3).foreach { i =>
      val f = new java.io.File(dataDir, s"f$i.parquet")
      val lo = i * 100L
      val n = IcebergLayoutWriter.writeSingleParquet(
        (lo until lo + 100L).map(k => (k, k % 7)).toDF("k", "b")
          .sort(col("k")), f)
      LayoutMaintenance.commitAppend(spark, tbl.getPath, Seq(
        ManifestEntrySpec(status = 1, content = 0,
          filePath = f.getAbsolutePath, recordCount = n,
          sizeBytes = f.length())))
    }
    setFormat(tbl, fmt)
    tbl
  }

  /** Declare the property the way a catalog ALTER does: patched into the
    * current metadata document's `properties` object. */
  private def setFormat(tbl: java.io.File, fmt: String): Unit = {
    val meta = new java.io.File(tbl, "metadata")
    val hint = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(meta, "version-hint.text").toPath), "UTF-8").trim
    val cur = new java.io.File(meta, s"v$hint.metadata.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(cur)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val props = Option(root.get("properties"))
      .collect { case o: com.fasterxml.jackson.databind.node.ObjectNode => o }
      .getOrElse(root.putObject("properties"))
    props.put("write.format.default", fmt)
    java.nio.file.Files.write(cur.toPath, mapper.writeValueAsBytes(root))
  }

  private def dataEntries(tbl: java.io.File): Seq[(String, String, Long)] =
    IcebergManifestSource.statsFromTableDir(spark, tbl.getPath, "t", Nil)
      .filter(col("content") === 0)
      .select("file_path", "file_format", "record_count")
      .collect().map(r => (r.getString(0).split('/').last, r.getString(1),
        r.getLong(2))).sortBy(_._1).toSeq

  private def stateOf(tbl: java.io.File,
      eqKeys: Seq[String] = Nil): Set[(Long, Long)] =
    MorRead.readTable(spark, tbl.getPath, eqKeys)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  for (fmt <- Seq("orc", "avro")) {
    val ext = fmt // extensionOf(orc)=orc, extensionOf(avro)=avro

    test(s"commitUpsert on a $fmt-default table lands $fmt data + parquet tombstone") {
      import spark.implicits._
      val tbl = build(s"up-$fmt", fmt)
      val pre = stateOf(tbl)
      LayoutMaintenance.commitUpsert(spark, tbl.getPath,
        Seq((7L, 99L), (1000L, 1L)).toDF("k", "b"), Seq("k"))
      val entries = dataEntries(tbl)
      val upserted = entries.filter(_._1.startsWith("upsert-"))
      assert(upserted.nonEmpty && upserted.forall(e =>
        e._1.endsWith(s".$ext") && e._2 == fmt.toUpperCase),
        s"upsert data must land as $fmt: $entries")
      val post = stateOf(tbl, eqKeys = Seq("k"))
      assert(post == pre - ((7L, 0L)) + ((7L, 99L)) + ((1000L, 1L)),
        "upsert state must be format-independent")
    }

    test(s"rewriteDataFiles (single-file arm) on a $fmt-default table emits $fmt") {
      val tbl = build(s"rw-$fmt", fmt)
      LayoutMaintenance.commitDeleteWhere(spark, tbl.getPath,
        col("k") % 10 === 3L)
      val pre = stateOf(tbl)
      val (_, rows, before, after) =
        LayoutMaintenance.rewriteDataFiles(spark, tbl.getPath, Nil,
          sortCols = Seq("k"))
      assert(before == 3 && after == 1 && rows == pre.size.toLong)
      val entries = dataEntries(tbl)
      assert(entries.size == 1 && entries.head._1.endsWith(s".$ext") &&
        entries.head._2 == fmt.toUpperCase,
        s"rewrite output must be $fmt: $entries")
      assert(stateOf(tbl) == pre, "rewrite must preserve state exactly")
    }

    test(s"rewriteDataFiles (target-size arm) on a $fmt-default table emits $fmt parts") {
      val tbl = build(s"rwt-$fmt", fmt)
      val pre = stateOf(tbl)
      val totalBytes = dataEntries(tbl).map(e =>
        new java.io.File(new java.io.File(tbl, "data"), e._1).length()).sum
      val (_, rows, _, after) =
        LayoutMaintenance.rewriteDataFiles(spark, tbl.getPath, Nil,
          sortCols = Seq("k"), targetFileSizeBytes = Some(totalBytes / 3))
      assert(rows == 300L && after > 1,
        s"expected a multi-file $fmt rewrite, got $after files")
      val entries = dataEntries(tbl)
      assert(entries.forall(e => e._1.endsWith(s".$ext") &&
        e._2 == fmt.toUpperCase),
        s"all rewrite parts must be $fmt: $entries")
      assert(entries.map(_._3).sum == 300L, "part row counts must add up")
      assert(stateOf(tbl) == pre, "rewrite must preserve state exactly")
    }

    test(s"COW delete survivors on a $fmt-default table rewrite as $fmt") {
      val tbl = build(s"cow-$fmt", fmt)
      val pre = stateOf(tbl)
      val (_, deleted) = LayoutMaintenance.commitDeleteWhereCow(spark,
        tbl.getPath, col("k") >= 250L)
      assert(deleted == 50L)
      val entries = dataEntries(tbl)
      val cow = entries.filter(_._1.startsWith("cowdel-"))
      assert(cow.nonEmpty && cow.forall(e =>
        e._1.endsWith(s".$ext") && e._2 == fmt.toUpperCase),
        s"COW survivors must land as $fmt: $entries")
      assert(stateOf(tbl) == pre.filter(_._1 < 250L))
    }
  }

  test("rewriteSmallFiles group output honors the table's declared format") {
    import spark.implicits._
    val tbl = new java.io.File("target/tmp-mfmt-binpack")
    org.apache.commons.io.FileUtils.deleteQuietly(tbl)
    val dataDir = new java.io.File(tbl, "data"); dataDir.mkdirs()
    (0 until 4).foreach { i =>
      val f = new java.io.File(dataDir, s"s$i.parquet")
      val lo = i * 10L
      val n = IcebergLayoutWriter.writeSingleParquet(
        (lo until lo + 10L).map(k => (k, k % 7)).toDF("k", "b"), f)
      LayoutMaintenance.commitAppend(spark, tbl.getPath, Seq(
        ManifestEntrySpec(status = 1, content = 0,
          filePath = f.getAbsolutePath, recordCount = n,
          sizeBytes = f.length())))
    }
    setFormat(tbl, "orc")
    val pre = stateOf(tbl)
    val (_, compacted, groups) = LayoutMaintenance.rewriteSmallFiles(
      spark, tbl.getPath, maxGroupBytes = 1L << 30,
      smallFileBytes = 1L << 20)
    assert(compacted == 4 && groups == 1)
    val entries = dataEntries(tbl)
    assert(entries.size == 1 && entries.head._1.endsWith(".orc") &&
      entries.head._2 == "ORC",
      s"bin-pack group output must be ORC: $entries")
    assert(stateOf(tbl) == pre, "compaction must preserve state exactly")
  }

  test("struct tables rewrite under ORC and AVRO defaults, state preserved") {
    import spark.implicits._
    val tbl = new java.io.File("target/tmp-mfmt-struct")
    org.apache.commons.io.FileUtils.deleteQuietly(tbl)
    val dataDir = new java.io.File(tbl, "data"); dataDir.mkdirs()
    val df = (0L until 50L).map(k => (k, (k * 10L, s"v$k")))
      .toDF("k", "m")
    val f = new java.io.File(dataDir, "f0.parquet")
    val n = IcebergLayoutWriter.writeSingleParquet(df.sort(col("k")), f)
    LayoutMaintenance.commitAppend(spark, tbl.getPath, Seq(
      ManifestEntrySpec(status = 1, content = 0,
        filePath = f.getAbsolutePath, recordCount = n,
        sizeBytes = f.length())))
    def structState(): Set[(Long, Long, String)] =
      MorRead.readTable(spark, tbl.getPath)
        .selectExpr("k", "m._1", "m._2").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val pre = structState()
    // ORC rewrite of a struct table (Spark's ORC writer handles nesting)
    setFormat(tbl, "orc")
    LayoutMaintenance.rewriteDataFiles(spark, tbl.getPath, Nil,
      sortCols = Seq("k"))
    assert(dataEntries(tbl).forall(e => e._1.endsWith(".orc") &&
      e._2 == "ORC"))
    assert(structState() == pre, "ORC rewrite must preserve struct rows")
    // COW delete: survivors rewrite as nested ORC
    LayoutMaintenance.commitDeleteWhereCow(spark, tbl.getPath,
      col("k") >= 40L)
    assert(structState() == pre.filter(_._1 < 40L))
    // AVRO rewrite of the struct table (record-in-record container)
    setFormat(tbl, "avro")
    LayoutMaintenance.rewriteDataFiles(spark, tbl.getPath, Nil,
      sortCols = Seq("k"))
    assert(dataEntries(tbl).forall(e => e._1.endsWith(".avro") &&
      e._2 == "AVRO"))
    assert(structState() == pre.filter(_._1 < 40L),
      "AVRO rewrite must preserve struct rows")
  }

  test("an unset property keeps every maintenance output parquet (compat)") {
    import spark.implicits._
    val tbl = new java.io.File("target/tmp-mfmt-default")
    org.apache.commons.io.FileUtils.deleteQuietly(tbl)
    val dataDir = new java.io.File(tbl, "data"); dataDir.mkdirs()
    val f = new java.io.File(dataDir, "f0.parquet")
    val n = IcebergLayoutWriter.writeSingleParquet(
      (0L until 100L).map(k => (k, k % 7)).toDF("k", "b"), f)
    LayoutMaintenance.commitAppend(spark, tbl.getPath, Seq(
      ManifestEntrySpec(status = 1, content = 0,
        filePath = f.getAbsolutePath, recordCount = n,
        sizeBytes = f.length())))
    LayoutMaintenance.commitUpsert(spark, tbl.getPath,
      Seq((3L, 9L)).toDF("k", "b"), Seq("k"))
    LayoutMaintenance.rewriteDataFiles(spark, tbl.getPath, Seq("k"))
    val entries = dataEntries(tbl)
    assert(entries.forall(e => e._1.endsWith(".parquet") &&
      e._2 == "PARQUET"), s"default must remain parquet: $entries")
  }
}
