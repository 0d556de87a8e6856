package graft

import org.scalatest.funsuite.AnyFunSuite

/** `format-version` fidelity (Iceberg spec per-version feature gates):
  * the stamped version must ADMIT the constructs the layout carries —
  * row lineage, deletion vectors, and VARIANT are v3-only. Tables
  * default to auto-raise (stamp 3 the moment a v3 construct lands); an
  * EXPLICIT format-version=2 pins the table to v2 semantics (no
  * lineage, v3 features refuse) until the one-way ALTER upgrade. */
class FormatVersionSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSpec.spark
    val wh = new java.io.File("target/tmp-fv-wh")
    org.apache.commons.io.FileUtils.deleteQuietly(wh)
    s.conf.set("spark.sql.catalog.fv",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.fv.warehouse", wh.getAbsolutePath)
    s.sql("CREATE NAMESPACE IF NOT EXISTS fv.db")
    s
  }
  private def tdir(name: String) = s"target/tmp-fv-wh/db/$name"
  private def stamped(name: String): Int =
    graft.sources.LayoutMaintenance.tableFormatVersion(spark, tdir(name))
  private def metaDoc(name: String): com.fasterxml.jackson.databind.JsonNode = {
    val m = new java.io.File(tdir(name), "metadata")
    val hint = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(m, "version-hint.text").toPath), "UTF-8").trim
    new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new java.io.File(m, s"v$hint.metadata.json"))
  }

  test("default tables stamp 3: row lineage is a v3 construct") {
    spark.sql("CREATE TABLE fv.db.auto (k BIGINT, v BIGINT) " +
      "USING `graft-iceberg`")
    spark.sql("INSERT INTO fv.db.auto SELECT /*+ COALESCE(1) */ * FROM " +
      "VALUES (1L, 10L), (2L, 20L) AS t(k, v)")
    assert(stamped("auto") == 3, s"lineage-assigning layout: ${stamped("auto")}")
    assert(metaDoc("auto").has("next-row-id"), "v3 counter present")
    // and _row_id really serves
    val ids = spark.sql("SELECT _row_id FROM fv.db.auto ORDER BY _row_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(0L, 1L), ids.toString)
  }

  test("explicit v2: no lineage, stamp stays 2 across commits") {
    spark.sql("CREATE TABLE fv.db.v2t (k BIGINT, v BIGINT) " +
      "USING `graft-iceberg` TBLPROPERTIES ('format-version' = '2')")
    spark.sql("INSERT INTO fv.db.v2t SELECT /*+ COALESCE(1) */ * FROM " +
      "VALUES (1L, 10L), (2L, 20L) AS t(k, v)")
    spark.sql("INSERT INTO fv.db.v2t SELECT /*+ COALESCE(1) */ * FROM " +
      "VALUES (3L, 30L) AS t(k, v)")
    assert(stamped("v2t") == 2, s"explicit v2: ${stamped("v2t")}")
    assert(!metaDoc("v2t").has("next-row-id"), "no v3 counter on a v2 table")
    // _row_id reads null (the v2 contract: lineage does not exist)
    val ids = spark.sql("SELECT _row_id FROM fv.db.v2t").collect()
    assert(ids.forall(_.isNullAt(0)), "v2 rows carry no lineage")
  }

  test("explicit v2 refuses VARIANT at CREATE and ADD COLUMN") {
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE fv.db.v2var (k BIGINT, doc VARIANT) " +
        "USING `graft-iceberg` TBLPROPERTIES ('format-version' = '2')")
    }
    assert(e.getMessage.contains("format-version"), e.getMessage)
    spark.sql("CREATE TABLE fv.db.v2add (k BIGINT) " +
      "USING `graft-iceberg` TBLPROPERTIES ('format-version' = '2')")
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE fv.db.v2add ADD COLUMN doc VARIANT")
    }
    assert(e2.getMessage.contains("format-version"), e2.getMessage)
  }

  test("explicit v2 refuses deletion vectors; upgrade unlocks them") {
    spark.sql("CREATE TABLE fv.db.v2dv (k BIGINT, v BIGINT) " +
      "USING `graft-iceberg` TBLPROPERTIES ('format-version' = '2', " +
      "'write.delete.mode' = 'merge-on-read', " +
      "'write.delete.format' = 'dv')")
    spark.sql("INSERT INTO fv.db.v2dv SELECT /*+ COALESCE(1) */ * FROM " +
      "VALUES (1L, 10L), (2L, 20L), (3L, 30L) AS t(k, v)")
    val e = intercept[Exception] {
      spark.sql("DELETE FROM fv.db.v2dv WHERE k = 2")
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("format-version") ||
        Option(e.getCause).exists(_.getMessage.contains("format-version"))),
      s"dv on v2 must refuse: ${e.getMessage}")
    // the spec's v2 -> v3 upgrade: ONE metadata-only commit
    val hintBefore = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(tdir("v2dv"), "metadata/version-hint.text").toPath),
      "UTF-8").trim.toLong
    val snapsBefore = graft.sources.LayoutMaintenance
      .snapshotIds(spark, tdir("v2dv")).size
    spark.sql("ALTER TABLE fv.db.v2dv SET TBLPROPERTIES " +
      "('format-version' = '3')")
    val hintAfter = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(tdir("v2dv"), "metadata/version-hint.text").toPath),
      "UTF-8").trim.toLong
    assert(stamped("v2dv") == 3, "upgrade stamps 3 immediately")
    assert(hintAfter == hintBefore + 1, "exactly one metadata commit")
    assert(graft.sources.LayoutMaintenance
      .snapshotIds(spark, tdir("v2dv")).size == snapsBefore,
      "metadata-only: no new snapshot")
    // and deletion vectors now work end-to-end
    spark.sql("DELETE FROM fv.db.v2dv WHERE k = 2")
    assert(spark.sql("SELECT k FROM fv.db.v2dv ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 3L))
    val delFmts = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, tdir("v2dv"), "t", Nil)
      .filter(org.apache.spark.sql.functions.col("content") === 1)
      .select("file_format").collect().map(_.getString(0)).toSet
    assert(delFmts == Set("PUFFIN"), delFmts.toString)
  }

  test("downgrade 3 -> 2 refuses (the upgrade is one-way)") {
    spark.sql("CREATE TABLE fv.db.down (k BIGINT) USING `graft-iceberg`")
    spark.sql("INSERT INTO fv.db.down VALUES (1L)")
    assert(stamped("down") == 3)
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE fv.db.down SET TBLPROPERTIES " +
        "('format-version' = '2')")
    }
    assert(e.getMessage.contains("downgrade"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE fv.db.down SET TBLPROPERTIES " +
        "('format-version' = '7')")
    }
    assert(e2.getMessage.contains("format-version"), e2.getMessage)
  }

  test("v3-declared tables default position deletes to deletion vectors") {
    def delFmts(name: String): Set[String] =
      graft.sources.IcebergManifestSource
        .statsFromTableDir(spark, tdir(name), "t", Nil)
        .filter(org.apache.spark.sql.functions.col("content") === 1)
        .select("file_format").collect().map(_.getString(0)).toSet
    // declared v3 + merge-on-read, NO delete-format property -> DVs
    spark.sql("CREATE TABLE fv.db.dv3 (k BIGINT, v BIGINT) " +
      "USING `graft-iceberg` TBLPROPERTIES ('format-version' = '3', " +
      "'write.delete.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO fv.db.dv3 SELECT /*+ COALESCE(1) */ id, id * 10 " +
      "FROM range(0, 20)")
    spark.sql("INSERT INTO fv.db.dv3 SELECT /*+ COALESCE(1) */ id, id * 10 " +
      "FROM range(20, 40)")
    spark.sql("DELETE FROM fv.db.dv3 WHERE k % 10 = 3")
    assert(delFmts("dv3") == Set("PUFFIN"), delFmts("dv3").toString)
    assert(spark.sql("SELECT count(*) FROM fv.db.dv3").head.getLong(0)
      == 36L)
    // a second delete, then the fold: rewrite_position_deletes on a v3
    // table consolidates into ONE puffin (never a new tombstone FILE)
    spark.sql("DELETE FROM fv.db.dv3 WHERE k % 10 = 7")
    val (_, before, after, nPairs) = graft.sources.LayoutMaintenance
      .rewritePositionDeletes(spark, tdir("dv3"))
    // successive DELETEs already fold per-target (the one-DV-per-file
    // invariant), so `before` may be 1 — the fold must still emit DV
    assert(before >= 1 && after == 1 && nPairs == 8L,
      s"fold: $before -> $after, $nPairs pairs")
    assert(delFmts("dv3") == Set("PUFFIN"),
      s"the v3 fold must stay DV: ${delFmts("dv3")}")
    assert(spark.sql("SELECT count(*) FROM fv.db.dv3").head.getLong(0)
      == 32L)
    // an explicit tombstone FILE format wins over the v3 default
    spark.sql("CREATE TABLE fv.db.dv3f (k BIGINT) USING `graft-iceberg` " +
      "TBLPROPERTIES ('format-version' = '3', " +
      "'write.delete.mode' = 'merge-on-read', " +
      "'write.delete.format.default' = 'parquet')")
    spark.sql("INSERT INTO fv.db.dv3f SELECT /*+ COALESCE(1) */ id " +
      "FROM range(0, 10)")
    spark.sql("DELETE FROM fv.db.dv3f WHERE k % 2 = 1")
    assert(delFmts("dv3f") == Set("PARQUET"), delFmts("dv3f").toString)
    // version-unset tables keep the dialect's file-tombstone default
    spark.sql("CREATE TABLE fv.db.dvu (k BIGINT) USING `graft-iceberg` " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO fv.db.dvu SELECT /*+ COALESCE(1) */ id " +
      "FROM range(0, 10)")
    spark.sql("DELETE FROM fv.db.dvu WHERE k % 2 = 1")
    assert(delFmts("dvu") == Set("PARQUET"), delFmts("dvu").toString)
  }

  test("pre-lineage fixture layouts stamp 2 until a commit assigns lineage") {
    import spark.implicits._
    import graft.sources.{IcebergLayoutWriter, LayoutMaintenance}
    val tbl = new java.io.File("target/tmp-fv-prelineage")
    org.apache.commons.io.FileUtils.deleteQuietly(tbl)
    val dataDir = new java.io.File(tbl, "data"); dataDir.mkdirs()
    val f = new java.io.File(dataDir, "f0.parquet")
    val n = IcebergLayoutWriter.writeSingleParquet(
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), f)
    IcebergLayoutWriter.writeTable(tbl,
      Seq(IcebergLayoutWriter.ManifestEntrySpec(status = 1, content = 0,
        filePath = f.getAbsolutePath, recordCount = n,
        sizeBytes = f.length())),
      assignRowIds = false)
    assert(LayoutMaintenance.tableFormatVersion(spark, tbl.getPath) == 2,
      "pre-lineage layout says 2")
    // an append on the UNPINNED table assigns lineage -> the stamp
    // raises to 3 with the construct (implicit upgrade)
    val f1 = new java.io.File(dataDir, "f1.parquet")
    val n1 = IcebergLayoutWriter.writeSingleParquet(
      Seq((3L, 30L)).toDF("k", "v"), f1)
    LayoutMaintenance.commitAppend(spark, tbl.getPath,
      Seq(IcebergLayoutWriter.ManifestEntrySpec(status = 1, content = 0,
        filePath = f1.getAbsolutePath, recordCount = n1,
        sizeBytes = f1.length())))
    assert(LayoutMaintenance.tableFormatVersion(spark, tbl.getPath) == 3,
      "lineage-assigning commit raises the stamp")
  }
}
