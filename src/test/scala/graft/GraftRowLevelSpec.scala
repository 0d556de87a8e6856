package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL row-level operations through the connector's group-based
  * copy-on-write path (SupportsRowLevelOperations): UPDATE, MERGE INTO,
  * and non-pushable DELETE, with runtime group filtering asserted by
  * checking which physical files survive a commit untouched. */
class GraftRowLevelSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSpec.spark
    val wh = new java.io.File("target/tmp-rowlevel-wh")
    org.apache.commons.io.FileUtils.deleteQuietly(wh)
    s.conf.set("spark.sql.catalog.rlo",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.rlo.warehouse", wh.getAbsolutePath)
    s.sql("CREATE NAMESPACE IF NOT EXISTS rlo.db")
    s
  }

  private def freshTable(name: String): String = {
    spark.sql(s"DROP TABLE IF EXISTS rlo.db.$name")
    spark.sql(s"CREATE TABLE rlo.db.$name (k BIGINT, v STRING, amt BIGINT) " +
      "USING `graft-iceberg`")
    // two INSERTs -> two snapshots -> (at least) two distinct data files,
    // so group filtering has something to skip
    spark.sql(s"INSERT INTO rlo.db.$name VALUES (1,'a',10),(2,'b',20)")
    spark.sql(s"INSERT INTO rlo.db.$name VALUES (3,'c',30),(4,'d',40)")
    s"target/tmp-rowlevel-wh/db/$name"
  }

  private def dataFilesOf(dir: String): Set[String] =
    graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, dir, "t", Nil)
      .filter(org.apache.spark.sql.functions.col("content") === 0)
      .select("file_path").collect().map(_.getString(0)).toSet

  test("SQL UPDATE rewrites only the matched group (runtime group filtering)") {
    val dir = freshTable("upd")
    val before = dataFilesOf(dir)
    assert(before.size >= 2) // parallel VALUES inserts: >=2 data files
    spark.sql("UPDATE rlo.db.upd SET amt = amt + 5, v = concat(v, '!') WHERE k = 2")
    val got = spark.sql("SELECT k, v, amt FROM rlo.db.upd ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "a", 10L), (2L, "b!", 25L),
      (3L, "c", 30L), (4L, "d", 40L)))
    // k=2 lives in exactly one file; every OTHER file must survive the
    // commit untouched — that's the runtime group filter at work (a
    // filterless COW would rewrite all of them)
    val after = dataFilesOf(dir)
    val untouched = before.intersect(after)
    assert(untouched.size == before.size - 1,
      s"expected ${before.size - 1} untouched files, got $untouched")
  }

  test("SQL MERGE INTO: matched update + not-matched insert, one snapshot") {
    val dir = freshTable("mrg")
    val snapsBefore = graft.sources.LayoutMaintenance
      .snapshotIds(spark, dir).size
    spark.range(1).createOrReplaceTempView("dummy")
    spark.sql(
      """MERGE INTO rlo.db.mrg t
        |USING (SELECT * FROM VALUES (2, 'B', 200L), (9, 'Z', 900L) AS s(k, v, amt)) s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET t.v = s.v, t.amt = s.amt
        |WHEN NOT MATCHED THEN INSERT (k, v, amt) VALUES (s.k, s.v, s.amt)
        |""".stripMargin)
    val got = spark.sql("SELECT k, v, amt FROM rlo.db.mrg ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "a", 10L), (2L, "B", 200L), (3L, "c", 30L),
      (4L, "d", 40L), (9L, "Z", 900L)))
    val snapsAfter = graft.sources.LayoutMaintenance
      .snapshotIds(spark, dir).size
    assert(snapsAfter == snapsBefore + 1, "MERGE must land as ONE snapshot")
  }

  test("MERGE with DELETE clause removes matched rows") {
    freshTable("mrgdel")
    spark.sql(
      """MERGE INTO rlo.db.mrgdel t
        |USING (SELECT * FROM VALUES (1L), (3L) AS s(k)) s
        |ON t.k = s.k
        |WHEN MATCHED THEN DELETE
        |""".stripMargin)
    assert(spark.sql("SELECT k FROM rlo.db.mrgdel ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(2L, 4L))
  }

  test("non-pushable DELETE falls back to the row-level rewrite and is exact") {
    freshTable("delmod")
    // k % 2 = 0 is not in the v1 filter algebra -> not metadata-pushable;
    // without SupportsRowLevelOperations this statement would fail
    spark.sql("DELETE FROM rlo.db.delmod WHERE k % 2 = 0")
    assert(spark.sql("SELECT k FROM rlo.db.delmod ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("pushable DELETE still takes the metadata path (no COW rewrite files)") {
    val dir = freshTable("delpush")
    spark.sql("DELETE FROM rlo.db.delpush WHERE k = 3")
    assert(spark.sql("SELECT k FROM rlo.db.delpush ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    // the metadata path writes cowdel-*, the row-level path cow-* files;
    // a pushable condition must use the former
    assert(!dataFilesOf(dir).exists(p => p.contains("/cow-")),
      "pushable DELETE must not route through the row-level rewrite")
  }

  test("partition-aligned DELETE is METADATA-ONLY: files drop, nothing is written") {
    spark.sql("DROP TABLE IF EXISTS rlo.db.pdrop")
    spark.sql("CREATE TABLE rlo.db.pdrop (mon BIGINT, v BIGINT) " +
      "USING `graft-iceberg` PARTITIONED BY (mon) " +
      "TBLPROPERTIES ('pushdown.fields'='mon:1:long')")
    spark.sql("INSERT INTO rlo.db.pdrop " +
      "SELECT id % 4 AS mon, id AS v FROM range(0, 400)")
    val dir = "target/tmp-rowlevel-wh/db/pdrop"
    val before = dataFilesOf(dir)
    assert(before.size == 4, s"one file per mon expected: $before")
    // the retention shape: every row of the mon<2 files matches, every
    // other file provably matches nothing -> one snapshot swap, ZERO
    // data I/O (no cowdel-*, no cow-*, no new files of any kind)
    spark.sql("DELETE FROM rlo.db.pdrop WHERE mon < 2")
    val after = dataFilesOf(dir)
    assert(after.subsetOf(before), s"metadata-only delete wrote files: " +
      s"${after -- before}")
    assert(after.size == 2)
    assert(spark.sql("SELECT count(*), min(mon) FROM rlo.db.pdrop")
      .head match { case r => r.getLong(0) == 200L && r.getLong(1) == 2L })
    // a NON-aligned predicate on the same table must fall back to the
    // copy-on-write rewrite and stay exact
    spark.sql("DELETE FROM rlo.db.pdrop WHERE v < 250")
    assert(spark.sql("SELECT count(*) FROM rlo.db.pdrop").head.getLong(0)
      == (250L until 400L).count(v => v % 4 >= 2))
    // and a predicate matching nothing commits nothing
    val snaps = graft.sources.LayoutMaintenance
      .snapshotIds(spark, dir).size
    spark.sql("DELETE FROM rlo.db.pdrop WHERE mon > 100")
    assert(graft.sources.LayoutMaintenance.snapshotIds(spark, dir).size
      == snaps, "a no-match DELETE must not commit a snapshot")
  }

  test("_file metadata column is selectable and names real files") {
    val dir = freshTable("meta")
    val files = spark.sql("SELECT DISTINCT _file FROM rlo.db.meta")
      .collect().map(_.getString(0)).toSet
    assert(files == dataFilesOf(dir))
    // and the per-row provenance is consistent with per-file row counts
    val perFile = spark.sql("SELECT _file, count(*) AS n FROM rlo.db.meta GROUP BY _file")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(perFile.values.sum == 4L)
  }

  test("group-replace commit rejects a stale scanned-file set (OCC conflict)") {
    val dir = freshTable("occ")
    val victim = dataFilesOf(dir).head
    // a concurrent commit replaces `victim` first
    graft.sources.LayoutMaintenance.commitReplaceFiles(
      spark, dir, Seq(victim), Nil)
    // the straggler tries to swap the SAME file out: must fail loudly,
    // never resurrect/duplicate its rows
    val e = intercept[IllegalArgumentException] {
      graft.sources.LayoutMaintenance.commitReplaceFiles(
        spark, dir, Seq(victim), Nil)
    }
    assert(e.getMessage.contains("concurrent commit conflict"))
  }

  test("write.delete.mode=merge-on-read: DELETE commits tombstones, carries files, matches COW truth") {
    val morDir = freshTable("mordel")
    spark.sql("ALTER TABLE rlo.db.mordel " +
      "SET TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    val cowDir = freshTable("cowdel")
    val before = dataFilesOf(morDir)
    spark.sql("DELETE FROM rlo.db.mordel WHERE amt >= 30")
    spark.sql("DELETE FROM rlo.db.cowdel WHERE amt >= 30")
    // MOR: every data file carried verbatim + a content=1 tombstone
    assert(dataFilesOf(morDir) == before,
      "merge-on-read DELETE must not rewrite data files")
    val tombs = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, morDir, "t", Nil)
      .filter(org.apache.spark.sql.functions.col("content") === 1)
      .count()
    assert(tombs == 1L, s"one tombstone file expected, got $tombs")
    // both modes read the same truth through plain SQL
    val mor = spark.sql("SELECT k, v, amt FROM rlo.db.mordel ORDER BY k")
      .collect().map(_.toSeq).toSeq
    val cow = spark.sql("SELECT k, v, amt FROM rlo.db.cowdel ORDER BY k")
      .collect().map(_.toSeq).toSeq
    assert(mor == cow && mor.map(_.head) == Seq(1L, 2L))
    // dv dialect: second delete commits a PUFFIN entry
    spark.sql("ALTER TABLE rlo.db.mordel " +
      "SET TBLPROPERTIES ('write.delete.format' = 'dv')")
    spark.sql("DELETE FROM rlo.db.mordel WHERE k = 1")
    val fmts = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, morDir, "t", Nil)
      .filter(org.apache.spark.sql.functions.col("content") === 1)
      .select("file_format").collect().map(_.getString(0)).sorted.toSeq
    assert(fmts == Seq("PARQUET", "PUFFIN"), s"got $fmts")
    assert(spark.sql("SELECT k FROM rlo.db.mordel").collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("UPDATE on an empty match set leaves the table unchanged") {
    val dir = freshTable("noop")
    val before = dataFilesOf(dir)
    spark.sql("UPDATE rlo.db.noop SET amt = 0 WHERE k = 999")
    assert(dataFilesOf(dir) == before)
    assert(spark.sql("SELECT sum(amt) FROM rlo.db.noop").head.getLong(0) == 100L)
  }
}
