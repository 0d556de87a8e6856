package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** `write.format.default` — Iceberg's table property for the DATA file
  * format — honored by the connector's SQL write paths: INSERT lands
  * ORC/AVRO task files with correctly-stamped manifest `file_format`,
  * the connector scan reads them back (tombstones, metadata columns,
  * evolution semantics intact), and MOR DML composes on top. A table
  * can accrete a MIXED-format file set purely via SQL. */
class WriteFormatSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSpec.spark
    val wh = new java.io.File("target/tmp-wfmt-wh")
    org.apache.commons.io.FileUtils.deleteQuietly(wh)
    s.conf.set("spark.sql.catalog.wfmt",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.wfmt.warehouse", wh.getAbsolutePath)
    s.sql("CREATE NAMESPACE IF NOT EXISTS wfmt.db")
    s
  }

  private def formats(dir: String): Map[String, String] =
    graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, dir, "t", Nil)
      .filter(col("content") === 0)
      .select("file_path", "file_format").collect()
      .map(r => (r.getString(0).split('/').last, r.getString(1))).toMap

  test("write.format.default=orc: SQL INSERT writes ORC; scan + MOR DELETE read it back") {
    spark.sql("CREATE TABLE wfmt.db.orct (k BIGINT, v STRING) " +
      "USING `graft-iceberg` TBLPROPERTIES (" +
      "'write.format.default' = 'orc', " +
      "'write.delete.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO wfmt.db.orct SELECT /*+ COALESCE(1) */ * " +
      "FROM VALUES (1L,'a'),(2L,'b'),(3L,'c') AS t(k, v)")
    val dir = "target/tmp-wfmt-wh/db/orct"
    val fmts = formats(dir)
    assert(fmts.nonEmpty && fmts.values.forall(_ == "ORC"), fmts.toString)
    assert(fmts.keys.forall(_.endsWith(".orc")), fmts.toString)
    // connector scan reads ORC with metadata columns
    val rows = spark.sql(
      "SELECT k, v, _pos FROM wfmt.db.orct ORDER BY k").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      == Seq((1L, "a", 0L), (2L, "b", 1L), (3L, "c", 2L)))
    // MOR DELETE: a parquet position tombstone over an ORC data file,
    // applied by the ORC row reader
    spark.sql("DELETE FROM wfmt.db.orct WHERE k = 2")
    assert(spark.sql("SELECT k FROM wfmt.db.orct ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // survivors keep their physical ordinals (true MOR, no rewrite)
    assert(spark.sql("SELECT _pos FROM wfmt.db.orct WHERE k = 3")
      .head.getLong(0) == 2L)
  }

  test("write.format.default=avro: SQL INSERT + MOR UPDATE round-trip") {
    spark.sql("CREATE TABLE wfmt.db.avt (k BIGINT, v STRING, amt BIGINT) " +
      "USING `graft-iceberg` TBLPROPERTIES (" +
      "'write.format.default' = 'avro', " +
      "'write.update.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO wfmt.db.avt SELECT /*+ COALESCE(1) */ * " +
      "FROM VALUES (1L,'a',10L),(2L,'b',20L) AS t(k, v, amt)")
    val fmts = formats("target/tmp-wfmt-wh/db/avt")
    assert(fmts.values.toSet == Set("AVRO"), fmts.toString)
    // MOR UPDATE: tombstone kills the avro row's ordinal; the INSERTED
    // replacement row honors the avro default too
    spark.sql("UPDATE wfmt.db.avt SET amt = 99 WHERE k = 2")
    val after = formats("target/tmp-wfmt-wh/db/avt")
    assert(after.values.toSet == Set("AVRO"), after.toString)
    assert(spark.sql("SELECT k, amt FROM wfmt.db.avt ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 10L), (2L, 99L)))
  }

  test("a table accretes MIXED formats purely via SQL; one scan reads all three") {
    spark.sql("CREATE TABLE wfmt.db.mixed (k BIGINT, v STRING) " +
      "USING `graft-iceberg`")
    spark.sql("INSERT INTO wfmt.db.mixed SELECT /*+ COALESCE(1) */ * " +
      "FROM VALUES (1L,'p') AS t(k, v)")
    spark.sql("ALTER TABLE wfmt.db.mixed " +
      "SET TBLPROPERTIES ('write.format.default' = 'orc')")
    spark.sql("INSERT INTO wfmt.db.mixed SELECT /*+ COALESCE(1) */ * " +
      "FROM VALUES (2L,'o') AS t(k, v)")
    spark.sql("ALTER TABLE wfmt.db.mixed " +
      "SET TBLPROPERTIES ('write.format.default' = 'avro')")
    spark.sql("INSERT INTO wfmt.db.mixed SELECT /*+ COALESCE(1) */ * " +
      "FROM VALUES (3L,'a') AS t(k, v)")
    val fmts = formats("target/tmp-wfmt-wh/db/mixed")
    assert(fmts.values.toSet == Set("PARQUET", "ORC", "AVRO"), fmts.toString)
    assert(spark.sql("SELECT k, v FROM wfmt.db.mixed ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "p"), (2L, "o"), (3L, "a")))
    // filters + projections work across the format mix
    assert(spark.sql(
      "SELECT count(*) FROM wfmt.db.mixed WHERE v IN ('o','a')")
      .head.getLong(0) == 2L)
  }

  test("schema evolution reads through ORC files: ADD COLUMN null-fills, RENAME aliases") {
    spark.sql("CREATE TABLE wfmt.db.evo (k BIGINT, v STRING) " +
      "USING `graft-iceberg` TBLPROPERTIES (" +
      "'write.format.default' = 'orc')")
    spark.sql("INSERT INTO wfmt.db.evo VALUES (1, 'x')")
    spark.sql("ALTER TABLE wfmt.db.evo ADD COLUMN extra BIGINT")
    spark.sql("ALTER TABLE wfmt.db.evo RENAME COLUMN v TO label")
    val r = spark.sql("SELECT k, label, extra FROM wfmt.db.evo").head
    assert(r.getLong(0) == 1L)
    assert(r.getString(1) == "x") // pre-rename ORC file, alias-resolved
    assert(r.isNullAt(2)) // pre-evolution file null-fills
  }

  test("struct columns write to ORC: round-trip, MOR DELETE, leaf rename") {
    spark.sql("CREATE TABLE wfmt.db.sorc " +
      "(k BIGINT, m STRUCT<w: BIGINT, label: STRING>) USING `graft-iceberg` " +
      "TBLPROPERTIES ('write.format.default' = 'orc', " +
      "'write.delete.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO wfmt.db.sorc SELECT /*+ COALESCE(1) */ * " +
      "FROM VALUES (1L, named_struct('w', 10L, 'label', 'a'))," +
      "(2L, named_struct('w', 20L, 'label', 'b'))," +
      "(3L, named_struct('w', 30L, 'label', 'c')) AS t(k, m)")
    val fmts = formats("target/tmp-wfmt-wh/db/sorc")
    assert(fmts.nonEmpty && fmts.values.forall(_ == "ORC"), fmts.toString)
    assert(spark.sql("SELECT m.w FROM wfmt.db.sorc ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(10L, 20L, 30L))
    // MOR DELETE: parquet tombstone over the nested ORC file
    spark.sql("DELETE FROM wfmt.db.sorc WHERE k = 2")
    assert(spark.sql("SELECT k, m.label FROM wfmt.db.sorc ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "a"), (3L, "c")))
    // leaf RENAME: the pre-rename ORC file resolves through the alias
    spark.sql("ALTER TABLE wfmt.db.sorc RENAME COLUMN m.w TO width")
    assert(spark.sql("SELECT sum(m.width) FROM wfmt.db.sorc")
      .head.getLong(0) == 40L)
  }

  test("struct columns write to AVRO and read back with MOR") {
    spark.sql("CREATE TABLE wfmt.db.savt " +
      "(k BIGINT, m STRUCT<w: BIGINT, label: STRING>) USING `graft-iceberg` " +
      "TBLPROPERTIES ('write.format.default' = 'avro', " +
      "'write.delete.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO wfmt.db.savt SELECT /*+ COALESCE(1) */ * " +
      "FROM VALUES (1L, named_struct('w', 10L, 'label', 'a'))," +
      "(2L, named_struct('w', 20L, 'label', 'b'))," +
      "(3L, CAST(null AS STRUCT<w: BIGINT, label: STRING>)) AS t(k, m)")
    val fmts = formats("target/tmp-wfmt-wh/db/savt")
    assert(fmts.nonEmpty && fmts.values.forall(_ == "AVRO"), fmts.toString)
    val rows = spark.sql(
      "SELECT k, m.w, m.label FROM wfmt.db.savt ORDER BY k").collect()
    assert(rows.map(r => (r.getLong(0),
      if (r.isNullAt(1)) -1L else r.getLong(1),
      if (r.isNullAt(2)) "-" else r.getString(2))).toSeq
      == Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, -1L, "-")))
    spark.sql("DELETE FROM wfmt.db.savt WHERE k = 1")
    assert(spark.sql("SELECT sum(m.w) FROM wfmt.db.savt")
      .head.getLong(0) == 20L)
  }

  test("array columns ride non-parquet defaults (round 13: ORC lists)") {
    spark.sql("CREATE TABLE wfmt.db.okarr " +
      "(k BIGINT, e ARRAY<BIGINT>) USING `graft-iceberg` " +
      "TBLPROPERTIES ('write.format.default' = 'orc')")
    spark.sql("INSERT INTO wfmt.db.okarr VALUES (1, array(2L, 3L))")
    val r = spark.sql("SELECT k, e FROM wfmt.db.okarr").head
    assert(r.getLong(0) == 1L && r.getSeq[Long](1) == Seq(2L, 3L))
    val fmts = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, "target/tmp-wfmt-wh/db/okarr", "t", Nil)
      .filter(org.apache.spark.sql.functions.col("content") === 0)
      .select("file_format").collect().map(_.getString(0)).toSet
    assert(fmts == Set("ORC"), fmts.toString)
  }
}
