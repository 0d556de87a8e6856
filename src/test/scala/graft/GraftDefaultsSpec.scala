package graft

import org.scalatest.funsuite.AnyFunSuite

/** Iceberg v3 "Default values" on the catalog: ADD COLUMN … DEFAULT is
  * metadata-only — rows in files that PREDATE the column read the
  * INITIAL default (per-file fill in the connector reader, never NULL,
  * never a rewrite), INSERTs that omit the column get the CURRENT
  * default (Spark's analyzer fill via SUPPORT_COLUMN_DEFAULT_VALUE),
  * and SET DEFAULT moves only the current default — history keeps its
  * meaning. */
class GraftDefaultsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSpec.spark
    val wh = new java.io.File("target/tmp-defaults-wh")
    org.apache.commons.io.FileUtils.deleteQuietly(wh)
    s.conf.set("spark.sql.catalog.dflt",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.dflt.warehouse", wh.getAbsolutePath)
    s.sql("CREATE NAMESPACE IF NOT EXISTS dflt.db")
    s
  }

  test("ADD COLUMN DEFAULT: old files read the initial default, new INSERTs fill the current") {
    spark.sql("DROP TABLE IF EXISTS dflt.db.t")
    spark.sql("CREATE TABLE dflt.db.t (k BIGINT, v STRING) USING `graft-iceberg`")
    spark.sql("INSERT INTO dflt.db.t VALUES (1, 'a'), (2, 'b')")
    val filesBefore = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, "target/tmp-defaults-wh/db/t", "t", Nil)
      .filter(org.apache.spark.sql.functions.col("content") === 0)
      .select("file_path").collect().map(_.getString(0)).toSet
    spark.sql("ALTER TABLE dflt.db.t ADD COLUMN score BIGINT DEFAULT 7")
    // metadata-only: no file rewritten
    val filesAfter = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, "target/tmp-defaults-wh/db/t", "t", Nil)
      .filter(org.apache.spark.sql.functions.col("content") === 0)
      .select("file_path").collect().map(_.getString(0)).toSet
    assert(filesAfter == filesBefore, "ADD COLUMN DEFAULT must not rewrite")
    // pre-evolution rows read the INITIAL default, not NULL
    val old = spark.sql("SELECT k, score FROM dflt.db.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(old == Seq((1L, 7L), (2L, 7L)), s"initial default must fill, got $old")
    // INSERT omitting the column: Spark fills the CURRENT default
    spark.sql("INSERT INTO dflt.db.t (k, v) VALUES (3, 'c')")
    // explicit DEFAULT keyword too
    spark.sql("INSERT INTO dflt.db.t VALUES (4, 'd', DEFAULT)")
    // explicit value wins
    spark.sql("INSERT INTO dflt.db.t VALUES (5, 'e', 99)")
    val all = spark.sql("SELECT k, score FROM dflt.db.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(all == Seq((1L, 7L), (2L, 7L), (3L, 7L), (4L, 7L), (5L, 99L)),
      s"got $all")
  }

  test("SET DEFAULT moves only the CURRENT default; initial stays for old files") {
    spark.sql("DROP TABLE IF EXISTS dflt.db.m")
    spark.sql("CREATE TABLE dflt.db.m (k BIGINT) USING `graft-iceberg`")
    spark.sql("INSERT INTO dflt.db.m VALUES (1)")
    spark.sql("ALTER TABLE dflt.db.m ADD COLUMN tag STRING DEFAULT 'blue'")
    spark.sql("ALTER TABLE dflt.db.m ALTER COLUMN tag SET DEFAULT 'green'")
    spark.sql("INSERT INTO dflt.db.m (k) VALUES (2)")
    val out = spark.sql("SELECT k, tag FROM dflt.db.m ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "blue"), (2L, "green")),
      s"initial default must survive SET DEFAULT, got $out")
  }

  test("CREATE TABLE with DEFAULT: omitted columns fill from birth") {
    spark.sql("DROP TABLE IF EXISTS dflt.db.c")
    spark.sql("CREATE TABLE dflt.db.c (k BIGINT, src STRING DEFAULT 'web') " +
      "USING `graft-iceberg`")
    spark.sql("INSERT INTO dflt.db.c (k) VALUES (1)")
    spark.sql("INSERT INTO dflt.db.c VALUES (2, 'app')")
    val out = spark.sql("SELECT k, src FROM dflt.db.c ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "web"), (2L, "app")), s"got $out")
  }

  test("DML on a default-carrying table stays exact (row-level path serves defaults)") {
    spark.sql("DROP TABLE IF EXISTS dflt.db.d")
    spark.sql("CREATE TABLE dflt.db.d (k BIGINT, v STRING) USING `graft-iceberg`")
    spark.sql("INSERT INTO dflt.db.d VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("ALTER TABLE dflt.db.d ADD COLUMN score BIGINT DEFAULT 5")
    spark.sql("INSERT INTO dflt.db.d VALUES (4, 'd', 50)")
    // DELETE whose predicate READS the defaulted column on pre-evolution
    // rows: must match score=5 rows (the default), not treat them null
    spark.sql("DELETE FROM dflt.db.d WHERE score = 5 AND k <= 2")
    val out = spark.sql("SELECT k, score FROM dflt.db.d ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((3L, 5L), (4L, 50L)),
      s"default-aware DELETE must kill k=1,2, got $out")
    // UPDATE through the default too
    spark.sql("UPDATE dflt.db.d SET score = score + 1 WHERE score = 5")
    val out2 = spark.sql("SELECT k, score FROM dflt.db.d ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out2 == Seq((3L, 6L), (4L, 50L)), s"got $out2")
  }
}
