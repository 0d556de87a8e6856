package graft

import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read row-level SQL (write.update/merge/delete.mode =
  * merge-on-read, Spark's SupportsDelta plan): UPDATE/MERGE/DELETE
  * commit position tombstones + data files — data files carried
  * VERBATIM, zero rewrites — and read back exactly what the COW twin
  * produces. */
class GraftMorDmlSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSpec.spark
    val wh = new java.io.File("target/tmp-mordml-wh")
    org.apache.commons.io.FileUtils.deleteQuietly(wh)
    s.conf.set("spark.sql.catalog.mdml",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.mdml.warehouse", wh.getAbsolutePath)
    s.sql("CREATE NAMESPACE IF NOT EXISTS mdml.db")
    s
  }

  private def fresh(name: String, mor: Boolean): String = {
    spark.sql(s"DROP TABLE IF EXISTS mdml.db.$name")
    val props = if (mor) " TBLPROPERTIES (" +
      "'write.update.mode' = 'merge-on-read', " +
      "'write.merge.mode' = 'merge-on-read', " +
      "'write.delete.mode' = 'merge-on-read')" else ""
    spark.sql(s"CREATE TABLE mdml.db.$name (k BIGINT, v STRING, amt BIGINT) " +
      s"USING `graft-iceberg`$props")
    // one file per INSERT (COALESCE hint): the _pos assertions below
    // need multi-row files
    spark.sql(s"INSERT INTO mdml.db.$name SELECT /*+ COALESCE(1) */ * " +
      "FROM VALUES (1L,'a',10L),(2L,'b',20L) AS t(k, v, amt)")
    spark.sql(s"INSERT INTO mdml.db.$name SELECT /*+ COALESCE(1) */ * " +
      "FROM VALUES (3L,'c',30L),(4L,'d',40L) AS t(k, v, amt)")
    s"target/tmp-mordml-wh/db/$name"
  }

  private def entryKinds(dir: String): (Set[String], Long) = {
    val rows = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, dir, "t", Nil)
      .select("file_path", "content").collect()
      .map(r => (r.getString(0), r.getInt(1)))
    (rows.filter(_._2 == 0).map(_._1).toSet, rows.count(_._2 == 1).toLong)
  }

  test("MOR UPDATE: tombstone + new data file, originals carried verbatim") {
    val dir = fresh("upd", mor = true)
    val (before, t0) = entryKinds(dir)
    assert(t0 == 0)
    spark.sql("UPDATE mdml.db.upd SET amt = amt + 100 WHERE k IN (2, 3)")
    val (after, tombs) = entryKinds(dir)
    assert(before.subsetOf(after),
      "MOR UPDATE must carry every original data file verbatim")
    assert(after.size > before.size, "delta inserts land as new files")
    assert(tombs >= 1, s"position-delete file(s) expected, got $tombs")
    val out = spark.sql("SELECT k, amt FROM mdml.db.upd ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 10L), (2L, 120L), (3L, 130L), (4L, 40L)))
  }

  test("MOR MERGE: matched update + not-matched insert, zero rewrites") {
    val dir = fresh("mrg", mor = true)
    val (before, _) = entryKinds(dir)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW mrg_src AS " +
      "SELECT * FROM VALUES (2, 'B', 200L), (9, 'I', 900L) AS s(k, v, amt)")
    spark.sql("""MERGE INTO mdml.db.mrg t USING mrg_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET t.v = s.v, t.amt = s.amt
      WHEN NOT MATCHED THEN INSERT (k, v, amt) VALUES (s.k, s.v, s.amt)""")
    val (after, tombs) = entryKinds(dir)
    assert(before.subsetOf(after), "originals carried")
    assert(tombs >= 1)
    val out = spark.sql("SELECT k, v, amt FROM mdml.db.mrg ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, "a", 10L), (2L, "B", 200L), (3L, "c", 30L),
      (4L, "d", 40L), (9L, "I", 900L)))
  }

  test("MOR MERGE WHEN MATCHED DELETE: tombstones only, no data file added") {
    val dir = fresh("mrgdel", mor = true)
    val (before, _) = entryKinds(dir)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW mrgdel_src AS " +
      "SELECT * FROM VALUES (1), (4) AS s(k)")
    spark.sql("""MERGE INTO mdml.db.mrgdel t USING mrgdel_src s ON t.k = s.k
      WHEN MATCHED THEN DELETE""")
    val (after, tombs) = entryKinds(dir)
    assert(after == before, "delete-only MERGE adds no data files")
    assert(tombs >= 1)
    assert(spark.sql("SELECT k FROM mdml.db.mrgdel ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(2L, 3L))
  }

  test("MOR result == COW result for the same UPDATE") {
    fresh("morside", mor = true); fresh("cowside", mor = false)
    spark.sql("UPDATE mdml.db.morside SET v = 'x' WHERE amt >= 20")
    spark.sql("UPDATE mdml.db.cowside SET v = 'x' WHERE amt >= 20")
    val a = spark.sql("SELECT k, v, amt FROM mdml.db.morside ORDER BY k")
      .collect().map(_.toSeq).toSeq
    val b = spark.sql("SELECT k, v, amt FROM mdml.db.cowside ORDER BY k")
      .collect().map(_.toSeq).toSeq
    assert(a == b)
    // the COW side rewrote (tombstone-free), the MOR side did not
    val cowTombs = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, "target/tmp-mordml-wh/db/cowside", "t", Nil)
      .filter(org.apache.spark.sql.functions.col("content") === 1).count()
    assert(cowTombs == 0)
  }

  test("_pos metadata column: physical ordinal, composes with _file") {
    fresh("posmeta", mor = true)
    val rows = spark.sql(
      "SELECT k, _file, _pos FROM mdml.db.posmeta ORDER BY _file, _pos")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // two files x two rows, ordinals 0 and 1 within each
    assert(rows.map(_._2).toSeq == Seq(0L, 1L, 0L, 1L))
    // after a MOR delete of the ordinal-0 rows, survivors keep their
    // PHYSICAL ordinals (1), proving _pos is file position not row number
    spark.sql("DELETE FROM mdml.db.posmeta WHERE k IN (1, 3)")
    val after = spark.sql("SELECT k, _pos FROM mdml.db.posmeta ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(after == Seq((2L, 1L), (4L, 1L)), s"got $after")
  }

  test("write.delete.format=dv: MOR UPDATE tombstones land as deletion vectors") {
    val dir = fresh("dvdml", mor = true)
    spark.sql("ALTER TABLE mdml.db.dvdml " +
      "SET TBLPROPERTIES ('write.delete.format' = 'dv')")
    spark.sql("UPDATE mdml.db.dvdml SET amt = amt * 10 WHERE k IN (2, 3)")
    val fmts = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, dir, "t", Nil)
      .filter(org.apache.spark.sql.functions.col("content") === 1)
      .select("file_format").collect().map(_.getString(0)).distinct.toSeq
    assert(fmts == Seq("PUFFIN"), s"DV dialect expected, got $fmts")
    val out = spark.sql("SELECT k, amt FROM mdml.db.dvdml ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 10L), (2L, 200L), (3L, 300L), (4L, 40L)))
  }

  test("spark.wap.branch routes INSERTs onto the branch (session-scoped WAP)") {
    val dir = fresh("wapbr", mor = false)
    spark.sql("ALTER TABLE mdml.db.wapbr " +
      "SET TBLPROPERTIES ('write.wap.enabled' = 'true')")
    val headN = spark.sql("SELECT count(*) FROM mdml.db.wapbr").head.getLong(0)
    spark.conf.set("spark.wap.branch", "audit")
    try spark.sql("INSERT INTO mdml.db.wapbr VALUES (9, 'z', 90)")
    finally spark.conf.unset("spark.wap.branch")
    assert(spark.sql("SELECT count(*) FROM mdml.db.wapbr").head.getLong(0)
      == headN, "wap.branch write leaked into the head")
    assert(spark.sql(
      "SELECT count(*) FROM mdml.db.wapbr VERSION AS OF 'audit'")
      .head.getLong(0) == headN + 1)
    val _ = dir
  }

  test("successive DV deletes fold to AT MOST ONE deletion vector per data file (v3 invariant)") {
    val dir = fresh("dvfold", mor = true)
    spark.sql("ALTER TABLE mdml.db.dvfold " +
      "SET TBLPROPERTIES ('write.delete.format' = 'dv')")
    // three commits, each tombstoning rows of the SAME first file (k=1,2)
    // and one also hitting the second (k=3) — without merge-at-commit
    // three puffins accumulate and a conforming one-DV-per-file reader
    // would drop deletes
    spark.sql("DELETE FROM mdml.db.dvfold WHERE k = 1")
    spark.sql("UPDATE mdml.db.dvfold SET amt = -1 WHERE k = 3")
    spark.sql("DELETE FROM mdml.db.dvfold WHERE k = 2")
    val dvEntries = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, dir, "t", Nil)
      .filter(org.apache.spark.sql.functions.col("content") === 1)
      .select("file_path").collect().map(_.getString(0)).toSeq
    val perTarget = dvEntries
      .flatMap(p => graft.sources.DeletionVectors.read(new java.io.File(p)))
      .groupBy(_._1).view.mapValues(_.size).toMap
    assert(perTarget.values.forall(_ == 1),
      s"a data file is referenced by more than one live DV: $perTarget")
    // and the state is exactly right: 1,2 gone; 3 updated; 4 intact
    val out = spark.sql("SELECT k, amt FROM mdml.db.dvfold ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((3L, -1L), (4L, 40L)), s"got $out")
  }

  test("write.delete.granularity=equality: MERGE/DELETE land eq-tombstones, zero position deletes") {
    spark.sql("DROP TABLE IF EXISTS mdml.db.eqg")
    spark.sql("CREATE TABLE mdml.db.eqg " +
      "(k BIGINT NOT NULL, v STRING, amt BIGINT) " +
      "USING `graft-iceberg` TBLPROPERTIES (" +
      "'write.update.mode' = 'merge-on-read', " +
      "'write.merge.mode' = 'merge-on-read', " +
      "'write.delete.mode' = 'merge-on-read', " +
      "'write.delete.granularity' = 'equality', " +
      "'identifier.columns' = 'k')")
    spark.sql("INSERT INTO mdml.db.eqg SELECT /*+ COALESCE(1) */ * " +
      "FROM VALUES (1L,'a',10L),(2L,'b',20L),(3L,'c',30L) AS t(k, v, amt)")
    spark.sql("""MERGE INTO mdml.db.eqg t
      |USING (SELECT * FROM VALUES (2L, 222L), (4L, 444L) AS s(k, namt)) s
      |ON t.k = s.k
      |WHEN MATCHED THEN UPDATE SET amt = s.namt
      |WHEN NOT MATCHED THEN INSERT (k, v, amt) VALUES (s.k, 'new', s.namt)
      |""".stripMargin)
    val dir = "target/tmp-mordml-wh/db/eqg"
    val byContent = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, dir, "t", Nil)
      .select("content").collect().map(_.getInt(0))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(byContent.getOrElse(1, 0) == 0,
      s"equality granularity must write NO position deletes: $byContent")
    assert(byContent.getOrElse(2, 0) > 0,
      s"expected equality tombstones: $byContent")
    // the eq tombstone carries resolvable equality_ids (k = field 1)
    val eqIds = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, dir, "t", Nil)
      .filter(org.apache.spark.sql.functions.col("content") === 2)
      .select("equality_ids").collect()
      .map(_.getAs[scala.collection.Seq[Int]](0).toSeq).distinct.toSeq
    assert(eqIds == Seq(Seq(1)), eqIds.toString)
    // read-back truth through the connector scan
    val out = spark.sql("SELECT k, amt FROM mdml.db.eqg ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 10L), (2L, 222L), (3L, 30L), (4L, 444L)), out)
    // non-pushable DELETE routes through the delta path: eq again
    spark.sql("DELETE FROM mdml.db.eqg WHERE k % 3 = 0")
    val out2 = spark.sql("SELECT k FROM mdml.db.eqg ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(out2 == Seq(1L, 2L, 4L), out2)
    // $position_deletes stays EMPTY; rewrite folds the eq tombstones
    assert(spark.sql("SELECT count(*) FROM mdml.db.eqg.position_deletes")
      .head.getLong(0) == 0L)
    spark.sql("CALL mdml.system.rewrite_data_files(table => 'db.eqg')")
    assert(spark.sql("SELECT k FROM mdml.db.eqg ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
  }

  test("eq tombstones keep applying through a key RENAME: pre-rename files alias-resolve") {
    spark.sql("DROP TABLE IF EXISTS mdml.db.eqr")
    spark.sql("CREATE TABLE mdml.db.eqr " +
      "(k BIGINT NOT NULL, v STRING) USING `graft-iceberg` TBLPROPERTIES (" +
      "'write.delete.mode' = 'merge-on-read', " +
      "'write.delete.granularity' = 'equality', " +
      "'identifier.columns' = 'k')")
    // file 1 carries the PRE-RENAME column name
    spark.sql("INSERT INTO mdml.db.eqr SELECT /*+ COALESCE(1) */ * " +
      "FROM VALUES (1L,'a'),(2L,'b'),(3L,'c') AS t(k, v)")
    spark.sql("ALTER TABLE mdml.db.eqr RENAME COLUMN k TO key")
    spark.sql("ALTER TABLE mdml.db.eqr SET TBLPROPERTIES (" +
      "'identifier.columns' = 'key')")
    // post-rename file too — both generations must die by key
    spark.sql("INSERT INTO mdml.db.eqr SELECT /*+ COALESCE(1) */ * " +
      "FROM VALUES (4L,'d'),(5L,'e') AS t(key, v)")
    // non-pushable predicate -> eq tombstones keyed by the CURRENT name
    spark.sql("DELETE FROM mdml.db.eqr WHERE key % 2 = 0")
    val out = spark.sql("SELECT key FROM mdml.db.eqr ORDER BY key")
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 3L, 5L),
      s"pre-rename file's rows must still match the eq tombstones: $out")
  }

  test("rewrite_data_files folds MOR DML tombstones away, state preserved") {
    fresh("fold", mor = true)
    spark.sql("UPDATE mdml.db.fold SET amt = 0 WHERE k = 2")
    val pre = spark.sql("SELECT k, amt FROM mdml.db.fold ORDER BY k")
      .collect().map(_.toSeq).toSeq
    spark.sql("CALL mdml.system.rewrite_data_files(table => 'db.fold')")
    val (_, tombs) = entryKinds("target/tmp-mordml-wh/db/fold")
    assert(tombs == 0, "rewrite must fold the tombstones away")
    val post = spark.sql("SELECT k, amt FROM mdml.db.fold ORDER BY k")
      .collect().map(_.toSeq).toSeq
    assert(post == pre)
  }
}
