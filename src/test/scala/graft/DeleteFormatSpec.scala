package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** `write.delete.format.default` — Iceberg's DELETE-FILE format knob
  * (distinct from the data files' write.format.default and from the dv
  * dialect): position-tombstone FILES land as parquet, ORC, or AVRO,
  * and every reader (connector MOR scan, $position_deletes,
  * rewrite_position_delete_files) dispatches on the manifest entry's
  * file_format. */
class DeleteFormatSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSpec.spark
    val wh = new java.io.File("target/tmp-delfmt-wh")
    org.apache.commons.io.FileUtils.deleteQuietly(wh)
    s.conf.set("spark.sql.catalog.dfmt",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.dfmt.warehouse", wh.getAbsolutePath)
    s.sql("CREATE NAMESPACE IF NOT EXISTS dfmt.db")
    s
  }

  for (fmt <- Seq("orc", "avro")) {
    test(s"MOR DELETE writes $fmt tombstones; the scan applies them") {
      val tbl = s"dfmt.db.t_$fmt"
      spark.sql(s"CREATE TABLE $tbl (k BIGINT, v BIGINT) " +
        "USING `graft-iceberg` TBLPROPERTIES (" +
        "'write.delete.mode' = 'merge-on-read', " +
        s"'write.delete.format.default' = '$fmt')")
      spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
        "(1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L) AS t(k, v)")
      spark.sql(s"DELETE FROM $tbl WHERE k IN (2, 4)")
      // the tombstone FILE really is the declared format
      val tdir = s"target/tmp-delfmt-wh/db/t_$fmt"
      val delFmts = graft.sources.IcebergManifestSource
        .statsFromTableDir(spark, tdir, "t", Nil)
        .filter(col("content") === 1)
        .select("file_format").collect().map(_.getString(0)).toSet
      assert(delFmts == Set(fmt.toUpperCase), delFmts.toString)
      // the connector scan applies it
      assert(spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect()
        .map(_.getLong(0)).toSeq == Seq(1L, 3L))
      // the fixture-layer MOR read applies it too
      val viaMor = graft.sources.MorRead.readTable(spark, tdir)
        .select("k").collect().map(_.getLong(0)).sorted.toSeq
      assert(viaMor == Seq(1L, 3L), viaMor.toString)
      // $position_deletes serves the pairs with the right format label
      val pd = spark.sql(
        s"SELECT pos, delete_file_format FROM $tbl.position_deletes " +
          "ORDER BY pos").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(pd.toSeq == Seq((1L, fmt.toUpperCase), (3L, fmt.toUpperCase)),
        pd.mkString(", "))
    }
  }

  // EQUALITY deletes honor the same knob (Iceberg keys ALL delete
  // files off write.delete.format.default): the eq-granularity delta
  // path and the fixture-layer commitDelete/commitUpsert/commitMerge
  // all write the declared dialect, every eq reader (connector scan,
  // MorRead, convert_equality_deletes) dispatches off the manifest
  // entry's file_format.
  for (fmt <- Seq("orc", "avro")) {
    test(s"equality deletes land as $fmt; scan + MorRead + convert apply them") {
      val tbl = s"dfmt.db.eq_$fmt"
      spark.sql(s"CREATE TABLE $tbl (k BIGINT NOT NULL, v BIGINT) " +
        "USING `graft-iceberg` TBLPROPERTIES (" +
        "'write.delete.mode' = 'merge-on-read', " +
        "'write.merge.mode' = 'merge-on-read', " +
        "'write.delete.granularity' = 'equality', " +
        "'identifier.columns' = 'k', " +
        s"'write.delete.format.default' = '$fmt')")
      spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
        "(1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L) AS t(k, v)")
      // non-pushable predicate -> the eq-granularity delta path
      spark.sql(s"DELETE FROM $tbl WHERE k % 2 = 0")
      val tdir = s"target/tmp-delfmt-wh/db/eq_$fmt"
      val eqEntries = graft.sources.IcebergManifestSource
        .statsFromTableDir(spark, tdir, "t", Nil)
        .filter(col("content") === 2)
        .select("file_format").collect().map(_.getString(0)).toSet
      assert(eqEntries == Set(fmt.toUpperCase), eqEntries.toString)
      // the connector scan applies the non-parquet eq tombstones
      assert(spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect()
        .map(_.getLong(0)).toSeq == Seq(1L, 3L))
      // the fixture-layer MOR read does too (metadata-resolved keys)
      val viaMor = graft.sources.MorRead.readTable(spark, tdir)
        .select("k").collect().map(_.getLong(0)).sorted.toSeq
      assert(viaMor == Seq(1L, 3L), viaMor.toString)
      // eq->pos conversion reads the dialect and folds it
      val (_, nEq, nPairs) = graft.sources.LayoutMaintenance
        .convertEqualityDeletes(spark, tdir)
      assert(nEq == 1 && nPairs == 2L, s"convert: $nEq files, $nPairs pairs")
      assert(spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect()
        .map(_.getLong(0)).toSeq == Seq(1L, 3L))
    }
  }

  // BINARY identifier columns: eq-delete key values must compare by
  // CONTENT across formats — ORC surfaces Array[Byte] (reference
  // equality), AVRO ByteBuffer, parquet raw binary; all sides normalize
  // to one content-comparable form or deleted rows silently resurface.
  for (fmt <- Seq("parquet", "orc", "avro")) {
    test(s"equality deletes on a BINARY identifier column apply from $fmt") {
      val tbl = s"dfmt.db.eqbin_$fmt"
      spark.sql(s"CREATE TABLE $tbl (k BINARY NOT NULL, v BIGINT) " +
        "USING `graft-iceberg` TBLPROPERTIES (" +
        "'write.delete.mode' = 'merge-on-read', " +
        "'write.delete.granularity' = 'equality', " +
        "'identifier.columns' = 'k', " +
        s"'write.delete.format.default' = '$fmt')")
      spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
        "(X'01FE', 10L), (X'02FE', 20L), (X'03FE', 30L), " +
        "(X'04FE', 40L) AS t(k, v)")
      // non-pushable predicate -> eq tombstones carrying the BINARY key
      spark.sql(s"DELETE FROM $tbl WHERE v % 20 = 0")
      val tdir = s"target/tmp-delfmt-wh/db/eqbin_$fmt"
      val eqFmts = graft.sources.IcebergManifestSource
        .statsFromTableDir(spark, tdir, "t", Nil)
        .filter(col("content") === 2)
        .select("file_format").collect().map(_.getString(0)).toSet
      assert(eqFmts == Set(fmt.toUpperCase), eqFmts.toString)
      // connector MOR scan applies the binary-keyed tombstones
      val kept = spark.sql(s"SELECT v FROM $tbl ORDER BY v").collect()
        .map(_.getLong(0)).toSeq
      assert(kept == Seq(10L, 30L), s"$fmt: $kept")
      // the fixture-layer MOR read agrees (Spark SQL binary equality)
      val viaMor = graft.sources.MorRead.readTable(spark, tdir)
        .select("v").collect().map(_.getLong(0)).sorted.toSeq
      assert(viaMor == Seq(10L, 30L), s"$fmt MorRead: $viaMor")
    }
  }

  test("TIME-keyed equality tombstones in AVRO decode to TIME before matching") {
    spark.conf.set("spark.sql.timeType.enabled", "true")
    import spark.implicits._
    val tbl = "dfmt.db.eqtime"
    spark.sql(s"CREATE TABLE $tbl (t TIME(6), v BIGINT) " +
      "USING `graft-iceberg` TBLPROPERTIES (" +
      "'write.delete.format.default' = 'avro')")
    spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
      "(TIME'01:02:03', 1L), (TIME'09:30:15.123456', 2L), " +
      "(TIME'23:59:59', 3L) AS x(t, v)")
    val tdir = "target/tmp-delfmt-wh/db/eqtime"
    // fixture-layer eq delete keyed on the TIME column — the tombstone
    // lands as avro time-micros and must decode before equi-matching
    graft.sources.LayoutMaintenance.commitDelete(spark, tdir,
      spark.sql("SELECT TIME'09:30:15.123456' AS t"), Seq("t"))
    val viaMor = graft.sources.MorRead.readTable(spark, tdir)
      .select("v").collect().map(_.getLong(0)).sorted.toSeq
    assert(viaMor == Seq(1L, 3L), s"MorRead: $viaMor")
    // the connector scan agrees (both sides compare at raw micros)
    val viaScan = spark.sql(s"SELECT v FROM $tbl ORDER BY v").collect()
      .map(_.getLong(0)).toSeq
    assert(viaScan == Seq(1L, 3L), s"scan: $viaScan")
  }

  test("mixed-dialect equality tombstones fold in one conversion") {
    val tbl = "dfmt.db.eqmix"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT NOT NULL, v BIGINT) " +
      "USING `graft-iceberg` TBLPROPERTIES (" +
      "'write.delete.mode' = 'merge-on-read', " +
      "'write.delete.granularity' = 'equality', " +
      "'identifier.columns' = 'k', " +
      "'write.delete.format.default' = 'orc')")
    spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
      "(1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (5L, 50L), " +
      "(6L, 60L) AS t(k, v)")
    spark.sql(s"DELETE FROM $tbl WHERE k % 6 = 2") // ORC eq tombstone
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES (" +
      "'write.delete.format.default' = 'avro')")
    spark.sql(s"DELETE FROM $tbl WHERE k % 6 = 4") // AVRO eq tombstone
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES (" +
      "'write.delete.format.default' = 'parquet')")
    spark.sql(s"DELETE FROM $tbl WHERE k % 6 = 0") // parquet eq tombstone
    val tdir = "target/tmp-delfmt-wh/db/eqmix"
    val eqFmts = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, tdir, "t", Nil)
      .filter(col("content") === 2)
      .select("file_format").collect().map(_.getString(0)).toSet
    assert(eqFmts == Set("ORC", "AVRO", "PARQUET"), eqFmts.toString)
    assert(spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 3L, 5L))
    val (_, nEq, nPairs) = graft.sources.LayoutMaintenance
      .convertEqualityDeletes(spark, tdir)
    assert(nEq == 3 && nPairs == 3L, s"convert: $nEq files, $nPairs pairs")
    assert(spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 3L, 5L))
  }

  test("fixture-layer commitDelete/commitUpsert honor the eq dialect") {
    import spark.implicits._
    val tbl = "dfmt.db.eqfx"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v BIGINT) " +
      "USING `graft-iceberg` TBLPROPERTIES (" +
      "'write.delete.format.default' = 'avro')")
    spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
      "(1L, 10L), (2L, 20L), (3L, 30L) AS t(k, v)")
    val tdir = "target/tmp-delfmt-wh/db/eqfx"
    graft.sources.LayoutMaintenance.commitDelete(spark, tdir,
      Seq(2L).toDF("k"), Seq("k"))
    graft.sources.LayoutMaintenance.commitUpsert(spark, tdir,
      Seq((3L, 333L), (4L, 444L)).toDF("k", "v"), Seq("k"))
    val eqFmts = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, tdir, "t", Nil)
      .filter(col("content") === 2)
      .select("file_format").collect().map(_.getString(0)).toSet
    assert(eqFmts == Set("AVRO"), eqFmts.toString)
    val out = graft.sources.MorRead.readTable(spark, tdir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(out == Seq((1L, 10L), (3L, 333L), (4L, 444L)), out.toString)
  }

  test("rewrite_position_delete_files folds mixed-format tombstones") {
    val tbl = "dfmt.db.mix"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v BIGINT) " +
      "USING `graft-iceberg` TBLPROPERTIES (" +
      "'write.delete.mode' = 'merge-on-read', " +
      "'write.delete.format.default' = 'orc')")
    spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
      "(1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (5L, 50L), " +
      "(6L, 60L) AS t(k, v)")
    spark.sql(s"DELETE FROM $tbl WHERE k = 2") // ORC tombstone
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES (" +
      "'write.delete.format.default' = 'avro')")
    spark.sql(s"DELETE FROM $tbl WHERE k = 4") // AVRO tombstone
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES (" +
      "'write.delete.format.default' = 'parquet')")
    spark.sql(s"DELETE FROM $tbl WHERE k = 6") // parquet tombstone
    val tdir = "target/tmp-delfmt-wh/db/mix"
    val delFmts = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, tdir, "t", Nil)
      .filter(col("content") === 1)
      .select("file_format").collect().map(_.getString(0)).toSet
    assert(delFmts == Set("ORC", "AVRO", "PARQUET"), delFmts.toString)
    assert(spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 3L, 5L))
    // the fold reads all three dialects and consolidates
    val (_, before, after, nPairs) = graft.sources.LayoutMaintenance
      .rewritePositionDeletes(spark, tdir)
    assert(before == 3 && after == 1 && nPairs == 3L,
      s"fold: $before -> $after files, $nPairs pairs")
    assert(spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 3L, 5L))
  }
}
