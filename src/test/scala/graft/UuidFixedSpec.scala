package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** UUID and FIXED(L) lake types — the spec's remaining primitives:
  * declared per column via `graft.lake-type.<column>` table properties
  * (uuid rides Spark STRING, fixed[N] rides BINARY), encoded per the
  * Iceberg spec (parquet FIXED_LEN_BYTE_ARRAY(16)+UUID annotation /
  * FIXED_LEN_BYTE_ARRAY(N); avro fixed(16) logicalType uuid / fixed(N);
  * ORC canonical string / binary — this layout's ORC dialect), decoded
  * in every scan arm, MOR-deletable by a uuid predicate, and bucketed
  * per spec Appendix B (murmur3 of the 16 big-endian bytes). */
class UuidFixedSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSpec.spark
    val wh = new java.io.File("target/tmp-uuid-wh")
    org.apache.commons.io.FileUtils.deleteQuietly(wh)
    s.conf.set("spark.sql.catalog.uf",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.uf.warehouse", wh.getAbsolutePath)
    s.sql("CREATE NAMESPACE IF NOT EXISTS uf.db")
    s
  }

  // deterministic uuids: name-based (UUID v3) off the row key
  private def uuidOf(k: Long): String =
    java.util.UUID.nameUUIDFromBytes(
      s"graft-$k".getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString

  for (fmt <- Seq("parquet", "orc", "avro")) {
    test(s"uuid + fixed[8] round-trip + MOR delete by uuid predicate in $fmt") {
      val tbl = s"uf.db.t_$fmt"
      spark.sql(s"CREATE TABLE $tbl (id STRING, k BIGINT, payload BINARY) " +
        "USING `graft-iceberg` TBLPROPERTIES (" +
        s"'write.format.default' = '$fmt', " +
        "'write.delete.mode' = 'merge-on-read', " +
        "'graft.lake-type.id' = 'uuid', " +
        "'graft.lake-type.payload' = 'fixed[8]')")
      val rows = (1L to 6L).map(k =>
        s"('${uuidOf(k)}', $k, unhex(lpad(hex($k), 16, '0')))")
      spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
        rows.mkString(", ") + " AS t(id, k, payload)")
      val got = spark.sql(s"SELECT id, k, payload FROM $tbl ORDER BY k")
        .collect()
      assert(got.length == 6)
      (1L to 6L).foreach { k =>
        val r = got((k - 1).toInt)
        assert(r.getString(0) == uuidOf(k), s"$fmt uuid k=$k: ${r.getString(0)}")
        val p = r.getAs[Array[Byte]](2)
        assert(p.length == 8 && p(7) == k.toByte, s"$fmt payload k=$k")
      }
      // MOR delete keyed by the uuid column — the scan decodes the
      // fixed bytes to evaluate the residual predicate
      spark.sql(s"DELETE FROM $tbl WHERE id = '${uuidOf(3L)}'")
      val kept = spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect()
        .map(_.getLong(0)).toSeq
      assert(kept == Seq(1L, 2L, 4L, 5L, 6L), kept.toString)
      // a wrong-length fixed value refuses at write
      val ex = intercept[Exception] {
        spark.sql(s"INSERT INTO $tbl VALUES ('${uuidOf(9L)}', 9, " +
          "unhex('0102'))")
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(m => m.contains("fixed[8]")), msgs(ex).toString)
    }
  }

  test("parquet physical encoding is the spec's: FLBA(16)+UUID / FLBA(8)") {
    val tdir = new java.io.File("target/tmp-uuid-wh/db/t_parquet/data")
    val dataFile = tdir.listFiles().filter(f =>
      f.getName.endsWith(".parquet") && f.getName.startsWith("append")).head
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(dataFile.getAbsolutePath),
      new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val schema = try r.getFooter.getFileMetaData.getSchema finally r.close()
    def fieldOf(n: String) =
      schema.getFields.get(schema.getFieldIndex(n)).asPrimitiveType()
    val id = fieldOf("id")
    assert(id.getPrimitiveTypeName ==
      org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
        .FIXED_LEN_BYTE_ARRAY && id.getTypeLength == 16)
    assert(id.getLogicalTypeAnnotation ==
      org.apache.parquet.schema.LogicalTypeAnnotation.uuidType())
    val payload = fieldOf("payload")
    assert(payload.getPrimitiveTypeName ==
      org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
        .FIXED_LEN_BYTE_ARRAY && payload.getTypeLength == 8)
    assert(payload.getLogicalTypeAnnotation == null)
  }

  test("bucket[n] over a uuid column hashes the 16 big-endian bytes") {
    import graft.sources.PartitionTransforms
    // the spec's convention differs from string bucketing for the
    // SAME textual value — pin that they disagree (so the uuid arm is
    // really exercised) and that bucketUuid is stable
    val u = uuidOf(42L)
    assert(PartitionTransforms.bucketUuid(u, 1024) ==
      PartitionTransforms.bucketUuid(u.toUpperCase, 1024),
      "uuid bucketing is case-insensitive (hashes bytes, not text)")
    val tbl = "uf.db.bucketed"
    spark.sql(s"CREATE TABLE $tbl (id STRING, k BIGINT) " +
      "USING `graft-iceberg` PARTITIONED BY (bucket(4, id)) " +
      "TBLPROPERTIES ('graft.lake-type.id' = 'uuid')")
    val rows = (1L to 12L).map(k => s"('${uuidOf(k)}', $k)")
    spark.sql(s"INSERT INTO $tbl SELECT * FROM VALUES " +
      rows.mkString(", ") + " AS t(id, k)")
    // every row lands in the spec-computed bucket
    val byPart = spark.sql(s"SELECT id, _partition.id_bucket FROM $tbl")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    byPart.foreach { case (u2, b) =>
      assert(b == PartitionTransforms.bucketUuid(u2, 4).toLong,
        s"row $u2 in bucket $b")
    }
    // a uuid point lookup scans fewer files than the table holds
    // (pruning by the uuid image) and returns exactly its row
    val probe = uuidOf(7L)
    val hit = spark.sql(s"SELECT k FROM $tbl WHERE id = '$probe'")
      .collect().map(_.getLong(0)).toSeq
    assert(hit == Seq(7L), hit.toString)
  }

  test("uuid values agree byte-for-byte across all three formats") {
    // the ORC dialect stores canonical strings; parquet/avro decode
    // fixed bytes — an UPPERCASE insert must read back canonical
    // lower-case everywhere
    val tbl = "uf.db.canon"
    spark.sql(s"CREATE TABLE $tbl (id STRING, k BIGINT) " +
      "USING `graft-iceberg` TBLPROPERTIES (" +
      "'graft.lake-type.id' = 'uuid', " +
      "'write.format.default' = 'parquet')")
    val u = uuidOf(5L)
    spark.sql(s"INSERT INTO $tbl VALUES ('${u.toUpperCase}', 1)")
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES (" +
      "'write.format.default' = 'orc')")
    spark.sql(s"INSERT INTO $tbl VALUES ('${u.toUpperCase}', 2)")
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES (" +
      "'write.format.default' = 'avro')")
    spark.sql(s"INSERT INTO $tbl VALUES ('${u.toUpperCase}', 3)")
    val ids = spark.sql(s"SELECT DISTINCT id FROM $tbl").collect()
      .map(_.getString(0)).toSeq
    assert(ids == Seq(u), s"all three formats must read back $u: $ids")
  }

  test("uuid tables survive maintenance rewrites: values intact, deletes still match") {
    // rewrite_data_files reads uuid columns schema-less (the connector
    // infers the FLBA-uuid column — Spark's native inference has no
    // case for it) and writes survivors back as plain canonical
    // strings; readers accept BOTH encodings, so values stay intact
    // and later deletes still match
    val tbl = "uf.db.maint"
    spark.sql(s"CREATE TABLE $tbl (id STRING, k BIGINT) " +
      "USING `graft-iceberg` TBLPROPERTIES (" +
      "'graft.lake-type.id' = 'uuid')")
    val rows = (1L to 8L).map(k => s"('${uuidOf(k)}', $k)")
    spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
      rows.mkString(", ") + " AS t(id, k)")
    // COW delete (default mode): survivors rewritten via MorRead
    spark.sql(s"DELETE FROM $tbl WHERE id = '${uuidOf(2L)}'")
    val after1 = spark.sql(s"SELECT k, id FROM $tbl ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(after1 == (1L to 8L).filterNot(_ == 2L).map(k => (k, uuidOf(k))),
      s"COW delete must keep survivors' uuids intact: $after1")
    // a SECOND delete over the rewritten (plain-string) files must
    // still match by value
    spark.sql(s"DELETE FROM $tbl WHERE id = '${uuidOf(5L)}'")
    assert(spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 3L, 4L, 6L, 7L, 8L))
    // and an explicit rewrite_data_files with NO declared schema works
    spark.sql("CALL uf.system.rewrite_data_files('db.maint')")
    val afterRw = spark.sql(s"SELECT k, id FROM $tbl ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(afterRw == Seq(1L, 3L, 4L, 6L, 7L, 8L).map(k => (k, uuidOf(k))),
      s"rewrite must preserve uuid values: $afterRw")
  }

  test("a lake type on the wrong Spark type refuses at write") {
    val tbl = "uf.db.bad"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT) USING `graft-iceberg` " +
      "TBLPROPERTIES ('graft.lake-type.id' = 'uuid')")
    val ex = intercept[Exception] {
      spark.sql(s"INSERT INTO $tbl VALUES (1)")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("lake type")), msgs(ex).toString)
  }
}
