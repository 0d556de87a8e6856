package graft

import org.scalatest.funsuite.AnyFunSuite

/** Iceberg v3 VARIANT lake columns — the self-describing
  * semi-structured type (Spark 4's native VariantType): written
  * UNSHREDDED as the spec's two-binary (metadata, value) pair — a
  * parquet group, an ORC struct, an avro record — and read back as
  * VariantVal in every scan arm, so `variant_get` / `to_json` /
  * schema-on-read all work over lake data with MOR semantics. */
class VariantLakeSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSpec.spark
    val wh = new java.io.File("target/tmp-variant-wh")
    org.apache.commons.io.FileUtils.deleteQuietly(wh)
    s.conf.set("spark.sql.catalog.vr",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.vr.warehouse", wh.getAbsolutePath)
    s.sql("CREATE NAMESPACE IF NOT EXISTS vr.db")
    s
  }

  for (fmt <- Seq("parquet", "orc", "avro")) {
    test(s"VARIANT round-trips + variant_get + MOR delete in $fmt") {
      val tbl = s"vr.db.t_$fmt"
      spark.sql(s"CREATE TABLE $tbl (k BIGINT, v VARIANT) " +
        "USING `graft-iceberg` TBLPROPERTIES (" +
        s"'write.format.default' = '$fmt', " +
        "'write.delete.mode' = 'merge-on-read')")
      spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ id AS k, " +
        "parse_json(concat('{\"n\":', id, ',\"tag\":\"x', id, " +
        "'\",\"nested\":{\"deep\":', id * 10, '}}')) AS v " +
        "FROM range(6)")
      spark.sql(s"INSERT INTO $tbl VALUES (100L, NULL)")
      // schema-on-read: typed extraction through the lake scan
      val got = spark.sql(
        s"""SELECT k, variant_get(v, '$$.n', 'bigint') AS n,
           |  variant_get(v, '$$.tag', 'string') AS tag,
           |  variant_get(v, '$$.nested.deep', 'bigint') AS deep
           |FROM $tbl WHERE v IS NOT NULL ORDER BY k""".stripMargin)
        .collect()
      assert(got.length == 6)
      got.foreach { r =>
        val k = r.getLong(0)
        assert(r.getLong(1) == k && r.getString(2) == s"x$k" &&
          r.getLong(3) == k * 10, s"$fmt k=$k: $r")
      }
      // the null variant row survives as SQL null
      assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE v IS NULL")
        .head.getLong(0) == 1L)
      // to_json reproduces the document byte-exactly enough to parse
      val js = spark.sql(
        s"SELECT to_json(v) FROM $tbl WHERE k = 3").head.getString(0)
      assert(js.contains("\"n\":3") && js.contains("\"deep\":30"), js)
      // MOR delete keyed off a VARIANT extraction — the residual
      // predicate forces the variant decode in every format
      spark.sql(s"DELETE FROM $tbl " +
        "WHERE variant_get(v, '$.n', 'bigint') % 2 = 0")
      val kept = spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect()
        .map(_.getLong(0)).toSeq
      assert(kept == Seq(1L, 3L, 5L, 100L), kept.toString)
    }
  }

  test("rewrite_data_files preserves variant values (maintenance path)") {
    spark.sql("CREATE TABLE vr.db.rw (k BIGINT, v VARIANT) " +
      "USING `graft-iceberg`")
    spark.sql("INSERT INTO vr.db.rw SELECT /*+ COALESCE(1) */ id, " +
      "parse_json(concat('{\"n\":', id, '}')) FROM range(5)")
    spark.sql("INSERT INTO vr.db.rw SELECT /*+ COALESCE(1) */ id, " +
      "parse_json(concat('{\"n\":', id, '}')) FROM range(5, 10)")
    spark.sql("CALL vr.system.rewrite_data_files('db.rw')")
    val got = spark.sql("SELECT k, variant_get(v, '$.n', 'bigint') " +
      "FROM vr.db.rw ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == (0L until 10L).map(i => (i, i)), got.toString)
  }

  test("variant columns accrete across all three formats in one table") {
    val tbl = "vr.db.mixed"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v VARIANT) " +
      "USING `graft-iceberg` TBLPROPERTIES (" +
      "'write.format.default' = 'parquet')")
    def ins(mod: Int): Unit =
      spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ id, " +
        "parse_json(concat('{\"m\":', id % 3, '}')) FROM range(9) " +
        s"WHERE id % 3 = $mod")
    ins(0)
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES (" +
      "'write.format.default' = 'orc')")
    ins(1)
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES (" +
      "'write.format.default' = 'avro')")
    ins(2)
    val fmts = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, "target/tmp-variant-wh/db/mixed", "t", Nil)
      .filter(org.apache.spark.sql.functions.col("content") === 0)
      .select("file_format").collect().map(_.getString(0)).toSet
    assert(fmts == Set("PARQUET", "ORC", "AVRO"), fmts.toString)
    val byM = spark.sql(
      s"""SELECT variant_get(v, '$$.m', 'bigint') AS m, count(*) AS n,
         |  sum(k) AS sk FROM $tbl GROUP BY 1 ORDER BY m""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(byM == Seq((0L, 3L, 9L), (1L, 3L, 12L), (2L, 3L, 15L)),
      byM.toString)
  }
}
