package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** DATE / TIMESTAMP / BINARY columns through the connector — the
  * spec's date/timestamptz/binary types in all three data-file formats
  * (parquet INT32-date / INT64-micros / raw BINARY; ORC DATE /
  * TIMESTAMP_INSTANT / BINARY; avro int-date / long-timestamp-micros /
  * bytes), plus date-typed partition transforms (month(date)). */
class TemporalTypesSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSpec.spark
    val wh = new java.io.File("target/tmp-temporal-wh")
    org.apache.commons.io.FileUtils.deleteQuietly(wh)
    s.conf.set("spark.sql.catalog.temporal",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.temporal.warehouse", wh.getAbsolutePath)
    s.sql("CREATE NAMESPACE IF NOT EXISTS temporal.db")
    s
  }

  for (fmt <- Seq("parquet", "orc", "avro")) {
    test(s"date/timestamp/binary round-trip + MOR delete in $fmt") {
      val tbl = s"temporal.db.t_$fmt"
      spark.sql(s"CREATE TABLE $tbl (k BIGINT, d DATE, ts TIMESTAMP, " +
        "b BINARY) USING `graft-iceberg` TBLPROPERTIES (" +
        s"'write.format.default' = '$fmt', " +
        "'write.delete.mode' = 'merge-on-read')")
      spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
        "(1L, DATE'1995-03-15', TIMESTAMP'1995-03-15 10:30:00.123456', " +
        "  CAST('alpha' AS BINARY))," +
        "(2L, DATE'1996-07-04', TIMESTAMP'1996-07-04 23:59:59.999999', " +
        "  CAST('beta' AS BINARY))," +
        "(3L, DATE'1997-12-31', NULL, NULL) AS t(k, d, ts, b)")
      val rows = spark.sql(
        s"SELECT k, CAST(d AS STRING), CAST(ts AS STRING), " +
          s"CAST(b AS STRING) FROM $tbl ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getString(1),
          Option(r.getString(2)).getOrElse("-"),
          Option(r.getString(3)).getOrElse("-")))
      assert(rows.toSeq == Seq(
        (1L, "1995-03-15", "1995-03-15 10:30:00.123456", "alpha"),
        (2L, "1996-07-04", "1996-07-04 23:59:59.999999", "beta"),
        (3L, "1997-12-31", "-", "-")), rows.mkString(", "))
      // date-predicate MOR delete across the typed file
      spark.sql(s"DELETE FROM $tbl WHERE d < DATE'1996-01-01'")
      assert(spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect()
        .map(_.getLong(0)).toSeq == Seq(2L, 3L))
      // the file format really is the declared one
      val dir = s"target/tmp-temporal-wh/db/t_$fmt"
      val fmts = graft.sources.IcebergManifestSource
        .statsFromTableDir(spark, dir, "t", Nil)
        .filter(col("content") === 0)
        .select("file_format").collect().map(_.getString(0)).toSet
      assert(fmts == Set(fmt.toUpperCase), fmts.toString)
    }
  }

  for (fmt <- Seq("parquet", "orc", "avro")) {
    test(s"decimal(12,2) money round-trips exactly in $fmt") {
      val tbl = s"temporal.db.dec_$fmt"
      spark.sql(s"CREATE TABLE $tbl (k BIGINT, price DECIMAL(12,2)) " +
        "USING `graft-iceberg` TBLPROPERTIES (" +
        s"'write.format.default' = '$fmt', " +
        "'write.delete.mode' = 'merge-on-read')")
      spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
        "(1L, CAST(19.99 AS DECIMAL(12,2)))," +
        "(2L, CAST(-0.01 AS DECIMAL(12,2)))," +
        "(3L, CAST(1234567890.55 AS DECIMAL(12,2)))," +
        "(4L, CAST(NULL AS DECIMAL(12,2))) AS t(k, price)")
      val back = spark.sql(
        s"SELECT k, CAST(price AS STRING) FROM $tbl ORDER BY k").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("-")))
      assert(back.toSeq == Seq((1L, "19.99"), (2L, "-0.01"),
        (3L, "1234567890.55"), (4L, "-")), back.mkString(", "))
      // exact SUM over the lake column (money must never round)
      assert(spark.sql(s"SELECT CAST(sum(price) AS STRING) FROM $tbl")
        .head.getString(0) == "1234567910.53")
      spark.sql(s"DELETE FROM $tbl WHERE price < CAST(0 AS DECIMAL(12,2))")
      assert(spark.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) == 3L)
    }
  }

  test("decimal precision above 18 refuses loudly") {
    spark.sql("CREATE TABLE temporal.db.bigdec (v DECIMAL(25,4)) " +
      "USING `graft-iceberg`")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO temporal.db.bigdec " +
        "VALUES (CAST(1.5 AS DECIMAL(25,4)))") }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("precision")), msgs(e).toString)
  }

  test("PARTITIONED BY (day(ts)): timestamp-sourced transform clusters") {
    spark.sql("CREATE TABLE temporal.db.pt (k BIGINT, ts TIMESTAMP) " +
      "USING `graft-iceberg` PARTITIONED BY (day(ts))")
    spark.sql("INSERT INTO temporal.db.pt SELECT /*+ COALESCE(1) */ * " +
      "FROM VALUES (1L, TIMESTAMP'1995-01-10 08:00:00'), " +
      "(2L, TIMESTAMP'1995-01-10 23:59:59'), " +
      "(3L, TIMESTAMP'1995-01-11 00:00:01') AS t(k, ts)")
    val parts = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, "target/tmp-temporal-wh/db/pt", "t", Nil)
      .filter(col("content") === 0)
      .select("partitionKey").collect().map(_.getString(0)).toSeq
    // epoch days: 1995-01-10 = 9140, 1995-01-11 = 9141
    assert(parts.sorted == Seq("{\"ts_day\":9140}", "{\"ts_day\":9141}"),
      parts.toString)
    assert(spark.sql("SELECT sum(k) FROM temporal.db.pt " +
      "WHERE ts < TIMESTAMP'1995-01-11 00:00:00'").head.getLong(0) == 3L)
  }

  test("PARTITIONED BY (month(d)): date-sourced transform clusters and prunes") {
    spark.sql("CREATE TABLE temporal.db.pm (k BIGINT, d DATE) " +
      "USING `graft-iceberg` PARTITIONED BY (month(d))")
    spark.sql("INSERT INTO temporal.db.pm SELECT /*+ COALESCE(1) */ * " +
      "FROM VALUES (1L, DATE'1995-01-10'), (2L, DATE'1995-01-20'), " +
      "(3L, DATE'1995-02-05'), (4L, DATE'1996-01-01') AS t(k, d)")
    val parts = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, "target/tmp-temporal-wh/db/pm", "t", Nil)
      .filter(col("content") === 0)
      .select("partitionKey").collect().map(_.getString(0)).toSeq
    // months since epoch: 1995-01 = 300, 1995-02 = 301, 1996-01 = 312
    assert(parts.sorted == Seq("{\"d_month\":300}", "{\"d_month\":301}",
      "{\"d_month\":312}"), parts.toString)
    assert(spark.sql("SELECT sum(k) FROM temporal.db.pm " +
      "WHERE d BETWEEN DATE'1995-01-01' AND DATE'1995-01-31'")
      .head.getLong(0) == 3L)
  }
}
