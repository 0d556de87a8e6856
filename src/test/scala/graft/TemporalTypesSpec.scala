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

  for (fmt <- Seq("parquet", "orc", "avro")) {
    test(s"decimal(38,10) wide values round-trip exactly in $fmt") {
      val tbl = s"temporal.db.wide_$fmt"
      spark.sql(s"CREATE TABLE $tbl (k BIGINT, v DECIMAL(38,10)) " +
        "USING `graft-iceberg` TBLPROPERTIES (" +
        s"'write.format.default' = '$fmt', " +
        "'write.delete.mode' = 'merge-on-read')")
      // values past ANY long-backed range: 28 integer digits + 10
      // fractional, negatives, and the exact max/min unscaled magnitudes
      val big = "9999999999999999999999999999.9999999999"
      spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
        s"(1L, CAST('$big' AS DECIMAL(38,10)))," +
        s"(2L, CAST('-$big' AS DECIMAL(38,10)))," +
        "(3L, CAST('1234567890123456789.0123456789' AS DECIMAL(38,10)))," +
        "(4L, CAST('-0.0000000001' AS DECIMAL(38,10)))," +
        "(5L, CAST(NULL AS DECIMAL(38,10))) AS t(k, v)")
      val rows = spark.sql(
        s"SELECT k, CAST(v AS STRING) FROM $tbl ORDER BY k").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("-")))
      assert(rows.toSeq == Seq(
        (1L, big), (2L, s"-$big"),
        (3L, "1234567890123456789.0123456789"),
        (4L, "-0.0000000001"), (5L, "-")), rows.mkString(", "))
      // wide-decimal predicate MOR delete applies across the format
      spark.sql(s"DELETE FROM $tbl WHERE v < CAST(0 AS DECIMAL(38,10))")
      assert(spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect()
        .map(_.getLong(0)).toSeq == Seq(1L, 3L, 5L))
      val dir = s"target/tmp-temporal-wh/db/wide_$fmt"
      val fmts = graft.sources.IcebergManifestSource
        .statsFromTableDir(spark, dir, "t", Nil)
        .filter(col("content") === 0)
        .select("file_format").collect().map(_.getString(0)).toSet
      assert(fmts == Set(fmt.toUpperCase), fmts.toString)
    }
  }

  for (fmt <- Seq("parquet", "orc", "avro")) {
    test(s"TIMESTAMP_NTZ round-trips exactly + MOR delete in $fmt") {
      val tbl = s"temporal.db.ntz_$fmt"
      spark.sql(s"CREATE TABLE $tbl (k BIGINT, ts TIMESTAMP_NTZ) " +
        "USING `graft-iceberg` TBLPROPERTIES (" +
        s"'write.format.default' = '$fmt', " +
        "'write.delete.mode' = 'merge-on-read')")
      spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
        "(1L, TIMESTAMP_NTZ'1995-03-15 10:30:00.123456'), " +
        "(2L, TIMESTAMP_NTZ'1969-12-31 23:59:59.999999'), " +
        "(3L, CAST(NULL AS TIMESTAMP_NTZ)) AS t(k, ts)")
      val rows = spark.sql(
        s"SELECT k, CAST(ts AS STRING) FROM $tbl ORDER BY k").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("-")))
      assert(rows.toSeq == Seq(
        (1L, "1995-03-15 10:30:00.123456"),
        (2L, "1969-12-31 23:59:59.999999"), (3L, "-")), rows.mkString(", "))
      // NTZ-predicate MOR delete
      spark.sql(s"DELETE FROM $tbl WHERE ts < TIMESTAMP_NTZ'1970-01-01 00:00:00'")
      assert(spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect()
        .map(_.getLong(0)).toSeq == Seq(1L, 3L))
      val fmts = graft.sources.IcebergManifestSource
        .statsFromTableDir(spark, s"target/tmp-temporal-wh/db/ntz_$fmt",
          "t", Nil)
        .filter(col("content") === 0)
        .select("file_format").collect().map(_.getString(0)).toSet
      assert(fmts == Set(fmt.toUpperCase), fmts.toString)
    }
  }

  // spec `time` (microseconds from midnight — Spark 4's TimeType
  // behind spark.sql.timeType.enabled): parquet INT64 time-micros,
  // ORC long dialect, avro time-micros; the internal NANOS value
  // converts at the format boundary both ways.
  for (fmt <- Seq("parquet", "orc", "avro")) {
    test(s"TIME round-trips + MOR delete in $fmt") {
      spark.conf.set("spark.sql.timeType.enabled", "true")
      val tbl = s"temporal.db.time_$fmt"
      spark.sql(s"CREATE TABLE $tbl (k BIGINT, t TIME(6)) " +
        "USING `graft-iceberg` TBLPROPERTIES (" +
        s"'write.format.default' = '$fmt', " +
        "'write.delete.mode' = 'merge-on-read')")
      spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
        "(1L, TIME'00:00:00'), " +
        "(2L, TIME'09:30:15.123456'), " +
        "(3L, TIME'12:00:00'), " +
        "(4L, TIME'23:59:59.999999'), " +
        "(5L, CAST(NULL AS TIME)) AS v(k, t)")
      val got = spark.sql(
        s"SELECT k, CAST(t AS STRING) FROM $tbl ORDER BY k").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
        .toSeq
      assert(got == Seq((1L, "00:00:00"), (2L, "09:30:15.123456"),
        (3L, "12:00:00"), (4L, "23:59:59.999999"), (5L, null)),
        s"$fmt: $got")
      // MOR delete by a TIME predicate — the residual decodes micros
      spark.sql(s"DELETE FROM $tbl WHERE t < TIME'10:00:00'")
      val kept = spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect()
        .map(_.getLong(0)).toSeq
      assert(kept == Seq(3L, 4L, 5L), kept.toString)
    }
  }

  test("mixed-format TIME tables survive rewrite_data_files") {
    // the parquet arm surfaces TIME while the ORC/AVRO dialects store
    // micros-as-LONG — MorRead rebuilds TIME from the long arms so the
    // union types agree and maintenance rewrites preserve values
    spark.conf.set("spark.sql.timeType.enabled", "true")
    val tbl = "temporal.db.timemix"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, t TIME(6)) " +
      "USING `graft-iceberg` TBLPROPERTIES (" +
      "'write.format.default' = 'parquet')")
    spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
      "(1L, TIME'01:02:03'), (2L, TIME'04:05:06.500000') AS v(k, t)")
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES (" +
      "'write.format.default' = 'orc')")
    spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
      "(3L, TIME'07:08:09') AS v(k, t)")
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES (" +
      "'write.format.default' = 'avro')")
    spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
      "(4L, TIME'23:59:59.000001') AS v(k, t)")
    spark.sql("CALL temporal.system.rewrite_data_files('db.timemix')")
    val want = Seq((1L, "01:02:03"), (2L, "04:05:06.5"),
      (3L, "07:08:09"), (4L, "23:59:59.000001"))
    def state() = spark.sql(
      s"SELECT k, CAST(t AS STRING) FROM $tbl ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(state() == want, state().toString)
    // a SECOND rewrite under an ORC default exercises that output arm
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES (" +
      "'write.format.default' = 'orc')")
    spark.sql("CALL temporal.system.rewrite_data_files('db.timemix')")
    assert(state() == want, s"ORC rewrite arm: ${state()}")
  }

  test("NESTED TIME survives a rewrite onto the ORC long dialect") {
    // maintenance rewrites route through Spark's native ORC writer,
    // which has no TIME case — orcWritable must rewrite TIME to the
    // long dialect at ANY nesting depth, not just top level
    spark.conf.set("spark.sql.timeType.enabled", "true")
    val tbl = "temporal.db.timenest"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, " +
      "s STRUCT<label: STRING, at: TIME(6)>, " +
      "ts ARRAY<TIME(6)>) USING `graft-iceberg` TBLPROPERTIES (" +
      "'write.format.default' = 'parquet')")
    spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
      "(1L, named_struct('label', 'open', 'at', TIME'09:30:00'), " +
      "  array(TIME'01:02:03', TIME'04:05:06.500000')), " +
      "(2L, named_struct('label', 'close', 'at', TIME'16:00:00.000001'), " +
      "  array(TIME'23:59:59')), " +
      "(3L, CAST(NULL AS STRUCT<label: STRING, at: TIME(6)>), " +
      "  CAST(NULL AS ARRAY<TIME(6)>)) AS v(k, s, ts)")
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES (" +
      "'write.format.default' = 'orc')")
    spark.sql("CALL temporal.system.rewrite_data_files('db.timenest')")
    // the rewritten file really is ORC
    val fmts = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, "target/tmp-temporal-wh/db/timenest",
        "t", Nil)
      .filter(col("content") === 0)
      .select("file_format").collect().map(_.getString(0)).toSet
    assert(fmts == Set("ORC"), fmts.toString)
    val got = spark.sql(
      s"SELECT k, s.label, CAST(s.at AS STRING), " +
        s"CAST(ts[0] AS STRING) FROM $tbl ORDER BY k").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("-"),
        Option(r.getString(2)).getOrElse("-"),
        Option(r.getString(3)).getOrElse("-"))).toSeq
    assert(got == Seq(
      (1L, "open", "09:30:00", "01:02:03"),
      (2L, "close", "16:00:00.000001", "23:59:59"),
      (3L, "-", "-", "-")), got.mkString(", "))
  }

  test("MIXED-format nested TIME unions in MorRead and survives rewrite") {
    // parquet files surface struct<at: TIME> natively while the ORC/AVRO
    // dialects arrive as struct<at: BIGINT micros> — MorRead's nested
    // timeDecode rebuilds the declared type so the arms union
    spark.conf.set("spark.sql.timeType.enabled", "true")
    val tbl = "temporal.db.timenestmix"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, " +
      "s STRUCT<label: STRING, at: TIME(6)>) USING `graft-iceberg` " +
      "TBLPROPERTIES ('write.format.default' = 'parquet')")
    spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
      "(1L, named_struct('label', 'a', 'at', TIME'01:02:03')) AS v(k, s)")
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES (" +
      "'write.format.default' = 'orc')")
    spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
      "(2L, named_struct('label', 'b', 'at', TIME'12:34:56.500000')) " +
      "AS v(k, s)")
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES (" +
      "'write.format.default' = 'avro')")
    spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
      "(3L, named_struct('label', 'c', 'at', TIME'23:59:59.000001')), " +
      "(4L, CAST(NULL AS STRUCT<label: STRING, at: TIME(6)>)) AS v(k, s)")
    val want = Seq((1L, "01:02:03"), (2L, "12:34:56.5"),
      (3L, "23:59:59.000001"), (4L, "-"))
    def state() = spark.sql(
      s"SELECT k, coalesce(CAST(s.at AS STRING), '-') FROM $tbl ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(state() == want, state().toString)
    // the MorRead union across all three arms (the rewrite reads it)
    val viaMor = graft.sources.MorRead
      .readTable(spark, "target/tmp-temporal-wh/db/timenestmix")
      .selectExpr("k", "coalesce(CAST(s.at AS STRING), '-')")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(viaMor == want, viaMor.toString)
    spark.sql("CALL temporal.system.rewrite_data_files('db.timenestmix')")
    assert(state() == want, s"post-rewrite: ${state()}")
  }

  test("PARTITIONED BY (month(ntz)): naive-timestamp transform clusters") {
    spark.sql("CREATE TABLE temporal.db.pn (k BIGINT, ts TIMESTAMP_NTZ) " +
      "USING `graft-iceberg` PARTITIONED BY (month(ts))")
    spark.sql("INSERT INTO temporal.db.pn SELECT /*+ COALESCE(1) */ * " +
      "FROM VALUES (1L, TIMESTAMP_NTZ'1995-01-10 08:00:00'), " +
      "(2L, TIMESTAMP_NTZ'1995-02-20 23:59:59'), " +
      "(3L, TIMESTAMP_NTZ'1995-02-25 00:00:01') AS t(k, ts)")
    val parts = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, "target/tmp-temporal-wh/db/pn", "t", Nil)
      .filter(col("content") === 0)
      .select("partitionKey").collect().map(_.getString(0)).toSeq
    // months since epoch: 1995-01 = 300, 1995-02 = 301
    assert(parts.sorted == Seq("{\"ts_month\":300}", "{\"ts_month\":301}"),
      parts.toString)
    assert(spark.sql("SELECT sum(k) FROM temporal.db.pn " +
      "WHERE ts < TIMESTAMP_NTZ'1995-02-01 00:00:00'").head.getLong(0) == 1L)
  }

  test("decimal fixed-width encoding: spec minimums per precision") {
    import graft.sources.v2.GraftFormatWriters.decimalFixedBytes
    // spec Appendix A reference points
    assert(decimalFixedBytes(1) == 1)
    assert(decimalFixedBytes(2) == 1)
    assert(decimalFixedBytes(9) == 4)
    assert(decimalFixedBytes(18) == 8)
    assert(decimalFixedBytes(19) == 9)
    assert(decimalFixedBytes(38) == 16)
    import graft.sources.v2.GraftFormatWriters.signExtend
    val neg = new java.math.BigInteger("-1")
    assert(signExtend(neg, 4).toSeq == Seq[Byte](-1, -1, -1, -1))
    val one = java.math.BigInteger.ONE
    assert(signExtend(one, 4).toSeq == Seq[Byte](0, 0, 0, 1))
    // round-trip: sign-extension never changes the value
    for (s <- Seq("-12345678901234567890", "12345678901234567890", "0")) {
      val bi = new java.math.BigInteger(s)
      assert(new java.math.BigInteger(signExtend(bi, 16)) == bi)
    }
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
