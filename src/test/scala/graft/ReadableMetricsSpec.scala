package graft

import org.scalatest.funsuite.AnyFunSuite

/** `readable_metrics` on $files/$entries: Iceberg's standard nested
  * per-column metrics struct, served from the manifests' recorded
  * bounds (rendered at the column type) and the spec 109/110/137
  * value / null / NaN counts the connector's writers record. */
class ReadableMetricsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSpec.spark
    val wh = new java.io.File("target/tmp-rmx-wh")
    org.apache.commons.io.FileUtils.deleteQuietly(wh)
    s.conf.set("spark.sql.catalog.rmx",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.rmx.warehouse", wh.getAbsolutePath)
    s.sql("CREATE NAMESPACE IF NOT EXISTS rmx.db")
    s
  }

  test("value/null/NaN counts and typed bounds per column") {
    spark.sql("CREATE TABLE rmx.db.t (k BIGINT, s STRING, x DOUBLE) " +
      "USING `graft-iceberg` " +
      "TBLPROPERTIES ('pushdown.fields' = 'k:1:long')")
    spark.sql("INSERT INTO rmx.db.t SELECT /*+ COALESCE(1) */ * FROM VALUES " +
      "(1L, 'a', 1.5D), " +
      "(2L, CAST(NULL AS STRING), CAST('NaN' AS DOUBLE)), " +
      "(3L, 'c', CAST(NULL AS DOUBLE)), " +
      "(4L, 'd', 2.5D) AS t(k, s, x)")
    val r = spark.sql(
      """SELECT record_count,
        |  readable_metrics.k.value_count,
        |  readable_metrics.k.null_value_count,
        |  readable_metrics.k.nan_value_count,
        |  readable_metrics.s.null_value_count,
        |  readable_metrics.x.null_value_count,
        |  readable_metrics.x.nan_value_count,
        |  readable_metrics.k.lower_bound,
        |  readable_metrics.k.upper_bound
        |FROM rmx.db.t.files WHERE content = 0""".stripMargin).head
    assert(r.getLong(0) == 4L)
    assert(r.getLong(1) == 4L && r.getLong(2) == 0L, "k counts")
    // NaN counts cover FLOAT/DOUBLE only: k (BIGINT) serves null
    assert(r.isNullAt(3), "k nan_value_count must be null (not float)")
    assert(r.getLong(4) == 1L, "s has one null")
    assert(r.getLong(5) == 1L && r.getLong(6) == 1L, "x null + NaN")
    // bounds render at the column type (k declared a stat field)
    assert(r.getLong(7) == 1L && r.getLong(8) == 4L, "k bounds")
    // column_size (spec 108): parquet footer column-chunk bytes —
    // positive per column, summing to less than the whole file
    val sizes = spark.sql(
      """SELECT file_size_in_bytes,
        |  readable_metrics.k.column_size,
        |  readable_metrics.s.column_size,
        |  readable_metrics.x.column_size
        |FROM rmx.db.t.files WHERE content = 0""".stripMargin).head
    val colSum = (1 to 3).map(sizes.getLong).sum
    assert((1 to 3).forall(i => sizes.getLong(i) > 0L) &&
      colSum < sizes.getLong(0),
      s"column sizes must be positive and sum under the file: $sizes")
    // counts SURVIVE an identity carry: a second commit re-files the
    // first file's entry and the metrics still serve
    spark.sql("INSERT INTO rmx.db.t SELECT /*+ COALESCE(1) */ * FROM " +
      "VALUES (5L, 'e', 3.5D) AS t(k, s, x)")
    val vc = spark.sql(
      "SELECT readable_metrics.k.value_count FROM rmx.db.t.files " +
        "WHERE content = 0 ORDER BY record_count DESC").collect()
      .map(r2 => if (r2.isNullAt(0)) -1L else r2.getLong(0)).toSeq
    assert(vc == Seq(4L, 1L), s"counts must survive the carry: $vc")
    // $entries serves the same struct
    val ec = spark.sql(
      "SELECT readable_metrics.x.nan_value_count FROM rmx.db.t.entries " +
        "WHERE content = 0 AND record_count = 4").head
    assert(ec.getLong(0) == 1L)
  }

  test("struct leaves render readable_metrics keyed by LEAF field id") {
    spark.sql("CREATE TABLE rmx.db.n (k BIGINT, " +
      "s STRUCT<a: BIGINT, b: STRING>) USING `graft-iceberg`")
    spark.sql("INSERT INTO rmx.db.n SELECT /*+ COALESCE(1) */ * FROM VALUES " +
      "(1L, named_struct('a', 10L, 'b', 'x')), " +
      "(2L, named_struct('a', 30L, 'b', CAST(NULL AS STRING))), " +
      "(3L, CAST(NULL AS STRUCT<a: BIGINT, b: STRING>)) AS t(k, s)")
    val r = spark.sql(
      """SELECT readable_metrics.`s.a`.lower_bound,
        |  readable_metrics.`s.a`.upper_bound,
        |  readable_metrics.`s.a`.value_count,
        |  readable_metrics.`s.a`.null_value_count,
        |  readable_metrics.`s.b`.value_count,
        |  readable_metrics.`s.b`.null_value_count,
        |  readable_metrics.k.value_count
        |FROM rmx.db.n.files WHERE content = 0""".stripMargin).head
    assert(r.getLong(0) == 10L && r.getLong(1) == 30L, s"s.a bounds: $r")
    // value_count counts rows where the PARENT is present; nulls among
    // them are null_value_count (the struct-null row counts in neither)
    assert(r.getLong(2) == 2L && r.getLong(3) == 0L, s"s.a counts: $r")
    assert(r.getLong(4) == 2L && r.getLong(5) == 1L, s"s.b counts: $r")
    assert(r.getLong(6) == 3L, s"top-level unchanged: $r")
  }

  test("ORC files record column_sizes from stripe stream lengths") {
    spark.sql("CREATE TABLE rmx.db.o (k BIGINT, s STRING, x DOUBLE) " +
      "USING `graft-iceberg` " +
      "TBLPROPERTIES ('write.format.default' = 'orc')")
    spark.sql("INSERT INTO rmx.db.o SELECT /*+ COALESCE(1) */ id, " +
      "concat('name-', id), id * 1.5 FROM range(0, 1000)")
    val r = spark.sql(
      """SELECT file_size_in_bytes,
        |  readable_metrics.k.column_size,
        |  readable_metrics.s.column_size,
        |  readable_metrics.x.column_size,
        |  readable_metrics.k.value_count,
        |  readable_metrics.s.null_value_count
        |FROM rmx.db.o.files WHERE content = 0""".stripMargin).head
    val colSum = (1 to 3).map(r.getLong).sum
    assert((1 to 3).forall(i => r.getLong(i) > 0L) &&
      colSum <= r.getLong(0),
      s"ORC column sizes must be positive and bounded by the file: $r")
    assert(r.getLong(4) == 1000L && r.getLong(5) == 0L, s"counts: $r")
    // the file really is ORC (the sizes came from stripe footers)
    val fmt = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, "target/tmp-rmx-wh/db/o", "t", Nil)
      .filter(org.apache.spark.sql.functions.col("content") === 0)
      .select("file_format").head.getString(0)
    assert(fmt == "ORC")
  }

  test("declared stat ids divergent from position still serve counts") {
    // b's declared stat id (7) differs from its positional id (2):
    // bounds AND counts/column_sizes must all key under the DECLARED id,
    // or the metrics reader resolves bounds but serves null counts
    spark.sql("CREATE TABLE rmx.db.d (a BIGINT, b BIGINT) " +
      "USING `graft-iceberg` " +
      "TBLPROPERTIES ('pushdown.fields' = 'b:7:long')")
    spark.sql("INSERT INTO rmx.db.d SELECT /*+ COALESCE(1) */ * FROM VALUES " +
      "(1L, 10L), (2L, CAST(NULL AS BIGINT)), (3L, 30L) AS t(a, b)")
    val r = spark.sql(
      """SELECT readable_metrics.b.value_count,
        |  readable_metrics.b.null_value_count,
        |  readable_metrics.b.column_size,
        |  readable_metrics.b.lower_bound,
        |  readable_metrics.b.upper_bound,
        |  readable_metrics.a.value_count,
        |  readable_metrics.a.null_value_count
        |FROM rmx.db.d.files WHERE content = 0""".stripMargin).head
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L,
      s"b counts under declared id 7: $r")
    assert(r.getLong(2) > 0L, s"b column_size under declared id 7: $r")
    assert(r.getLong(3) == 10L && r.getLong(4) == 30L, s"b bounds: $r")
    assert(r.getLong(5) == 3L && r.getLong(6) == 0L,
      s"a counts under the positional id: $r")
  }
}
