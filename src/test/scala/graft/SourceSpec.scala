package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{CatalogOps, FileEntrySource}
import graft.model.TableRef
import graft.functions.GraftFunctions

class SourceSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("TableRef dotted-name split (maxsplit=1)") {
    assert(TableRef.fromFullName("db.tbl") == TableRef("db", "tbl"))
    assert(TableRef.fromFullName("db.tbl.extra") == TableRef("db", "tbl.extra"))
    assert(TableRef.fromFullName("plain") == TableRef("", "plain"))
    assert(TableRef("db", "t").fullName == "db.t")
    assert(TableRef("", "t").fullName == "t")
  }

  test("catalog listing with glob filter") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_test_db")
    spark.sql("CREATE TABLE IF NOT EXISTS graft_test_db.alpha (x INT) USING parquet")
    spark.sql("CREATE TABLE IF NOT EXISTS graft_test_db.beta (x INT) USING parquet")
    try {
      assert(CatalogOps.listDatabases(spark).contains("graft_test_db"))
      assert(CatalogOps.listTables(spark, "graft_test_db") == Seq("alpha", "beta"))
      assert(CatalogOps.listTables(spark, "graft_test_db", "a*") == Seq("alpha"))
      assert(CatalogOps.listTables(spark, "graft_test_db", "?eta") == Seq("beta"))
      // provider filter reads table METADATA (tableType is MANAGED/EXTERNAL,
      // not the provider)
      assert(CatalogOps.listTables(spark, "graft_test_db", "*", Set("parquet"))
        == Seq("alpha", "beta"))
      assert(CatalogOps.listTables(spark, "graft_test_db", "*", Set("iceberg")).isEmpty)
    } finally spark.sql("DROP DATABASE graft_test_db CASCADE")
  }

  test("fromDirectory: hive-partitioned dir becomes file entries") {
    val base = new java.io.File(TestTmp.dir("graft_src"))
    try {
      val p1 = new java.io.File(base, "day=1"); p1.mkdirs()
      val p2 = new java.io.File(base, "day=2/region=eu"); p2.mkdirs()
      java.nio.file.Files.write(new java.io.File(p1, "a.parquet").toPath, Array.fill[Byte](100)(1))
      java.nio.file.Files.write(new java.io.File(p1, "b.parquet").toPath, Array.fill[Byte](50)(1))
      java.nio.file.Files.write(new java.io.File(p2, "c.parquet").toPath, Array.fill[Byte](7)(1))
      java.nio.file.Files.write(new java.io.File(base, "_SUCCESS").toPath, Array.emptyByteArray)
      val entries = FileEntrySource.fromDirectory(spark, base.getAbsolutePath, "t").collect()
      assert(entries.length == 3) // _SUCCESS skipped
      assert(entries.count(_.partitionKey == "Record[day=1]") == 2)
      assert(entries.exists(e => e.partitionKey == "Record[day=2, region=eu]" && e.sizeBytes == 7))
      assert(entries.map(_.sizeBytes).sum == 157)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(base)
    }
  }

  test("canonical key sorts fields") {
    assert(FileEntrySource.canonicalKey(Seq("b" -> "2", "a" -> "1")) == "Record[a=1, b=2]")
    assert(FileEntrySource.canonicalKey(Nil) == "Record[]")
  }

  test("IcebergFilesSource surfaces a clear error without the runtime jar") {
    val e = intercept[IllegalStateException] {
      graft.sources.IcebergFilesSource.fromMetadataTable(spark, "db.tbl")
    }
    assert(e.getMessage.contains("Iceberg runtime not available"))
    assert(e.getMessage.contains("fromDirectory"))
  }

  test("registered SQL functions") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT poly_hash('ab') AS h, format_size(1234.0) AS s, format_duration(5500.0) AS d, read_file_cost(0) AS c")
      .collect()(0)
    assert(r.getLong(0) == (('a'.toLong * 131 + 'b') % 1000000007L))
    assert(r.getString(1) == "1.21 KB")
    assert(r.getString(2) == "5.5s")
    assert(r.getLong(3) == 2)
  }

  test("long_dot native expression matches the higher-order formulation") {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 50).map(_ => (
      Array.fill(64)(rnd.nextLong() % 100000),
      Array.fill(64)(rnd.nextLong() % 100000)))
    val df = spark.createDataset(rows).toDF("a", "b")
    val native = df.select(graft.functions.LongArrayDot.longDot(col("a"), col("b"))).as[Long].collect()
    val hof = df.select(expr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)")).as[Long].collect()
    assert(native.toSeq == hof.toSeq)
    // SQL surface + null propagation + mismatched lengths (min-length rule)
    assert(spark.sql("SELECT long_dot(array(1L,2L,3L), array(4L,5L,6L))").collect()(0).getLong(0) == 32L)
    assert(spark.sql("SELECT long_dot(array(1L,2L), array(4L,5L,6L))").collect()(0).getLong(0) == 14L)
    assert(spark.sql("SELECT long_dot(CAST(NULL AS ARRAY<BIGINT>), array(1L))").collect()(0).isNullAt(0))
    // a null ELEMENT null-propagates (same as the zip_with formulation)
    assert(spark.sql("SELECT long_dot(array(1L, NULL), array(2L, 3L))").collect()(0).isNullAt(0))
    // wrong arity: clear error, not IndexOutOfBounds
    val err = intercept[Exception] { spark.sql("SELECT long_dot(array(1L))").collect() }
    assert(err.getMessage.contains("requires 2 argument"))
  }

  test("fromDirectories (distributed listing) == per-table fromDirectory union") {
    val tables = graft.sources.TableDiscovery.list(
      spark.sparkContext.hadoopConfiguration, "/root/testdata/sf0.001")
    assert(tables.size >= 5)
    val distributed = FileEntrySource.fromDirectories(spark, tables)
      .collect().sortBy(e => (e.table, e.partitionKey, e.sizeBytes)).toSeq
    val driver = tables
      .map { case (n, p) => FileEntrySource.fromDirectory(spark, p, n) }
      .reduce(_ union _)
      .collect().sortBy(e => (e.table, e.partitionKey, e.sizeBytes)).toSeq
    assert(distributed.nonEmpty)
    assert(distributed == driver)
  }

  test("poly_hash native expression matches DuckDB list_reduce semantics") {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    // fold with first element as seed == fold from 0 since c < mod
    val got = spark.createDataset(Seq("spark", "", "The quick brown fox"))
      .toDF("s").selectExpr("poly_hash(s)").as[Long].collect()
    def ref(s: String) = s.foldLeft(0L)((h, c) => (h * 131 + c) % 1000000007L)
    assert(got.toSeq == Seq(ref("spark"), ref(""), ref("The quick brown fox")))
  }
}
