package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.ParquetFooterAudit

/** Footer-only storage audit: numbers must agree with the file's own
  * schema/row count/physical size — the same cells DuckDB's
  * parquet_metadata() exposes. */
class FooterAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("per-column rows/bytes line up with schema, count, and file size") {
    val li = new java.io.File(dir, "lineitem.parquet")
    val rows = ParquetFooterAudit
      .audit(spark, Seq(("lineitem", li.getAbsolutePath))).collect()
    val schemaCols = spark.read.parquet(li.getPath).columns.toSet
    assert(rows.map(_.getString(1)).toSet == schemaCols,
      "audit must cover exactly the schema's columns")
    val n = spark.read.parquet(li.getPath).count()
    assert(rows.forall(_.getLong(3) == n), "per-column rows == table rows")
    val compressedSum = rows.map(_.getLong(4)).sum
    assert(compressedSum > 0 && compressedSum <= li.length(),
      s"column chunks ($compressedSum B) must fit inside the file (${li.length()} B)")
    assert(rows.forall(r => r.getLong(5) > 0), "uncompressed bytes present")
  }

  test("written fixture: audit sees the rows and row groups we wrote") {
    import spark.implicits._
    val f = new java.io.File("target/tmp-footer-fixture")
    org.apache.commons.io.FileUtils.deleteQuietly(f)
    (1L to 1000L).map(i => (i, s"v$i", i * 2.0)).toDF("a", "b", "c")
      .coalesce(1).write.mode("overwrite").parquet(f.getPath)
    val parts = org.apache.commons.io.FileUtils
      .listFiles(f, Array("parquet"), true)
      .toArray(Array.empty[java.io.File]).toSeq
    val rows = ParquetFooterAudit
      .audit(spark, parts.map(p => ("fx", p.getAbsolutePath))).collect()
    assert(rows.map(_.getString(1)).toSet == Set("a", "b", "c"))
    assert(rows.forall(_.getLong(3) == 1000L))
    assert(rows.forall(_.getLong(2) >= 1L))
  }
}
