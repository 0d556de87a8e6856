package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.v2.{GraftRefDdl, GraftRefDdlCommand, GraftWriteDdl,
  GraftWriteDdlCommand}

/** Parse-level edges of the ALTER TABLE extension grammars (ref DDL +
  * write-layout DDL): clause math, guard variants, trailing-garbage
  * refusal, and non-graft passthrough (None → the delegate parser). */
class RefDdlParseSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSpec.spark
    val wh = new java.io.File("target/tmp-refparse-wh")
    org.apache.commons.io.FileUtils.deleteQuietly(wh)
    s.conf.set("spark.sql.catalog.refp",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.refp.warehouse", wh.getAbsolutePath)
    s.sql("CREATE NAMESPACE IF NOT EXISTS refp.db")
    s
  }

  private def ref(sql: String): GraftRefDdlCommand =
    GraftRefDdl.parse(spark, sql).get.asInstanceOf[GraftRefDdlCommand]
  private def wr(sql: String): GraftWriteDdlCommand =
    GraftWriteDdl.parse(spark, sql).get.asInstanceOf[GraftWriteDdlCommand]

  test("RETAIN units convert to max-ref-age-ms exactly") {
    assert(ref("ALTER TABLE refp.db.t CREATE TAG x RETAIN 3 DAYS")
      .maxRefAgeMs.contains(3L * 24 * 3600 * 1000))
    assert(ref("ALTER TABLE refp.db.t CREATE TAG x RETAIN 5 HOURS")
      .maxRefAgeMs.contains(5L * 3600 * 1000))
    assert(ref("ALTER TABLE refp.db.t CREATE BRANCH x RETAIN 90 MINUTES")
      .maxRefAgeMs.contains(90L * 60 * 1000))
  }

  test("guards and clause composition parse field-exactly") {
    val c = ref("ALTER TABLE refp.db.t CREATE OR REPLACE BRANCH b " +
      "AS OF VERSION 7 RETAIN 1 DAYS WITH SNAPSHOT RETENTION 4 SNAPSHOTS 2 DAYS")
    assert(c.op == "create or replace" && c.kind == "branch" &&
      c.refName == "b" && c.asOfVersion.contains(7L) &&
      c.minSnapshotsToKeep.contains(4) &&
      c.maxSnapshotAgeMs.contains(2L * 24 * 3600 * 1000))
    assert(ref("ALTER TABLE refp.db.t CREATE BRANCH IF NOT EXISTS b")
      .ifNotExists)
    assert(ref("ALTER TABLE refp.db.t DROP TAG IF EXISTS b").ifExists)
    assert(ref("ALTER TABLE refp.db.t CREATE BRANCH `quoted`")
      .refName == "quoted")
  }

  test("trailing garbage and wrong guards refuse at parse time") {
    intercept[Exception] {
      ref("ALTER TABLE refp.db.t CREATE BRANCH b SOMETHING ELSE") }
    intercept[Exception] {
      ref("ALTER TABLE refp.db.t DROP BRANCH IF NOT EXISTS b") }
    intercept[Exception] {
      ref("ALTER TABLE refp.db.t CREATE TAG IF EXISTS b") }
  }

  test("write DDL maps clauses onto the write-planning properties") {
    val a = wr("ALTER TABLE refp.db.t WRITE ORDERED BY a, b")
    assert(a.sortCols == Seq("a", "b") &&
      a.distributionMode.contains("range"))
    val l = wr("ALTER TABLE refp.db.t WRITE LOCALLY ORDERED BY a")
    assert(l.sortCols == Seq("a") && l.distributionMode.contains("none"))
    val d = wr("ALTER TABLE refp.db.t WRITE DISTRIBUTED BY PARTITION")
    assert(d.sortCols.isEmpty && d.distributionMode.contains("hash"))
    val dl = wr("ALTER TABLE refp.db.t WRITE DISTRIBUTED BY PARTITION " +
      "LOCALLY ORDERED BY c")
    assert(dl.sortCols == Seq("c") && dl.distributionMode.contains("hash"))
    val u = wr("ALTER TABLE refp.db.t WRITE UNORDERED")
    assert(u.clearSort && u.distributionMode.contains("none"))
    assert(wr("ALTER TABLE refp.db.t WRITE ORDERED BY a ASC NULLS FIRST")
      .sortCols == Seq("a"))
    intercept[Exception] {
      wr("ALTER TABLE refp.db.t WRITE ORDERED BY a DESC") }
  }

  test("non-ref statements and non-graft catalogs pass through as None") {
    assert(GraftRefDdl.parse(spark,
      "ALTER TABLE refp.db.t SET TBLPROPERTIES ('a'='b')").isEmpty)
    assert(GraftRefDdl.parse(spark, "SELECT 1").isEmpty)
    assert(GraftRefDdl.parse(spark,
      "ALTER TABLE spark_catalog.default.x CREATE BRANCH b").isEmpty)
    assert(GraftWriteDdl.parse(spark,
      "ALTER TABLE spark_catalog.default.x WRITE UNORDERED").isEmpty)
    assert(GraftWriteDdl.parse(spark,
      "ALTER TABLE refp.db.t WRITE").isEmpty) // bare WRITE: delegate
  }
}
