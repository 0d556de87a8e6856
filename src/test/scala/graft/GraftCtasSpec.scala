package graft

import org.scalatest.funsuite.AnyFunSuite

/** Atomic CTAS / RTAS through StagingTableCatalog: the query writes
  * into the staged table first, visibility is one commit — a failed
  * query leaves nothing behind, and REPLACE TABLE AS SELECT keeps the
  * snapshot history time-travelable (Iceberg's RTAS shape). */
class GraftCtasSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSpec.spark
    val wh = new java.io.File("target/tmp-ctas-wh")
    org.apache.commons.io.FileUtils.deleteQuietly(wh)
    s.conf.set("spark.sql.catalog.ctas",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.ctas.warehouse", wh.getAbsolutePath)
    s.sql("CREATE NAMESPACE IF NOT EXISTS ctas.db")
    s
  }

  test("CTAS lands data atomically; USING graft-iceberg") {
    spark.sql("DROP TABLE IF EXISTS ctas.db.a")
    spark.sql("CREATE TABLE ctas.db.a USING `graft-iceberg` AS " +
      "SELECT id AS k, id * 2 AS v FROM range(10)")
    assert(spark.sql("SELECT sum(k), sum(v) FROM ctas.db.a").head.toSeq ==
      Seq(45L, 90L))
  }

  test("RTAS replaces content, preserves history for time travel") {
    spark.sql("DROP TABLE IF EXISTS ctas.db.r")
    spark.sql("CREATE TABLE ctas.db.r USING `graft-iceberg` AS " +
      "SELECT id AS k FROM range(5)")
    val snapBefore = spark.sql(
      "SELECT max(snapshot_id) FROM ctas.db.r.snapshots").head.getLong(0)
    spark.sql("REPLACE TABLE ctas.db.r USING `graft-iceberg` AS " +
      "SELECT id + 100 AS k FROM range(3)")
    assert(spark.sql("SELECT min(k), count(*) FROM ctas.db.r").head.toSeq ==
      Seq(100L, 3L))
    // the pre-replace snapshot is still reachable: Iceberg's RTAS keeps
    // history (the replace is one group-replace snapshot, not a new table)
    val old = spark.sql(
      s"SELECT min(k), count(*) FROM ctas.db.r VERSION AS OF $snapBefore")
      .head.toSeq
    assert(old == Seq(0L, 5L), s"pre-replace state must time-travel, got $old")
  }

  test("REPLACE on a missing table errors; CREATE OR REPLACE creates") {
    spark.sql("DROP TABLE IF EXISTS ctas.db.corc")
    intercept[Exception] {
      spark.sql("REPLACE TABLE ctas.db.corc USING `graft-iceberg` AS " +
        "SELECT 1 AS x")
    }
    spark.sql("CREATE OR REPLACE TABLE ctas.db.corc USING `graft-iceberg` " +
      "AS SELECT 1 AS x")
    assert(spark.sql("SELECT x FROM ctas.db.corc").head.getInt(0) == 1)
  }

  test("failed CTAS leaves no table behind (staging atomicity)") {
    spark.sql("DROP TABLE IF EXISTS ctas.db.boom")
    intercept[Exception] {
      spark.sql("CREATE TABLE ctas.db.boom USING `graft-iceberg` AS " +
        "SELECT raise_error('mid-query failure') AS x FROM range(1)")
    }
    val tables = spark.sql("SHOW TABLES IN ctas.db").collect()
      .map(_.getString(1)).toSet
    assert(!tables.contains("boom"), "aborted CTAS must leave nothing")
    // and the slot is reusable
    spark.sql("CREATE TABLE ctas.db.boom USING `graft-iceberg` AS " +
      "SELECT 7 AS x")
    assert(spark.sql("SELECT x FROM ctas.db.boom").head.getInt(0) == 7)
  }

  test("partitioned CTAS records the spec; pruning-ready from birth") {
    spark.sql("DROP TABLE IF EXISTS ctas.db.part")
    spark.sql("CREATE TABLE ctas.db.part USING `graft-iceberg` " +
      "PARTITIONED BY (p) AS " +
      "SELECT id AS k, id % 3 AS p FROM range(9)")
    val parts = spark.sql("SELECT partition FROM ctas.db.part.partitions")
      .collect().map(_.getString(0)).toSet
    assert(parts.size == 3, s"three partition values expected, got $parts")
    assert(spark.sql("SELECT count(*) FROM ctas.db.part WHERE p = 1")
      .head.getLong(0) == 3L)
  }
}
