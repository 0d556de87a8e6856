package graft

import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition overwrite (SupportsDynamicOverwrite): INSERT
  * OVERWRITE in dynamic mode and df.writeTo(...).overwritePartitions()
  * replace exactly the touched partitions. */
class DynOverwriteSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSpec.spark
    val wh = new java.io.File("target/tmp-dynov-wh")
    org.apache.commons.io.FileUtils.deleteQuietly(wh)
    s.conf.set("spark.sql.catalog.dyno",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.dyno.warehouse", wh.getAbsolutePath)
    s.sql("CREATE NAMESPACE IF NOT EXISTS dyno.db")
    s
  }

  test("INSERT OVERWRITE dynamic mode replaces only touched partitions") {
    spark.sql("DROP TABLE IF EXISTS dyno.db.t")
    spark.sql("CREATE TABLE dyno.db.t (k BIGINT, part BIGINT) " +
      "USING `graft-iceberg` PARTITIONED BY (part)")
    spark.sql("INSERT INTO dyno.db.t VALUES (1, 10), (2, 20), (3, 30)")
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.sql("INSERT OVERWRITE dyno.db.t VALUES (9, 20)")
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    val out = spark.sql("SELECT k, part FROM dyno.db.t ORDER BY part, k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 10L), (9L, 20L), (3L, 30L)), s"got $out")
  }

  test("dynamic overwrite past the planning ceiling: distributed touched-file listing") {
    spark.sql("DROP TABLE IF EXISTS dyno.db.big")
    spark.sql("CREATE TABLE dyno.db.big (k BIGINT, part BIGINT) " +
      "USING `graft-iceberg` PARTITIONED BY (part)")
    spark.sql("INSERT INTO dyno.db.big VALUES (1, 10), (2, 20), (3, 30)")
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    spark.conf.set("spark.graft.maxDriverFileEntries", "2") // toy cap
    try spark.sql("INSERT OVERWRITE dyno.db.big VALUES (9, 20), (8, 30)")
    finally {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
      spark.conf.unset("spark.graft.maxDriverFileEntries")
    }
    val out = spark.sql("SELECT k, part FROM dyno.db.big ORDER BY part, k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 10L), (9L, 20L), (8L, 30L)), s"got $out")
  }

  test("writeTo(...).overwritePartitions() takes the same path") {
    spark.sql("DROP TABLE IF EXISTS dyno.db.w")
    spark.sql("CREATE TABLE dyno.db.w (k BIGINT, part BIGINT) " +
      "USING `graft-iceberg` PARTITIONED BY (part)")
    spark.sql("INSERT INTO dyno.db.w VALUES (1, 10), (2, 20)")
    import spark.implicits._
    Seq((7L, 10L)).toDF("k", "part").writeTo("dyno.db.w").overwritePartitions()
    val out = spark.sql("SELECT k, part FROM dyno.db.w ORDER BY part")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((7L, 10L), (2L, 20L)), s"got $out")
  }
}
