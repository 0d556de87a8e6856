package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** `write.distribution-mode` (none | hash | range) through Spark's own
  * RequiresDistributionAndOrdering SPI: the TABLE declares the write
  * layout, Spark plans the exchange. hash → one file per partition
  * value; none → no pre-write shuffle (files multiply with input
  * parallelism); range → output files carry disjoint sort ranges. */
class DistributionModeSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSpec.spark
    val wh = new java.io.File("target/tmp-dist-wh")
    org.apache.commons.io.FileUtils.deleteQuietly(wh)
    s.conf.set("spark.sql.catalog.dist",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.dist.warehouse", wh.getAbsolutePath)
    s.sql("CREATE NAMESPACE IF NOT EXISTS dist.db")
    s
  }

  private def dataFiles(tbl: String): Seq[(String, String)] =
    graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, s"target/tmp-dist-wh/db/$tbl", "t", Nil)
      .filter(col("content") === 0)
      .select("file_path", "partitionKey").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  test("hash: each partition value lands in exactly one file") {
    spark.sql("CREATE TABLE dist.db.h (k BIGINT, part BIGINT) " +
      "USING `graft-iceberg` PARTITIONED BY (part) " +
      "TBLPROPERTIES ('write.distribution-mode' = 'hash')")
    // a 16-partition input relation: without clustering this would fan
    // 16 tasks × 4 values = up to 64 files
    spark.range(0, 400, 1, 16)
      .selectExpr("id AS k", "id % 4 AS part")
      .createOrReplaceTempView("dist_src_h")
    spark.sql("INSERT INTO dist.db.h SELECT k, part FROM dist_src_h")
    val perValue = dataFiles("h").groupBy(_._2).view.mapValues(_.size).toMap
    assert(perValue.size == 4 && perValue.values.forall(_ == 1),
      s"hash mode must write one file per partition value: $perValue")
    assert(spark.sql("SELECT count(*) FROM dist.db.h").head.getLong(0) == 400L)
  }

  test("none: no pre-write shuffle — files track input parallelism") {
    spark.sql("CREATE TABLE dist.db.n (k BIGINT, part BIGINT) " +
      "USING `graft-iceberg` PARTITIONED BY (part) " +
      "TBLPROPERTIES ('write.distribution-mode' = 'none')")
    spark.range(0, 400, 1, 8)
      .selectExpr("id AS k", "id % 4 AS part")
      .createOrReplaceTempView("dist_src_n")
    spark.sql("INSERT INTO dist.db.n SELECT k, part FROM dist_src_n")
    val files = dataFiles("n")
    assert(files.size > 4,
      s"none mode must not cluster: expected >4 files, got ${files.size}")
    assert(spark.sql("SELECT count(*) FROM dist.db.n").head.getLong(0) == 400L)
  }

  test("range: output files carry disjoint sort-key ranges") {
    spark.sql("CREATE TABLE dist.db.r (k BIGINT) " +
      "USING `graft-iceberg` TBLPROPERTIES (" +
      "'write.distribution-mode' = 'range', " +
      "'write.sort-order' = 'k', " +
      "'write.target-file-size-bytes' = '2000')")
    spark.range(0, 4000, 1, 16)
      .selectExpr("CAST(pmod(id * 2654435761, 4000) AS BIGINT) AS k")
      .createOrReplaceTempView("dist_src_r")
    spark.sql("INSERT INTO dist.db.r SELECT k FROM dist_src_r")
    val files = dataFiles("r").map(_._1)
    assert(files.size > 1, s"fixture must roll several files: ${files.size}")
    val ranges = files.map { p =>
      val ks = spark.read.parquet(p).select("k").collect().map(_.getLong(0))
      (ks.min, ks.max)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"range mode must emit disjoint ranges: $ranges")
      case _ => ()
    }
    assert(spark.sql("SELECT count(*) FROM dist.db.r").head.getLong(0) == 4000L)
  }

  test("ALTER TABLE ... WRITE DDL lands the properties the write path honors") {
    spark.sql("CREATE TABLE dist.db.wd (k BIGINT, part BIGINT) " +
      "USING `graft-iceberg` PARTITIONED BY (part)")
    def props(): Map[String, String] =
      spark.sql("SHOW TBLPROPERTIES dist.db.wd").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
    spark.sql("ALTER TABLE dist.db.wd WRITE ORDERED BY k")
    assert(props().get("write.sort-order").contains("k"))
    assert(props().get("write.distribution-mode").contains("range"))
    spark.sql("ALTER TABLE dist.db.wd WRITE LOCALLY ORDERED BY k")
    assert(props().get("write.distribution-mode").contains("none"))
    spark.sql("ALTER TABLE dist.db.wd WRITE DISTRIBUTED BY PARTITION")
    assert(props().get("write.distribution-mode").contains("hash"))
    // the DDL-set mode drives the actual write: one file per value
    spark.range(0, 200, 1, 8).selectExpr("id AS k", "id % 4 AS part")
      .createOrReplaceTempView("dist_src_wd")
    spark.sql("INSERT INTO dist.db.wd SELECT k, part FROM dist_src_wd")
    val perValue = dataFiles("wd").groupBy(_._2).view.mapValues(_.size).toMap
    assert(perValue.values.forall(_ == 1),
      s"DDL-set hash mode must cluster: $perValue")
    spark.sql("ALTER TABLE dist.db.wd WRITE UNORDERED")
    assert(!props().contains("write.sort-order"))
    assert(props().get("write.distribution-mode").contains("none"))
    // descending orders are outside the dialect: refuse loudly
    intercept[Exception] {
      spark.sql("ALTER TABLE dist.db.wd WRITE ORDERED BY k DESC") }
  }

  test("unknown mode refuses loudly") {
    spark.sql("CREATE TABLE dist.db.bad (k BIGINT) " +
      "USING `graft-iceberg` " +
      "TBLPROPERTIES ('write.distribution-mode' = 'zigzag')")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO dist.db.bad VALUES (1)") }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("write.distribution-mode")),
      msgs(e).toString)
  }
}
