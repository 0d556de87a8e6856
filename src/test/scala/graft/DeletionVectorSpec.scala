package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Deletion vectors (Iceberg-v3 shape): position deletes carried as one
  * Puffin blob per target data file instead of parquet tombstone rows.
  * The contract under test: a DV delete commit is READ-interchangeable
  * with the parquet-tombstone commit everywhere — MorRead, the DSv2
  * connector's per-task MOR read, the CDC changelog, and the
  * rewrite/fold maintenance ops. */
class DeletionVectorSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def freshTable(name: String, n: Long): String = {
    import spark.implicits._
    val dir = new java.io.File(s"target/tmp-dv-$name")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    (0L until n).map(i => (i, s"v$i")).toDF("k", "v")
      .write.format("graft-iceberg").mode("append").save(dir.getPath)
    (0L until n).map(i => (i + n, s"v${i + n}")).toDF("k", "v")
      .write.format("graft-iceberg").mode("append").save(dir.getPath)
    dir.getPath
  }

  test("DV delete commit == parquet-tombstone delete commit, bit for bit") {
    val a = freshTable("twin-a", 100)
    val b = freshTable("twin-b", 100)
    val (_, nA) = graft.sources.LayoutMaintenance
      .commitDeleteWhereDv(spark, a, expr("k % 7 = 0"))
    val (_, nB) = graft.sources.LayoutMaintenance
      .commitDeleteWhere(spark, b, expr("k % 7 = 0"))
    assert(nA == nB && nA > 0)
    val ra = graft.sources.MorRead.readTable(spark, a)
      .orderBy("k").collect().map(_.toSeq).toSeq
    val rb = graft.sources.MorRead.readTable(spark, b)
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(ra == rb && ra.size == 200 - nA)
    // the DV commit carries exactly ONE puffin entry, format-flagged
    val dvEntries = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, a, "t", Nil)
      .filter(col("content") === 1)
      .select("file_path", "file_format").collect()
    assert(dvEntries.length == 1 &&
      dvEntries.head.getString(1) == "PUFFIN" &&
      dvEntries.head.getString(0).endsWith(".puffin"))
  }

  test("connector per-task MOR read applies deletion vectors") {
    val dir = freshTable("conn", 80)
    graft.sources.LayoutMaintenance
      .commitDeleteWhereDv(spark, dir, expr("k >= 150"))
    val viaConnector = spark.read.format("graft-iceberg").load(dir)
      .agg(count(lit(1)), sum(col("k"))).head
    assert(viaConnector.getLong(0) == 150L)
    assert(viaConnector.getLong(1) == (0L until 150L).sum)
  }

  test("CDC changelog emits DV deletes as full-row delete events") {
    import spark.implicits._
    val wh = new java.io.File("target/tmp-dv-wh")
    org.apache.commons.io.FileUtils.deleteQuietly(wh)
    spark.conf.set("spark.sql.catalog.dvtest",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dvtest.warehouse", wh.getAbsolutePath)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dvtest.db")
    spark.sql("CREATE TABLE dvtest.db.c (k BIGINT, v STRING) " +
      "USING `graft-iceberg`")
    spark.sql("INSERT INTO dvtest.db.c SELECT id, concat('v', id) FROM range(50)")
    val dir = new java.io.File(wh, "db/c").getPath
    graft.sources.LayoutMaintenance
      .commitDeleteWhereDv(spark, dir, expr("k IN (7, 11, 13)"))
    val deletes = spark.sql("SELECT k, v FROM dvtest.db.c.changes " +
      "WHERE _change_type = 'delete' ORDER BY k").collect()
    assert(deletes.map(_.getLong(0)).toSeq == Seq(7L, 11L, 13L))
    assert(deletes.map(_.getString(1)).toSeq == Seq("v7", "v11", "v13"))
  }

  test("rewrite_position_deletes folds DV + parquet tombstones into one file") {
    val dir = freshTable("fold", 60)
    graft.sources.LayoutMaintenance
      .commitDeleteWhere(spark, dir, expr("k = 3"))
    graft.sources.LayoutMaintenance
      .commitDeleteWhereDv(spark, dir, expr("k = 5"))
    val (_, before, after, pairs) = graft.sources.LayoutMaintenance
      .rewritePositionDeletes(spark, dir)
    assert(before == 2 && after == 1 && pairs == 2L)
    assert(graft.sources.MorRead.readTable(spark, dir).count() == 118L)
    // post-fold the table carries a single PARQUET tombstone file
    val pd = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, dir, "t", Nil)
      .filter(col("content") === 1).select("file_format").collect()
    assert(pd.length == 1 && pd.head.getString(0) == "PARQUET")
  }

  test("rewrite_data_files drops deletion vectors like any tombstone") {
    val dir = freshTable("rw", 40)
    graft.sources.LayoutMaintenance
      .commitDeleteWhereDv(spark, dir, expr("k % 10 = 1"))
    val before = graft.sources.MorRead.readTable(spark, dir)
      .orderBy("k").collect().map(_.toSeq).toSeq
    graft.sources.LayoutMaintenance.rewriteDataFiles(spark, dir, Nil, Nil)
    val stats = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, dir, "t", Nil)
    assert(stats.filter(col("content") =!= 0).count() == 0L)
    val after = graft.sources.MorRead.readTable(spark, dir)
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(after == before)
  }
}
