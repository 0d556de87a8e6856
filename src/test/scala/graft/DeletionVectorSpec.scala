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

  // ---- deletion-vector-v1 byte-level pins: the blob must be the
  // Iceberg v3 Puffin layout EXACTLY (len BE | D1 D3 39 64 | portable
  // 64-bit roaring | CRC-32 BE), with the vector matching hand-built
  // portable streams for each 32-bit container kind — so a conforming
  // external v3 reader could consume these blobs.

  private def vectorOf(blob: Array[Byte]): Array[Byte] =
    blob.slice(8, blob.length - 4) // strip len+magic framing and CRC

  test("v3 blob framing: length, magic, CRC, round trip") {
    val poss = Seq(4L, 7L, 9L)
    val blob = graft.sources.DeletionVectors.blobBytes(poss)
    val bb = java.nio.ByteBuffer.wrap(blob) // big-endian by default
    assert(bb.getInt == blob.length - 8, "combined length = magic + vector")
    val magic = Array.fill(4)(bb.get())
    assert(magic.map(_ & 0xFF).toSeq == Seq(0xD1, 0xD3, 0x39, 0x64))
    assert(graft.sources.DeletionVectors.blobPositions(blob) == poss)
    // a flipped byte must fail the CRC, not decode silently
    val torn = blob.clone(); torn(10) = (torn(10) ^ 0x1).toByte
    intercept[IllegalArgumentException] {
      graft.sources.DeletionVectors.blobPositions(torn)
    }
  }

  test("array container matches the hand-built portable stream") {
    // {1,2,3}: one 32-bit bucket (key 0) holding one ARRAY container —
    // hand-built: u64 LE bucket count, u32 LE high key, then the 32-bit
    // standard serialization (cookie 12346 LE, 1 container, key 0,
    // cardinality-1 = 2, offset 16, sorted u16 values)
    val expected =
      Array[Int](1,0,0,0,0,0,0,0, 0,0,0,0,             // 64-bit wrapper
        0x3A,0x30,0,0, 1,0,0,0, 0,0, 2,0, 16,0,0,0,    // 32-bit header
        1,0, 2,0, 3,0).map(_.toByte)                   // array data
    val got = vectorOf(
      graft.sources.DeletionVectors.blobBytes(Seq(1L, 2L, 3L)))
    assert(got.toSeq == expected.toSeq)
  }

  test("run container matches the hand-built portable stream") {
    // 0..9999 consecutive: runOptimize folds it into ONE run container —
    // cookie 12347 LE (run flag byte 0x01), key 0, cardinality-1 9999,
    // no offset header (<4 containers), run count 1, (start 0, len-1)
    val expected =
      Array[Int](1,0,0,0,0,0,0,0, 0,0,0,0,
        0x3B,0x30,0,0, 0x01, 0,0, 0x0F,0x27,
        1,0, 0,0, 0x0F,0x27).map(_.toByte)
    val got = vectorOf(
      graft.sources.DeletionVectors.blobBytes(0L until 10000L))
    assert(got.toSeq == expected.toSeq)
  }

  test("bitmap container and multi-bucket keys round-trip portably") {
    // 5000 scattered (even) ordinals: too many for an array, no runs —
    // a BITMAP container: cookie 12346, then an 8 KiB bitset whose low
    // 1250 bytes are 0x55 (every even bit)
    val evens = (0L until 10000L by 2L)
    val blob = graft.sources.DeletionVectors.blobBytes(evens)
    val vec = vectorOf(blob)
    val header = Array[Int](1,0,0,0,0,0,0,0, 0,0,0,0,
      0x3A,0x30,0,0, 1,0,0,0, 0,0, 0x87,0x13, 16,0,0,0).map(_.toByte)
    assert(vec.take(header.length).toSeq == header.toSeq)
    assert(vec.length == header.length + 8192, "8 KiB bitset payload")
    assert(vec.slice(header.length, header.length + 1250)
      .forall(_ == 0x55.toByte))
    assert(vec.drop(header.length + 1250).forall(_ == 0))
    assert(graft.sources.DeletionVectors.blobPositions(blob) == evens)
    // ordinals above 2^32 land in their own bucket, ascending key order
    val wide = Seq(3L, (5L << 32) + 7L)
    val wblob = graft.sources.DeletionVectors.blobBytes(wide)
    assert(vectorOf(wblob).take(8).toSeq ==
      Array[Int](2,0,0,0,0,0,0,0).map(_.toByte).toSeq, "two buckets")
    assert(graft.sources.DeletionVectors.blobPositions(wblob) == wide)
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
