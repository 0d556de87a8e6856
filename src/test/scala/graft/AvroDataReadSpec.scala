package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{AvroDataRead, IcebergLayoutWriter, LayoutMaintenance, MorRead}
import graft.sources.IcebergLayoutWriter.ManifestEntrySpec

/** AVRO data files — the Iceberg spec's third per-entry `file_format`:
  * container round trip through [[IcebergLayoutWriter.writeSingleAvro]]
  * / [[AvroDataRead.readWithPos]], ordinal exactness (an avro container
  * is strictly sequential, so every row carries a real pos), and the
  * three-format MOR read with both tombstone kinds spanning all of
  * PARQUET + ORC + AVRO. */
class AvroDataReadSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("scalar types round-trip; pos is the write ordinal") {
    import spark.implicits._
    val df = Seq(
      (1, 10L, 1.5f, 2.5, true, "a", java.sql.Date.valueOf("2024-03-01"),
        java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789")),
      (2, 20L, -0.5f, -3.5, false, "b", java.sql.Date.valueOf("1999-12-31"),
        java.sql.Timestamp.valueOf("1999-12-31 23:59:59.999"))
    ).toDF("i", "l", "f", "d", "b", "s", "dt", "ts")
      .withColumn("bin", col("s").cast("binary"))
      .withColumn("sn", when(col("i") === 2, col("s"))) // null in row 1
    val dest = new java.io.File("target/tmp-avrodata/types.avro")
    dest.getParentFile.mkdirs()
    val n = IcebergLayoutWriter.writeSingleAvro(df.orderBy("i"), dest)
    assert(n == 2L)
    val back = AvroDataRead.readWithPos(spark, Seq(dest.getAbsolutePath))
    // pos equals the ordering the writer streamed (i ascending)
    assert(back.select("pos", "i").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq ==
      Seq((0L, 1), (1L, 2)))
    val cols = df.columns.toSeq
    def canon(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(_.toSeq.map {
        case b: Array[Byte] => b.toSeq; case x => x
      })
    assert(canon(back.select(cols.map(col): _*).orderBy("i").collect().toSeq)
      == canon(df.select(cols.map(col): _*).orderBy("i").collect().toSeq))
  }

  test("many-row container: ordinals exact across avro blocks") {
    import spark.implicits._
    val rows = (0L until 20000L).map(i => (i, s"v$i"))
    val dest = new java.io.File("target/tmp-avrodata/blocks.avro")
    dest.getParentFile.mkdirs()
    IcebergLayoutWriter.writeSingleAvro(rows.toDF("k", "v").orderBy("k"), dest)
    val back = AvroDataRead.readWithPos(spark, Seq(dest.getAbsolutePath))
      .select("pos", "k").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(back.length == 20000)
    assert(back.forall { case (pos, k) => pos == k },
      s"ordinal drift: ${back.filterNot { case (p, k) => p == k }.take(3).toSeq}")
  }

  test("block directory: header-only scan agrees with the container; one task per block keeps ordinals") {
    import spark.implicits._
    val rows = (0L until 20000L).map(i => (i, s"v$i"))
    val dest = new java.io.File("target/tmp-avrodata/blockdir.avro")
    dest.getParentFile.mkdirs()
    IcebergLayoutWriter.writeSingleAvro(rows.toDF("k", "v").orderBy("k"), dest)
    val blocks = AvroDataRead.blockLayout(dest.getAbsolutePath)
    assert(blocks.length > 1, "fixture must span multiple avro blocks")
    assert(blocks.map(_._2).sum == 20000L,
      s"block row counts must sum to the container total, got $blocks")
    assert(blocks.map(_._1) == blocks.map(_._1).sorted)
    // the degenerate split — ONE TASK PER BLOCK — must still stamp the
    // exact sequential ordinals (the sync-seek + prefix-sum contract)
    val back = AvroDataRead.readWithPos(spark, Seq(dest.getAbsolutePath),
      targetBlocksPerTask = 1)
      .select("pos", "k").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(back.length == 20000)
    assert(back.forall { case (pos, k) => pos == k },
      s"ordinal drift: ${back.filterNot { case (p, k) => p == k }.take(3).toSeq}")
  }

  test("three-format MOR: pos + eq tombstones span PARQUET, ORC, AVRO") {
    import spark.implicits._
    val tbl = new java.io.File("target/tmp-avrodata/tri")
    org.apache.commons.io.FileUtils.deleteQuietly(tbl)
    val dataDir = new java.io.File(tbl, "data"); dataDir.mkdirs()
    val rows = (0L until 60L).map(i => (i, s"v$i"))
    def slice(mod: Long) = rows.filter(_._1 % 3 == mod).toDF("k", "v").orderBy("k")
    val pf = new java.io.File(dataDir, "a.parquet")
    val nP = IcebergLayoutWriter.writeSingleParquet(slice(0), pf)
    IcebergLayoutWriter.writeTable(tbl, Seq(ManifestEntrySpec(
      status = 1, content = 0, filePath = pf.getAbsolutePath,
      recordCount = nP, sizeBytes = pf.length(), sequenceNumber = 1L)))
    val of = new java.io.File(dataDir, "b.orc")
    val nO = IcebergLayoutWriter.writeSingleOrc(slice(1), of)
    LayoutMaintenance.commitAppend(spark, tbl.getPath, Seq(ManifestEntrySpec(
      status = 1, content = 0, filePath = of.getAbsolutePath,
      recordCount = nO, sizeBytes = of.length(), fileFormat = "ORC")))
    val af = new java.io.File(dataDir, "c.avro")
    val nA = IcebergLayoutWriter.writeSingleAvro(slice(2), af)
    LayoutMaintenance.commitAppend(spark, tbl.getPath, Seq(ManifestEntrySpec(
      status = 1, content = 0, filePath = af.getAbsolutePath,
      recordCount = nA, sizeBytes = af.length(), fileFormat = "AVRO")))
    assert(MorRead.readTable(spark, tbl.getPath).count() == 60L)
    // position delete hitting all three formats
    val (_, nDel) = LayoutMaintenance.commitDeleteWhere(spark, tbl.getPath,
      col("k") >= 30 && col("k") < 36) // 30..35: two rows per format
    assert(nDel == 6, s"expected 6 deletions, got $nDel")
    // equality delete (key-matched) on top
    val (_, _, _) = LayoutMaintenance.commitMerge(spark, tbl.getPath,
      Seq((7L, "x", "D"), (8L, "x", "D"), (9L, "x", "D"))
        .toDF("k", "v", "op"), Seq("k"), "op")
    val back = MorRead.readTable(spark, tbl.getPath)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(back == (0L until 60L)
      .filterNot(k => k >= 30 && k < 36).filterNot(Set(7L, 8L, 9L)))
  }

  test("DV delete on an avro-only table") {
    import spark.implicits._
    val tbl = new java.io.File("target/tmp-avrodata/dvonly")
    org.apache.commons.io.FileUtils.deleteQuietly(tbl)
    val dataDir = new java.io.File(tbl, "data"); dataDir.mkdirs()
    val af = new java.io.File(dataDir, "d.avro")
    val n = IcebergLayoutWriter.writeSingleAvro(
      (0L until 25L).map(i => (i, i * 2)).toDF("k", "twice").orderBy("k"), af)
    IcebergLayoutWriter.writeTable(tbl, Seq(ManifestEntrySpec(
      status = 1, content = 0, filePath = af.getAbsolutePath,
      recordCount = n, sizeBytes = af.length(), sequenceNumber = 1L,
      fileFormat = "AVRO")))
    val (_, nDel) = LayoutMaintenance.commitDeleteWhereDv(spark, tbl.getPath,
      col("k") % 4 === 1)
    assert(nDel == 6)
    val back = MorRead.readTable(spark, tbl.getPath)
      .agg(count(lit(1)), sum(col("twice"))).head
    assert(back.getLong(0) == 19L)
    assert(back.getLong(1) ==
      (0L until 25L).filterNot(_ % 4 == 1).map(_ * 2).sum)
  }

  test("seeded randomized round trip: values, nulls, and ordinals exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    val rows = (0 until 2000).map { i =>
      (i.toLong,
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextLong()),
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt()),
        if (rnd.nextInt(10) == 0) None
        else Some(rnd.nextString(rnd.nextInt(12))),
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextDouble()),
        rnd.nextBoolean())
    }
    val df = rows.toDF("ord", "l", "i", "s", "d", "b")
    val dest = new java.io.File("target/tmp-avrodata/fuzz.avro")
    assert(IcebergLayoutWriter.writeSingleAvro(df.orderBy("ord"), dest) == 2000L)
    val back = AvroDataRead.readWithPos(spark, Seq(dest.getAbsolutePath))
      .orderBy("pos")
      .select("ord", "l", "i", "s", "d", "b").collect()
      .map(_.toSeq).toSeq
    val exp = df.orderBy("ord").select("ord", "l", "i", "s", "d", "b")
      .collect().map(_.toSeq).toSeq
    assert(back == exp)
  }
}
