package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{IcebergLayoutWriter, LayoutMaintenance, MorRead, OrcPosRead}
import graft.sources.IcebergLayoutWriter.ManifestEntrySpec

/** ORC row ordinals for position deletes: [[OrcPosRead]] must report
  * the EXACT file-order ordinal (the Iceberg spec's `pos`) from the ORC
  * reader's own row accounting — including across stripe boundaries,
  * where a per-task counter would drift — and the MOR/delete paths must
  * route exactly the targeted ORC files through it. */
class OrcPosReadSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  /** Hand-written multi-stripe ORC file: orc.stripe.row.count forces a
    * stripe flush every `stripeRows` rows, so ordinal math is exercised
    * across real stripe boundaries (one read TASK per stripe). */
  private def writeMultiStripe(dest: java.io.File, rows: Int,
      stripeRows: Int): Unit = {
    import org.apache.orc.{OrcFile, TypeDescription}
    import org.apache.hadoop.hive.ql.exec.vector.{BytesColumnVector, LongColumnVector}
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.set("orc.stripe.row.count", stripeRows.toString)
    val td = TypeDescription.fromString("struct<id:bigint,v:string>")
    org.apache.commons.io.FileUtils.deleteQuietly(dest)
    val w = OrcFile.createWriter(
      new org.apache.hadoop.fs.Path(dest.getAbsolutePath),
      OrcFile.writerOptions(conf).setSchema(td))
    val batch = td.createRowBatch()
    val ids = batch.cols(0).asInstanceOf[LongColumnVector]
    val vs = batch.cols(1).asInstanceOf[BytesColumnVector]
    (0 until rows).foreach { i =>
      val r = batch.size
      ids.vector(r) = i.toLong
      val s = s"row-$i".getBytes(java.nio.charset.StandardCharsets.UTF_8)
      vs.setVal(r, s)
      batch.size += 1
      if (batch.size == batch.getMaxSize) { w.addRowBatch(batch); batch.reset() }
    }
    if (batch.size > 0) w.addRowBatch(batch)
    w.close()
  }

  test("pos is the exact file ordinal across stripe boundaries") {
    val f = new java.io.File("target/tmp-orcpos/multi.orc")
    f.getParentFile.mkdirs()
    writeMultiStripe(f, rows = 3500, stripeRows = 1000)
    val reader = org.apache.orc.OrcFile.createReader(
      new org.apache.hadoop.fs.Path(f.getAbsolutePath),
      org.apache.orc.OrcFile.readerOptions(
        new org.apache.hadoop.conf.Configuration()))
    val nStripes = try reader.getStripes.size finally reader.close()
    assert(nStripes > 1, s"fixture must be multi-stripe, got $nStripes")
    val out = OrcPosRead.readWithPos(spark, Seq(f.getAbsolutePath))
      .select(col("pos"), col("id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(out.length == 3500)
    // id was written as the row ordinal: pos must equal it, v must match
    assert(out.forall { case (pos, id, v) => pos == id && v == s"row-$id" },
      s"ordinal drift: ${out.filterNot { case (p, i, _) => p == i }.take(3).toSeq}")
  }

  test("many-file planning (distributed tail reads) keeps per-file ordinals exact") {
    // past the 8-file threshold the stripe-directory reads go out as a
    // Spark job; the per-file ordinals and values must be unchanged
    val files = (0 until 10).map { i =>
      val f = new java.io.File(s"target/tmp-orcpos/many$i.orc")
      f.getParentFile.mkdirs()
      org.apache.commons.io.FileUtils.deleteQuietly(f)
      writeMultiStripe(f, rows = 250 + i, stripeRows = 100)
      f.getAbsolutePath
    }
    val out = OrcPosRead.readWithPos(spark, files)
      .select(col("file_path"), col("pos"), col("id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == files.indices.map(250 + _).sum)
    assert(out.forall { case (_, pos, id) => pos == id },
      s"ordinal drift: ${out.filterNot { case (_, p, i) => p == i }.take(3).toSeq}")
    // every file contributed its own full ordinal range
    val perFile = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq)
    files.zipWithIndex.foreach { case (f, i) =>
      assert(perFile(f) == (0L until (250L + i)).toSeq, s"file $f")
    }
  }

  test("scalar types round-trip through the vector extraction") {
    import spark.implicits._
    val df = Seq(
      (1, 10L, 1.5f, 2.5, true, "a", java.sql.Date.valueOf("2024-03-01"),
        java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789"),
        BigDecimal("123.45")),
      (2, 20L, -0.5f, -3.5, false, "b", java.sql.Date.valueOf("1999-12-31"),
        java.sql.Timestamp.valueOf("1999-12-31 23:59:59.999"),
        BigDecimal("-0.01"))
    ).toDF("i", "l", "f", "d", "b", "s", "dt", "ts", "dec")
      .withColumn("dec", col("dec").cast("decimal(10,2)"))
      .withColumn("bin", col("s").cast("binary"))
      .withColumn("sn", when(col("i") === 2, col("s"))) // null in row 1
    val dest = new java.io.File("target/tmp-orcpos/types.orc")
    IcebergLayoutWriter.writeSingleOrc(df.orderBy("i"), dest)
    val back = OrcPosRead.readWithPos(spark, Seq(dest.getAbsolutePath))
      .drop("file_path", "pos")
    val cols = df.columns.toSeq
    val exp = df.select(cols.map(col): _*).orderBy("i").collect().toSeq
    val got = back.select(cols.map(col): _*).orderBy("i").collect().toSeq
    assert(got.map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    }) == exp.map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    }))
  }

  /** Mixed-format table: parquet slice + ORC slice (as q227), then a
    * POSITION delete whose predicate hits rows in BOTH formats. */
  private def mixedFixture(name: String): (java.io.File, Long, Long) = {
    import spark.implicits._
    val tbl = new java.io.File(s"target/tmp-orcpos/$name")
    org.apache.commons.io.FileUtils.deleteQuietly(tbl)
    val dataDir = new java.io.File(tbl, "data"); dataDir.mkdirs()
    val rows = (0L until 40L).map(i => (i, s"v$i"))
    val pf = new java.io.File(dataDir, "a.parquet")
    val nP = IcebergLayoutWriter.writeSingleParquet(
      rows.filter(_._1 % 2 == 0).toDF("k", "v").orderBy("k"), pf)
    IcebergLayoutWriter.writeTable(tbl, Seq(ManifestEntrySpec(
      status = 1, content = 0, filePath = pf.getAbsolutePath,
      recordCount = nP, sizeBytes = pf.length(), sequenceNumber = 1L)))
    val of = new java.io.File(dataDir, "b.orc")
    val nO = IcebergLayoutWriter.writeSingleOrc(
      rows.filter(_._1 % 2 == 1).toDF("k", "v").orderBy("k"), of)
    LayoutMaintenance.commitAppend(spark, tbl.getPath, Seq(ManifestEntrySpec(
      status = 1, content = 0, filePath = of.getAbsolutePath,
      recordCount = nO, sizeBytes = of.length(), fileFormat = "ORC")))
    (tbl, nP, nO)
  }

  test("commitDeleteWhere position-deletes ORC rows; MOR read applies them") {
    val (tbl, _, _) = mixedFixture("posdel")
    // k in [10, 20): hits parquet evens AND orc odds
    val (_, nDel) = LayoutMaintenance.commitDeleteWhere(spark, tbl.getPath,
      col("k") >= 10 && col("k") < 20)
    assert(nDel == 10, s"10 rows in range, deleted $nDel")
    val back = MorRead.readTable(spark, tbl.getPath)
      .select(col("k")).collect().map(_.getLong(0)).sorted.toSeq
    assert(back == (0L until 40L).filterNot(k => k >= 10 && k < 20))
  }

  test("commitDeleteWhereDv deletion-vectors ORC rows; MOR read applies them") {
    val (tbl, _, _) = mixedFixture("dvdel")
    val (_, nDel) = LayoutMaintenance.commitDeleteWhereDv(spark, tbl.getPath,
      col("k") % 5 === 3) // 3,8,13,... both formats
    assert(nDel == 8, s"8 rows match, deleted $nDel")
    val back = MorRead.readTable(spark, tbl.getPath)
      .select(col("k")).collect().map(_.getLong(0)).sorted.toSeq
    assert(back == (0L until 40L).filterNot(_ % 5 == 3))
  }

  test("untargeted ORC files keep the native scan: pos stays NULL") {
    val (tbl, _, _) = mixedFixture("fastpath")
    val lineage = MorRead.readTableLineage(spark, tbl.getPath)
    val orcPos = lineage.filter(col("file_path").endsWith(".orc"))
      .select(col("pos")).collect()
    assert(orcPos.nonEmpty && orcPos.forall(_.isNullAt(0)),
      "no tombstones target the ORC file - the fast NULL-pos arm must serve it")
  }

  test("delete prefilter scans only matching ORC files with ordinals") {
    val (tbl, _, _) = mixedFixture("prefilter")
    // predicate that matches NO orc rows -> candidate set empty
    assert(MorRead.orcFilesMatching(spark, tbl.getPath, col("k") % 2 === 0)
      .isEmpty)
    val cands = MorRead.orcFilesMatching(spark, tbl.getPath, col("k") === 7)
    assert(cands.size == 1 && cands.head.endsWith("b.orc"))
    // parquet-only predicate still commits fine on the mixed table
    val (_, nDel) = LayoutMaintenance.commitDeleteWhere(spark, tbl.getPath,
      col("k") === 4)
    assert(nDel == 1)
    val back = MorRead.readTable(spark, tbl.getPath).count()
    assert(back == 39)
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
    val dest = new java.io.File("target/tmp-orcpos/fuzz.orc")
    assert(IcebergLayoutWriter.writeSingleOrc(df.orderBy("ord"), dest) == 2000L)
    val back = OrcPosRead.readWithPos(spark, Seq(dest.getAbsolutePath))
      .orderBy("pos")
      .select("ord", "l", "i", "s", "d", "b").collect()
      .map(_.toSeq).toSeq
    val exp = df.orderBy("ord").select("ord", "l", "i", "s", "d", "b")
      .collect().map(_.toSeq).toSeq
    assert(back == exp)
  }

  test("schema generations (rename/ADD COLUMN files) merge by name, null-filled") {
    import spark.implicits._
    val d = new java.io.File("target/tmp-orcpos-gen"); d.mkdirs()
    val f1 = new java.io.File(d, "gen1.orc")
    val f2 = new java.io.File(d, "gen2.orc")
    assert(IcebergLayoutWriter.writeSingleOrc(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), f1) == 2L)
    assert(IcebergLayoutWriter.writeSingleOrc(
      Seq((3L, "c", 30L)).toDF("k", "label", "extra"), f2) == 1L)
    val back = OrcPosRead.readWithPos(spark,
      Seq(f1.getAbsolutePath, f2.getAbsolutePath))
    assert(back.columns.toSet ==
      Set("k", "v", "label", "extra", "file_path", "pos"))
    val rows = back.orderBy("k").select("k", "v", "label", "extra", "pos")
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)), Option(r.getString(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4))).toSeq
    assert(rows == Seq(
      (1L, Some("a"), None, None, 0L),
      (2L, Some("b"), None, None, 1L),
      (3L, None, Some("c"), Some(30L), 0L)),
      s"generation merge must null-fill per file: $rows")
  }

  test("struct columns read back with real ordinals (one-level nesting)") {
    import spark.implicits._
    val d = new java.io.File("target/tmp-orcpos-struct"); d.mkdirs()
    val f = new java.io.File(d, "s.orc")
    val df = (0L until 20L).map(k => (k, (k * 2L, s"m$k"))).toDF("k", "m")
    assert(IcebergLayoutWriter.writeSingleOrc(df.orderBy("k"), f) == 20L)
    val back = OrcPosRead.readWithPos(spark, Seq(f.getAbsolutePath))
      .selectExpr("k", "m._1 AS a", "m._2 AS b", "pos")
      .orderBy("pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(back.toSeq == (0L until 20L).map(k => (k, k * 2L, s"m$k", k)))
  }
}
