package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.sources.{OrphanFiles, SchemaDiff}

/** Lake-maintenance utilities: orphan-file detection (distributed listing
  * anti-joined against a manifest) and schema-evolution diff. */
class LakeMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf); f.delete()
  }

  test("snapshot summaries record operation + change counts per commit kind") {
    import spark.implicits._
    import graft.sources.{IcebergLayoutWriter, LayoutMaintenance, MetadataTables}
    import graft.sources.IcebergLayoutWriter.ManifestEntrySpec
    val t = new java.io.File("target/tmp-snap-summary")
    org.apache.commons.io.FileUtils.deleteQuietly(t)
    val dataDir = new java.io.File(t, "data"); dataDir.mkdirs()
    def slice(name: String, lo: Long, hi: Long): (java.io.File, Long) = {
      val f = new java.io.File(dataDir, s"$name.parquet")
      val n = IcebergLayoutWriter.writeSingleParquet(
        (lo until hi).toDF("k").selectExpr("k", "k * 2 AS v"), f)
      (f, n)
    }
    val (f0, n0) = slice("a", 0, 10)
    IcebergLayoutWriter.writeTable(t, Seq(ManifestEntrySpec(status = 1,
      content = 0, filePath = f0.getAbsolutePath, recordCount = n0,
      sizeBytes = f0.length(), sequenceNumber = 1L)))
    val (f1, n1) = slice("b", 10, 15)
    LayoutMaintenance.commitAppend(spark, t.getPath, Seq(ManifestEntrySpec(
      status = 1, content = 0, filePath = f1.getAbsolutePath,
      recordCount = n1, sizeBytes = f1.length())))       // append
    LayoutMaintenance.commitDeleteWhere(spark, t.getPath,
      org.apache.spark.sql.functions.col("k") === 3L)    // delete
    val sums = LayoutMaintenance.snapshotSummaries(spark, t.getPath)
    // snapshot 1 predates summaries (writeTable fixture): empty op
    assert(sums.map(_._2) == Seq("", "append", "delete"), sums.toString)
    val append = sums(1)._3
    assert(append("added-data-files") == "1")
    assert(append("added-records") == n1.toString)
    assert(append("total-data-files") == "2")
    assert(append("total-records") == (n0 + n1).toString)
    val del = sums(2)._3
    assert(del("added-delete-files") == "1")
    assert(del("added-data-files") == "0")
    // surfaced through the $snapshots metadata table
    val rows = MetadataTables.snapshots(spark, t.getPath)
      .select("snapshot_id", "operation", "added_records")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Long])))
    assert(rows.toSeq == Seq((1L, "", None),
      (2L, "append", Some(n1)), (3L, "delete", Some(0L))))
    // maintenance that rewrites metadata PRESERVES existing summaries
    LayoutMaintenance.rewritePositionDeletes(spark, t.getPath)
    val after = LayoutMaintenance.snapshotSummaries(spark, t.getPath)
    assert(after.map(_._2) == Seq("", "append", "delete", "replace"))
    org.apache.commons.io.FileUtils.deleteQuietly(t)
  }

  test("orphan detection finds exactly the unreferenced files, at any nesting") {
    import spark.implicits._
    val root = TestTmp.dir("graft_orphans")
    try {
      // a real partitioned table = the referenced set
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .write.partitionBy("o_orderpriority").parquet(s"$root/t")
      // materialize the manifest NOW (a Dataset is lazy — an unmaterialized
      // listing would re-run after the orphans are planted and absorb them)
      val referenced = OrphanFiles.listActual(spark, s"$root/t").collect().toSeq.toDS()
      assert(referenced.count() > 0)
      // plant orphans: top-level and nested inside a partition dir
      val part = new java.io.File(s"$root/t").listFiles().filter(_.isDirectory).head
      java.nio.file.Files.write(java.nio.file.Paths.get(part.getPath, "orphan-1.parquet"), Array[Byte](1))
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$root/t", "orphan-2.parquet"), Array[Byte](2))
      // hidden files are never orphans
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$root/t", "_SUCCESS_extra"), Array[Byte](3))
      val orphans = OrphanFiles.find(spark, s"$root/t", referenced).collect().sorted
      assert(orphans.length == 2, orphans.mkString(", "))
      assert(orphans.exists(_.endsWith("orphan-1.parquet")))
      assert(orphans.exists(_.endsWith("orphan-2.parquet")))
      // a scheme-qualified manifest still matches (normalization)
      val schemed = referenced.map(p => s"file:$p")
      assert(OrphanFiles.find(spark, s"$root/t", schemed).count() == 2)
    } finally rmrf(new java.io.File(root))
  }

  test("schema diff: added/removed/type/nullability, nested paths flattened") {
    val before = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("price", DoubleType),
      StructField("tags", ArrayType(StringType)),
      StructField("meta", StructType(Seq(
        StructField("w", IntegerType),
        StructField("h", IntegerType))))))
    val after = StructType(Seq(
      StructField("id", LongType, nullable = true),            // nullability
      StructField("price", DecimalType(10, 2)),                // type change
      StructField("tags", ArrayType(StringType)),              // unchanged
      StructField("meta", StructType(Seq(
        StructField("w", LongType),                            // nested type change
        StructField("d", IntegerType)))),                      // nested add (+ h removed)
      StructField("lang", StringType)))                        // add
    val changes = SchemaDiff.diff(before, after)
    import SchemaDiff._
    assert(changes.contains(NullabilityChanged("id", from = false, to = true)))
    assert(changes.contains(TypeChanged("price", "double", "decimal(10,2)")))
    assert(changes.contains(TypeChanged("meta.w", "int", "bigint")))
    assert(changes.contains(Added("meta.d", "int")))
    assert(changes.contains(Removed("meta.h", "int")))
    assert(changes.contains(Added("lang", "string")))
    assert(changes.length == 6, changes.mkString("; "))
    // identical schemas diff to nothing
    assert(SchemaDiff.diff(after, after).isEmpty)
  }

  test("schema diff survives a real evolution round-trip through parquet") {
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val evolved = li.drop("l_tax").withColumn("l_quality", lit(1).cast("int"))
    val changes = SchemaDiff.diff(li.schema, evolved.schema)
    assert(changes.toSet == Set(
      SchemaDiff.Removed("l_tax", "double"), SchemaDiff.Added("l_quality", "int")))
  }
}
