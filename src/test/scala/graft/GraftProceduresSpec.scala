package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL maintenance procedures (`CALL cat.system.<proc>(...)`) — the
  * ProcedureCatalog face of LayoutMaintenance. Each case drives the
  * procedure through pure SQL and cross-checks the resulting table state
  * through the path-addressed API (same discipline as GraftCatalogSpec:
  * one table, two addressing modes). */
class GraftProceduresSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSpec.spark
    val wh = new java.io.File("target/tmp-proc-wh")
    org.apache.commons.io.FileUtils.deleteQuietly(wh)
    s.conf.set("spark.sql.catalog.proctest",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.proctest.warehouse", wh.getAbsolutePath)
    s.sql("CREATE NAMESPACE IF NOT EXISTS proctest.db")
    s
  }

  private def dirOf(name: String): String =
    new java.io.File(s"target/tmp-proc-wh/db/$name").getAbsolutePath

  test("SHOW PROCEDURES lists the system namespace; DESCRIBE shows one") {
    val shown = spark.sql("SHOW PROCEDURES IN proctest.system").collect()
      .map(_.toSeq.map(String.valueOf).mkString(",")).mkString("\n")
    assert(shown.contains("rollback_to_snapshot"))
    assert(shown.contains("expire_snapshots"))
    assert(shown.contains("remove_orphan_files"))
    val desc = spark.sql(
      "DESCRIBE PROCEDURE proctest.system.rewrite_data_files")
      .collect().map(_.toSeq.map(String.valueOf).mkString(",")).mkString("\n")
    assert(desc.contains("rewrite_data_files"))
  }

  test("rollback_to_snapshot and set_current_snapshot move the head by SQL") {
    spark.sql("CREATE TABLE proctest.db.rb (k BIGINT) USING `graft-iceberg`")
    spark.sql("INSERT INTO proctest.db.rb VALUES (1), (2)")
    spark.sql("INSERT INTO proctest.db.rb VALUES (3)")
    assert(spark.sql("SELECT count(*) FROM proctest.db.rb").head.getLong(0) == 3L)
    val r = spark.sql(
      "CALL proctest.system.rollback_to_snapshot(table => 'db.rb', snapshot_id => 1)")
      .collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L)
    assert(spark.sql("SELECT count(*) FROM proctest.db.rb").head.getLong(0) == 2L)
    // roll forward again via set_current_snapshot (same pointer move)
    spark.sql("CALL proctest.system.set_current_snapshot('db.rb', 2)")
    assert(spark.sql("SELECT count(*) FROM proctest.db.rb").head.getLong(0) == 3L)
    // procedure path == API path: the head is snapshot 2 again
    assert(spark.sql("CALL proctest.system.ancestors_of('db.rb')")
      .collect().filter(_.getBoolean(2)).map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("expire_snapshots honors retain_last and never drops the current head") {
    spark.sql("CREATE TABLE proctest.db.ex (k BIGINT) USING `graft-iceberg`")
    (1 to 4).foreach(i =>
      spark.sql(s"INSERT INTO proctest.db.ex VALUES ($i)"))
    assert(graft.sources.LayoutMaintenance
      .snapshotIds(spark, dirOf("ex")).size == 4)
    val r = spark.sql(
      "CALL proctest.system.expire_snapshots('db.ex', retain_last => 2)")
      .collect().head
    assert(r.getInt(0) == 2)
    assert(graft.sources.LayoutMaintenance
      .snapshotIds(spark, dirOf("ex")) == Seq(3L, 4L))
    // default retain_last = 1 keeps just the head
    spark.sql("CALL proctest.system.expire_snapshots('db.ex')")
    assert(graft.sources.LayoutMaintenance
      .snapshotIds(spark, dirOf("ex")) == Seq(4L))
    assert(spark.sql("SELECT count(*) FROM proctest.db.ex").head.getLong(0) == 4L)
  }

  test("rewrite_data_files drops SQL-DELETE tombstones; reads unchanged") {
    spark.sql("CREATE TABLE proctest.db.rw (k BIGINT, v STRING) USING `graft-iceberg`")
    spark.sql("INSERT INTO proctest.db.rw SELECT id, concat('v', id) FROM range(100)")
    spark.sql("INSERT INTO proctest.db.rw SELECT id, concat('v', id) FROM range(100, 200)")
    spark.sql("DELETE FROM proctest.db.rw WHERE k % 10 = 0")
    val before = spark.sql("SELECT * FROM proctest.db.rw ORDER BY k")
      .collect().map(_.toSeq).toSeq
    assert(before.size == 180)
    val r = spark.sql("CALL proctest.system.rewrite_data_files('db.rw')")
      .collect().head
    assert(r.getLong(1) == 180L)    // rewritten_rows
    assert(r.getInt(3) <= r.getInt(2)) // files_after <= files_before
    val after = spark.sql("SELECT * FROM proctest.db.rw ORDER BY k")
      .collect().map(_.toSeq).toSeq
    assert(after == before)
    // tombstone-free now: no content != 0 entries at the head
    val stats = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, dirOf("rw"), "t", Nil)
    assert(stats.filter(org.apache.spark.sql.functions
      .col("content") =!= 0).count() == 0L)
  }

  test("rewrite_position_deletes consolidates pos-tombstones without rewriting data") {
    spark.sql("CREATE TABLE proctest.db.rp (k BIGINT) USING `graft-iceberg`")
    spark.sql("INSERT INTO proctest.db.rp SELECT id FROM range(50)")
    // two predicate deletes = two position-delete files
    graft.sources.LayoutMaintenance.commitDeleteWhere(spark, dirOf("rp"),
      org.apache.spark.sql.functions.expr("k = 3"), Nil)
    graft.sources.LayoutMaintenance.commitDeleteWhere(spark, dirOf("rp"),
      org.apache.spark.sql.functions.expr("k = 7"), Nil)
    val r = spark.sql("CALL proctest.system.rewrite_position_deletes('db.rp')")
      .collect().head
    assert(r.getInt(1) == 2 && r.getInt(2) == 1 && r.getLong(3) == 2L)
    assert(spark.sql("SELECT count(*) FROM proctest.db.rp").head.getLong(0) == 48L)
  }

  test("rewrite_manifests consolidates; ancestors_of reports history + head") {
    spark.sql("CREATE TABLE proctest.db.rm (k BIGINT) USING `graft-iceberg`")
    (1 to 3).foreach(i => spark.sql(s"INSERT INTO proctest.db.rm VALUES ($i)"))
    val rm = spark.sql("CALL proctest.system.rewrite_manifests('db.rm')")
      .collect().head
    assert(rm.getInt(0) >= rm.getInt(1))
    val anc = spark.sql("CALL proctest.system.ancestors_of('db.rm')").collect()
    // manifest consolidation rewrites the CURRENT snapshot's manifest list
    // in place (no new snapshot); history survives, one current head
    assert(anc.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(anc.count(_.getBoolean(2)) == 1)
    assert(anc.filter(_.getBoolean(2)).head.getLong(0) == 3L)
  }

  test("WAP by SQL: stage, fast_forward publishes; cherrypick after head moved") {
    spark.sql("CREATE TABLE proctest.db.wap (k BIGINT) USING `graft-iceberg`")
    spark.sql("INSERT INTO proctest.db.wap VALUES (1)")
    // stage an append on a branch (API write half of WAP)
    val dir = dirOf("wap")
    val dataDir = new java.io.File(dir, "data")
    val f = new java.io.File(dataDir, "staged.parquet")
    import spark.implicits._
    val n = graft.sources.IcebergLayoutWriter.writeSingleParquet(
      Seq(100L, 101L).toDF("k"), f)
    val staged = graft.sources.LayoutMaintenance.stageAppend(spark, dir,
      Seq(graft.sources.IcebergLayoutWriter.ManifestEntrySpec(status = 1,
        content = 0, filePath = f.getAbsolutePath, recordCount = n,
        sizeBytes = f.length(), sequenceNumber = 0L)), branch = "audit")
    // unpublished: SQL readers still see 1 row
    assert(spark.sql("SELECT count(*) FROM proctest.db.wap").head.getLong(0) == 1L)
    val ff = spark.sql(
      "CALL proctest.system.fast_forward('db.wap', 'main', 'audit')")
      .collect().head
    assert(ff.getString(0) == "main" && ff.getLong(1) == staged)
    assert(spark.sql("SELECT count(*) FROM proctest.db.wap").head.getLong(0) == 3L)

    // now a second stage, head moves underneath, publish via cherrypick
    val f2 = new java.io.File(dataDir, "staged2.parquet")
    val n2 = graft.sources.IcebergLayoutWriter.writeSingleParquet(
      Seq(200L).toDF("k"), f2)
    val staged2 = graft.sources.LayoutMaintenance.stageAppend(spark, dir,
      Seq(graft.sources.IcebergLayoutWriter.ManifestEntrySpec(status = 1,
        content = 0, filePath = f2.getAbsolutePath, recordCount = n2,
        sizeBytes = f2.length(), sequenceNumber = 0L)), branch = "audit2")
    spark.sql("INSERT INTO proctest.db.wap VALUES (5)") // head advances
    val cp = spark.sql(
      s"CALL proctest.system.cherrypick_snapshot('db.wap', $staged2)")
      .collect().head
    assert(cp.getLong(0) == staged2)
    assert(spark.sql("SELECT count(*) FROM proctest.db.wap").head.getLong(0) == 5L)
  }

  test("remove_orphan_files: dry run lists, real run deletes, live data intact") {
    spark.sql("CREATE TABLE proctest.db.orf (k BIGINT) USING `graft-iceberg`")
    spark.sql("INSERT INTO proctest.db.orf SELECT id FROM range(10)")
    spark.sql("INSERT INTO proctest.db.orf SELECT id FROM range(10, 20)")
    // roll back so snapshot 2's file is HISTORIC but still referenced —
    // orphan removal must never reclaim time-travelable files
    spark.sql("CALL proctest.system.rollback_to_snapshot('db.orf', 1)")
    val dataDir = new java.io.File(dirOf("orf"), "data")
    val orphan = new java.io.File(dataDir, "leaked-task-attempt.parquet")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    val dry = spark.sql("CALL proctest.system.remove_orphan_files('db.orf')")
      .collect()
    assert(dry.length == 1 && dry.head.getString(0).endsWith("leaked-task-attempt.parquet"))
    assert(!dry.head.getBoolean(1) && orphan.exists())
    val real = spark.sql(
      "CALL proctest.system.remove_orphan_files('db.orf', dry_run => false)")
      .collect()
    assert(real.length == 1 && real.head.getBoolean(1))
    assert(!orphan.exists())
    // live head AND the rolled-back-but-referenced snapshot both intact
    assert(spark.sql("SELECT count(*) FROM proctest.db.orf").head.getLong(0) == 10L)
    spark.sql("CALL proctest.system.set_current_snapshot('db.orf', 2)")
    assert(spark.sql("SELECT count(*) FROM proctest.db.orf").head.getLong(0) == 20L)
  }

  test("unknown procedure and wrong namespace fail loudly") {
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
    val e1 = intercept[Exception] {
      spark.sql("CALL proctest.system.no_such_proc('db.rb')").collect()
    }
    assert(chain(e1).contains("FAILED_TO_LOAD_ROUTINE") ||
      chain(e1).contains("no procedure"))
    val e2 = intercept[Exception] {
      spark.sql("CALL proctest.other.rollback_to_snapshot('db.rb', 1)").collect()
    }
    assert(chain(e2).toLowerCase.contains("routine") ||
      chain(e2).toLowerCase.contains("system"))
  }
}
