package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{IcebergLayoutWriter, LayoutMaintenance, MorRead}
import graft.sources.IcebergLayoutWriter.ManifestEntrySpec

/** Ref retention under expire (spec "Refs" + Iceberg's RemoveSnapshots
  * semantics): `max-ref-age-ms` ages a ref out of existence during
  * snapshot expiration; a surviving branch's `min-snapshots-to-keep` /
  * `max-snapshot-age-ms` protect its ANCESTRY, not just its head. The
  * fields land via the ref DDL's RETAIN / WITH SNAPSHOT RETENTION
  * clauses and are honored here. */
class RefRetentionSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def build(tag: String, appends: Int): java.io.File = {
    import spark.implicits._
    val tbl = new java.io.File(s"target/tmp-refret-$tag")
    org.apache.commons.io.FileUtils.deleteQuietly(tbl)
    val dataDir = new java.io.File(tbl, "data"); dataDir.mkdirs()
    (0 until appends).foreach { i =>
      val f = new java.io.File(dataDir, s"f$i.parquet")
      val n = IcebergLayoutWriter.writeSingleParquet(
        Seq((i.toLong, i.toLong)).toDF("k", "b"), f)
      LayoutMaintenance.commitAppend(spark, tbl.getPath, Seq(
        ManifestEntrySpec(status = 1, content = 0,
          filePath = f.getAbsolutePath, recordCount = n,
          sizeBytes = f.length())))
    }
    tbl
  }

  /** Backdate a snapshot's commit timestamp (what age is measured from). */
  private def backdate(tbl: java.io.File, snapId: Long, ageMs: Long): Unit = {
    val meta = new java.io.File(tbl, "metadata")
    val hint = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(meta, "version-hint.text").toPath), "UTF-8").trim
    val cur = new java.io.File(meta, s"v$hint.metadata.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(cur)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    root.get("snapshots").forEach { n =>
      if (n.get("snapshot-id").asLong() == snapId)
        n.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          .put("timestamp-ms", System.currentTimeMillis() - ageMs)
    }
    java.nio.file.Files.write(cur.toPath, mapper.writeValueAsBytes(root))
  }

  private def refNames(tbl: java.io.File): Set[String] = {
    val meta = new java.io.File(tbl, "metadata")
    val hint = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(meta, "version-hint.text").toPath), "UTF-8").trim
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new java.io.File(meta, s"v$hint.metadata.json")).get("refs")
    if (node == null) Set.empty
    else {
      val out = Set.newBuilder[String]
      node.fieldNames().forEachRemaining(out += _)
      out.result()
    }
  }

  test("max-ref-age-ms ages a ref out during expire; its snapshot follows") {
    val tbl = build("age", 4)
    LayoutMaintenance.setRef(spark, tbl.getPath, "old_tag", "tag",
      Some(2L), maxRefAgeMs = Some(60L * 1000))
    LayoutMaintenance.setRef(spark, tbl.getPath, "young_tag", "tag",
      Some(3L), maxRefAgeMs = Some(7L * 24 * 3600 * 1000))
    backdate(tbl, 2L, ageMs = 3600L * 1000) // old_tag's snapshot: 1h old
    val (kept, _) =
      LayoutMaintenance.expireSnapshots(spark, tbl.getPath, keepLast = 1)
    assert(refNames(tbl) == Set("young_tag"),
      s"aged-out ref must drop, young one survive: ${refNames(tbl)}")
    assert(kept.contains(3L) && kept.contains(4L) && !kept.contains(2L),
      s"the aged ref's snapshot must expire with it: $kept")
    assert(MorRead.readTable(spark, tbl.getPath).count() == 4L)
  }

  test("branch snapshot retention protects ancestry: min-snapshots-to-keep") {
    val tbl = build("minkeep", 5)
    // branch at snapshot 4 keeping its last 3 ancestors (2,3,4)
    LayoutMaintenance.setRef(spark, tbl.getPath, "audit", "branch",
      Some(4L), minSnapshotsToKeep = Some(3))
    val (kept, _) =
      LayoutMaintenance.expireSnapshots(spark, tbl.getPath, keepLast = 1)
    assert(kept.toSet == Set(2L, 3L, 4L, 5L),
      s"branch must keep 3 ancestors + head keeps 5: $kept")
    // without retention fields the same shape keeps ONLY the target
    val twin = build("minkeep2", 5)
    LayoutMaintenance.setRef(spark, twin.getPath, "audit", "branch",
      Some(4L))
    val (kept2, _) =
      LayoutMaintenance.expireSnapshots(spark, twin.getPath, keepLast = 1)
    assert(kept2.toSet == Set(4L, 5L),
      s"default branch retention is head-only: $kept2")
  }

  test("branch max-snapshot-age-ms keeps young ancestors beyond min") {
    val tbl = build("snapage", 5)
    LayoutMaintenance.setRef(spark, tbl.getPath, "audit", "branch",
      Some(5L), minSnapshotsToKeep = Some(1),
      maxSnapshotAgeMs = Some(7L * 24 * 3600 * 1000))
    backdate(tbl, 1L, ageMs = 30L * 24 * 3600 * 1000) // 30 days: too old
    backdate(tbl, 2L, ageMs = 30L * 24 * 3600 * 1000)
    val (kept, _) =
      LayoutMaintenance.expireSnapshots(spark, tbl.getPath, keepLast = 1)
    assert(kept.toSet == Set(3L, 4L, 5L),
      s"young ancestors survive via max-snapshot-age-ms: $kept")
  }

  test("SQL RETAIN clause drives the same expiry (DDL to expire, one path)") {
    val s = spark
    val wh = new java.io.File("target/tmp-refret-wh")
    org.apache.commons.io.FileUtils.deleteQuietly(wh)
    s.conf.set("spark.sql.catalog.refret",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.refret.warehouse", wh.getAbsolutePath)
    s.sql("CREATE NAMESPACE IF NOT EXISTS refret.db")
    s.sql("CREATE TABLE refret.db.t (k BIGINT) USING `graft-iceberg`")
    s.sql("INSERT INTO refret.db.t VALUES (1)")
    s.sql("INSERT INTO refret.db.t VALUES (2)")
    s.sql("INSERT INTO refret.db.t VALUES (3)")
    s.sql("ALTER TABLE refret.db.t CREATE TAG ephemeral " +
      "AS OF VERSION 1 RETAIN 1 MINUTES")
    val dir = new java.io.File("target/tmp-refret-wh/db/t")
    backdate(dir, 1L, ageMs = 3600L * 1000)
    s.sql("CALL refret.system.expire_snapshots('db.t', retain_last => 1)")
    assert(refNames(dir).isEmpty, "the RETAIN-expired tag must be gone")
    assert(LayoutMaintenance.snapshotIds(spark, dir.getPath) == Seq(3L))
  }
}
