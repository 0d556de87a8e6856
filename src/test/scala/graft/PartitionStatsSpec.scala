package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{LayoutMaintenance, MetadataTables}

/** Partition statistics files (spec "Partition statistics"): the
  * per-partition rollup materialized once as a KB-sized parquet file,
  * registered in metadata, SERVED by `$partitions` while fresh, and
  * abandoned for the manifest scan the moment the table advances —
  * never a stale answer, never a manifest re-scan when the file is
  * current. */
class PartitionStatsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSpec.spark
    val wh = new java.io.File("target/tmp-pstats-wh")
    org.apache.commons.io.FileUtils.deleteQuietly(wh)
    s.conf.set("spark.sql.catalog.pstats",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.pstats.warehouse", wh.getAbsolutePath)
    s.sql("CREATE NAMESPACE IF NOT EXISTS pstats.db")
    s
  }

  private val dir = "target/tmp-pstats-wh/db/t"

  private def rollup(df: org.apache.spark.sql.DataFrame)
      : Seq[(String, Long, Long, Long)] =
    df.select("partition", "file_count", "record_count", "total_size")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq

  test("fresh stats serve $partitions from the file; staleness falls back; recompute re-arms") {
    spark.sql("CREATE TABLE pstats.db.t (k BIGINT, part BIGINT) " +
      "USING `graft-iceberg` PARTITIONED BY (part)")
    spark.sql("INSERT INTO pstats.db.t " +
      "SELECT id, id % 3 FROM range(0, 90)")
    val fromManifests =
      rollup(MetadataTables.partitionsFromManifests(spark, dir))
    assert(fromManifests.size == 3 && fromManifests.map(_._3).sum == 90L)
    // before compute: the default arm IS the manifest arm
    assert(rollup(MetadataTables.partitions(spark, dir)) == fromManifests)
    val r = spark.sql(
      "CALL pstats.system.compute_partition_stats('db.t')").head
    val statsPath = r.getString(0)
    assert(r.getLong(2) == 3L)
    assert(new java.io.File(statsPath).exists() &&
      statsPath.contains("/metadata/"),
      s"stats live under metadata/: $statsPath")
    // fresh: $partitions serves FROM THE FILE (planning reads KBs) and
    // agrees with the manifest scan exactly
    val served = MetadataTables.partitions(spark, dir)
    assert(served.inputFiles.toSeq.map(_.replaceFirst("^file:/+", "/"))
      == Seq(statsPath), "fresh stats must be the ONLY input")
    assert(rollup(served) == fromManifests,
      "stats arm and manifest arm must agree exactly")
    // SQL surface serves the same rollup
    assert(spark.sql("SELECT sum(record_count) FROM pstats.db.t.partitions")
      .head.getLong(0) == 90L)
    // STALENESS: a commit advances the table → fall back to manifests
    spark.sql("INSERT INTO pstats.db.t SELECT id, 3 FROM range(0, 10)")
    assert(LayoutMaintenance.freshPartitionStats(spark, dir).isEmpty,
      "advanced table must report no fresh stats")
    val afterInsert = MetadataTables.partitions(spark, dir)
    assert(!afterInsert.inputFiles.exists(
      _.replaceFirst("^file:/+", "/") == statsPath),
      "stale stats must not serve")
    assert(rollup(afterInsert).size == 4 &&
      rollup(afterInsert).map(_._3).sum == 100L,
      "fallback must see the new commit")
    // recompute re-arms the fast path at the new snapshot; the old
    // snapshot's entry is replaced only for the SAME snapshot — a new
    // one accretes
    val r2 = spark.sql(
      "CALL pstats.system.compute_partition_stats('db.t')").head
    assert(r2.getLong(2) == 4L)
    val served2 = MetadataTables.partitions(spark, dir)
    assert(served2.inputFiles.toSeq
      .map(_.replaceFirst("^file:/+", "/")) == Seq(r2.getString(0)))
    assert(rollup(served2).map(_._3).sum == 100L)
    // a snapshot-PINNED read serves from the entry registered for
    // EXACTLY that snapshot (entries describe their own snapshot)…
    val snaps = LayoutMaintenance.snapshotIds(spark, dir)
    val pinned = MetadataTables.partitions(spark, dir, Some(snaps.head))
    assert(pinned.inputFiles.toSeq
      .map(_.replaceFirst("^file:/+", "/")) == Seq(statsPath),
      "a pinned read must serve from its snapshot's registered stats")
    assert(rollup(pinned).map(_._3).sum == 90L,
      "pinned stats must reflect the pinned snapshot exactly")
    // …each snapshot's pin resolves its OWN entry, never a neighbor's
    val pinned2 = MetadataTables.partitions(spark, dir, Some(snaps(1)))
    assert(pinned2.inputFiles.toSeq
      .map(_.replaceFirst("^file:/+", "/")) == Seq(r2.getString(0)))
    assert(rollup(pinned2).map(_._3).sum == 100L)
  }

  test("incremental update from the manifest diff equals the full recompute") {
    spark.sql("CREATE TABLE pstats.db.inc (k BIGINT, part BIGINT) " +
      "USING `graft-iceberg` PARTITIONED BY (part) " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    val dir = "target/tmp-pstats-wh/db/inc"
    spark.sql("INSERT INTO pstats.db.inc SELECT id, id % 3 FROM range(0, 90)")
    val r0 = spark.sql(
      "CALL pstats.system.compute_partition_stats('db.inc')").head
    assert(r0.getString(3) == "full", "first compute has no prior: full")
    // appends + a tombstone commit + a rewrite (drops old manifests,
    // adds new ones) — the worst composite shape for a delta
    spark.sql("INSERT INTO pstats.db.inc SELECT id, 3 FROM range(0, 10)")
    spark.sql("DELETE FROM pstats.db.inc WHERE k % 9 = 1")
    LayoutMaintenance.rewriteSmallFiles(spark, dir,
      maxGroupBytes = 1L << 30, smallFileBytes = 1L << 20)
    val full = rollup(MetadataTables.partitionsFromManifests(spark, dir))
    val r1 = spark.sql(
      "CALL pstats.system.compute_partition_stats('db.inc')").head
    assert(r1.getString(3) == "incremental",
      s"a prior ancestor stats file must drive the delta arm: $r1")
    val served = MetadataTables.partitions(spark, dir)
    assert(served.inputFiles.toSeq
      .map(_.replaceFirst("^file:/+", "/")) == Seq(r1.getString(0)))
    assert(rollup(served) == full,
      "incremental stats must equal the full recompute exactly")
    // delete-file counts agree too (the signed delta spans all contents)
    val posServed = served.select(sum("position_delete_file_count"))
      .head.getLong(0)
    val posFull = MetadataTables.partitionsFromManifests(spark, dir)
      .select(sum("position_delete_file_count")).head.getLong(0)
    assert(posServed == posFull)
    // mode=full still available and identical
    val r2 = spark.sql("CALL pstats.system.compute_partition_stats(" +
      "'db.inc', mode => 'full')").head
    assert(r2.getString(3) == "full")
    assert(rollup(MetadataTables.partitions(spark, dir)) == full)
    // a partition emptied by a later overwrite DROPS from the delta
    spark.sql("INSERT OVERWRITE pstats.db.inc " +
      "SELECT id, id % 2 FROM range(0, 40)")
    val r3 = spark.sql(
      "CALL pstats.system.compute_partition_stats('db.inc')").head
    assert(r3.getString(3) == "incremental")
    val after = rollup(MetadataTables.partitions(spark, dir))
    assert(after == rollup(
      MetadataTables.partitionsFromManifests(spark, dir)),
      "post-overwrite incremental must equal full (emptied partitions drop)")
    assert(after.size == 2, s"only the overwrite's partitions remain: $after")
  }

  test("MOR delete advances the table: stats from before it never serve") {
    spark.sql("CREATE TABLE pstats.db.m (k BIGINT, part BIGINT) " +
      "USING `graft-iceberg` PARTITIONED BY (part) " +
      "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO pstats.db.m SELECT id, id % 2 FROM range(0, 40)")
    val mdir = "target/tmp-pstats-wh/db/m"
    spark.sql("CALL pstats.system.compute_partition_stats('db.m')")
    assert(LayoutMaintenance.freshPartitionStats(spark, mdir).isDefined)
    spark.sql("DELETE FROM pstats.db.m WHERE k % 5 = 0")
    assert(LayoutMaintenance.freshPartitionStats(spark, mdir).isEmpty,
      "a tombstone commit is a commit: stats must go stale")
    // fallback reflects the delete-file accretion
    val after = MetadataTables.partitions(spark, mdir)
    assert(after.select(sum("position_delete_file_count")).head.getLong(0) > 0L)
  }
}
