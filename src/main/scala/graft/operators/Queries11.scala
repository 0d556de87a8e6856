package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.metrics.MetricsCalculator
import graft.model.EngineConfig

/** Round-8 batch: the Iceberg partition-transform surface end-to-end.
  *
  * q168 closes VERDICT r7 missing #3: the reference's diagnostics read
  * partition values that a spec-compliant writer derived with the
  * public Iceberg partition transforms (`day`, `bucket[N]`,
  * `truncate[W]` — spec "Partition Transforms" / Appendix B), its table
  * library applying them transparently (`manager.py:154-186`). Here the
  * transforms are first-class ([[graft.sources.PartitionTransforms]]):
  * the bucket hash is the spec's murmur3_x86_32 UNROLLED as pure Column
  * arithmetic (two mix blocks for an 8-byte key — stays in whole-stage
  * codegen, no UDF), and the DuckDB oracle re-derives the identical
  * hash from the same 32-bit modular arithmetic, so the transform
  * values themselves are hash-gated cross-engine, not just spec-pinned.
  *
  * Oracle-parity conventions as in [[Queries]]: identical aliases both
  * sides, CAST integer sums to BIGINT, one final division for any
  * double, full ORDER BY tie-breaks.
  */
object Queries11 {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    Rel.t(dir, name)

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- the 9-metric diagnostics pipeline over a REAL written layout
    // whose partition spec uses all three value transforms: partition =
    // (day(ts), bucket[8](user_id), truncate[2](event_type)), file grain
    // = partition x (event_id % 4), content cycling 0/1/2 per file so
    // the data/delete asymmetry rides the real manifest split (data +
    // delete manifests -> manifest count 2 seeds A3). The writer stores
    // TRANSFORMED values in the manifests and declares the spec in
    // metadata `partition-specs`; the reader canonicalizes the partition
    // record to the JSON pk the metrics group on. Every pk string is a
    // transform output, so the whole metric row hash-gates day/bucket/
    // truncate at once. The grouped collect is the bounded fixture state
    // (<= days x 8 x 5 x 4 rows, metadata-sized); the distributed read
    // path is what's under test. At 100 TB the transform derivation is
    // row-level codegen arithmetic (no UDF, no shuffle added) and the
    // manifest scan stays one-task-per-manifest.
    "q168_transform_partitioned_metrics" -> { (s, dir) => implicit val sp = s
      import graft.sources.{IcebergLayoutWriter, IcebergManifestSource, PartitionTransforms => PT}
      val fileRows = Rel.events(dir)
        .select(
          PT.dayCol(col("tsx")).as("d"),
          PT.bucketLongCol(col("user_id"), 8).as("b"),
          PT.truncateStringCol(col("event_type"), 2).as("tr"),
          (col("event_id") % 4).cast("int").as("sub"),
          (col("event_id") % 997).as("m"))
        .groupBy(col("d"), col("b"), col("tr"), col("sub"))
        .agg(count(lit(1)).as("rc"), sum(col("m")).as("ssum"))
        .collect()
        .sortBy(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getInt(3)))
      val tbl = TmpFixture.dir("q168", dir)
      IcebergLayoutWriter.writeTable(tbl, fileRows.map { r =>
        val (d, b, tr, sub) = (r.getInt(0), r.getInt(1), r.getString(2), r.getInt(3))
        IcebergLayoutWriter.ManifestEntrySpec(
          status = 1, content = sub % 3,
          filePath = s"data/f-$d-$b-$tr-$sub.parquet",
          partition = Seq("ts_day" -> d, "uid_bucket" -> b, "etype_tr" -> tr),
          recordCount = r.getLong(4),
          sizeBytes = (r.getLong(5) + 100L * r.getLong(4)) * 65536L)
      }.toSeq, partitionSpec = Seq(
        ("ts_day", "day", 2), ("uid_bucket", "bucket[8]", 3),
        ("etype_tr", "truncate[2]", 4)))
      // the reader must interpret the written layout's declared spec —
      // fail loudly (Verify errs the row) if the metadata round trip drops it
      val spec = IcebergManifestSource.partitionSpec(s, tbl.getPath)
      require(spec == Seq(("ts_day", "day", 2), ("uid_bucket", "bucket[8]", 3),
        ("etype_tr", "truncate[2]", 4)), s"partition spec round trip broke: $spec")
      val (files, nManifests) = IcebergManifestSource.fromTableDir(s, tbl.getPath, "t")
      val manifests = s.createDataset(Seq(("t", nManifests)))(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.scalaLong))
      MetricsCalculator.computeMetricsWide(files, manifests, EngineConfig.default)
        .toDF()
        .select(
          col("fullScanOverheadBefore").as("full_scan_before"),
          col("fullScanOverheadAfter").as("full_scan_after"),
          col("worstScanOverheadBefore").as("worst_scan_before"),
          col("worstScanOverheadAfter").as("worst_scan_after"),
          col("fileCountBefore").as("file_count_before"),
          col("fileCountAfter").as("file_count_after"),
          col("worstFileCountBefore").as("worst_fc_before"),
          col("worstFileCountAfter").as("worst_fc_after"),
          round(col("avgFileSize"), 4).as("avg_data_size"),
          round(col("worstAvgFileSize"), 4).as("worst_avg_size"),
          col("totalTableSize").as("total_size"),
          col("largestPartitionSize").as("largest_partition"),
          col("totalPartitions").as("n_partitions"))
    },

    // ---- incremental snapshot changelog over a REAL multi-snapshot
    // layout (Iceberg's incremental-read surface; q52's snapshot-diff
    // semantics lifted onto written metadata): snapshot 1 is eight files
    // f0..f7; snapshot 2 compacts f0..f3 into c0/c1, KEEPS f4..f7
    // byte-identical (they must drop out of the diff — file immutability
    // makes path identity sufficient), and adds a position-delete file.
    // changesBetween reads both endpoints as pinned lazy manifest scans
    // and diffs on ONE full-outer join of manifest-sized relations — no
    // data I/O, which is the whole point of metadata-driven changelogs
    // at 100 TB. Every row (path, content, change, rc, bytes) is
    // hash-gated against DuckDB recomputing the fixture arithmetic.
    "q169_snapshot_changelog" -> { (s, dir) => implicit val sp = s
      import graft.sources.{IcebergLayoutWriter, IcebergManifestSource}
      import graft.sources.IcebergLayoutWriter.ManifestEntrySpec
      val stats = t(dir, "lineitem")
        .groupBy(least(floor(col("l_extendedprice") / 12000).cast("long"), lit(7L))
          .as("fid"))
        .agg(count(lit(1)).as("rc"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val nDel = t(dir, "lineitem").filter(col("l_orderkey") % 13 === 0).count()
      def dataFile(path: String, rc: Long, seq: Long) =
        ManifestEntrySpec(status = 1, content = 0, filePath = path,
          recordCount = rc, sizeBytes = rc * 100L, sequenceNumber = seq)
      val snap1 = stats.map { case (fid, rc) => dataFile(s"f$fid.parquet", rc, 1L) }
      val compacted = stats.filter(_._1 < 4).groupBy(_._1 / 2).toSeq.sortBy(_._1)
        .map { case (fid2, grp) => dataFile(s"c$fid2.parquet", grp.map(_._2).sum, 2L) }
      val kept = stats.filter(_._1 >= 4).map { case (fid, rc) =>
        dataFile(s"f$fid.parquet", rc, 1L)
      }
      val snap2 = compacted ++ kept :+ ManifestEntrySpec(status = 1, content = 1,
        filePath = "del0.parquet", recordCount = nDel, sizeBytes = nDel * 20L + 40L,
        sequenceNumber = 2L)
      val tbl = TmpFixture.dir("q169", dir)
      IcebergLayoutWriter.writeTableSnapshots(tbl,
        Seq(1L -> snap1.toSeq, 2L -> snap2.toSeq))
      IcebergManifestSource.changesBetween(s, tbl.getPath, "t", 1L, 2L)
        .orderBy(col("change"), col("file_path"))
    })

  /** The spec murmur3_x86_32 of a BIGINT's 8-byte little-endian form,
    * unrolled as sequential CTE steps over a relation `uids(u)` (two mix
    * blocks + finalization; HUGEINT only bridges the 32x32-bit
    * multiplies). Ends with `mmh(u, h)` where h is the UNSIGNED 32-bit
    * hash — bucket masks bit 31 (`h & 2147483647`), so unsigned vs
    * signed never matters downstream. */
  private val murmurSql =
    """mm0 AS (SELECT u, u & 4294967295 AS kk1, (u >> 32) & 4294967295 AS kk2 FROM uids),
      |mm1 AS (SELECT u, kk2, CAST(CAST(kk1 AS HUGEINT) * 3432918353 % 4294967296 AS BIGINT) AS k FROM mm0),
      |mm2 AS (SELECT u, kk2, ((k << 15) % 4294967296) | (k >> 17) AS k FROM mm1),
      |mm3 AS (SELECT u, kk2, CAST(CAST(k AS HUGEINT) * 461845907 % 4294967296 AS BIGINT) AS k FROM mm2),
      |mm4 AS (SELECT u, kk2, ((k << 13) % 4294967296) | (k >> 19) AS h FROM mm3),
      |mm5 AS (SELECT u, kk2, CAST((CAST(h AS HUGEINT) * 5 + 3864292196) % 4294967296 AS BIGINT) AS h FROM mm4),
      |nn1 AS (SELECT u, h, CAST(CAST(kk2 AS HUGEINT) * 3432918353 % 4294967296 AS BIGINT) AS k FROM mm5),
      |nn2 AS (SELECT u, h, ((k << 15) % 4294967296) | (k >> 17) AS k FROM nn1),
      |nn3 AS (SELECT u, h, CAST(CAST(k AS HUGEINT) * 461845907 % 4294967296 AS BIGINT) AS k FROM nn2),
      |nn4 AS (SELECT u, xor(h, k) AS h FROM nn3),
      |nn5 AS (SELECT u, ((h << 13) % 4294967296) | (h >> 19) AS h FROM nn4),
      |nn6 AS (SELECT u, CAST((CAST(h AS HUGEINT) * 5 + 3864292196) % 4294967296 AS BIGINT) AS h FROM nn5),
      |ff1 AS (SELECT u, xor(h, 8) AS h FROM nn6),
      |ff2 AS (SELECT u, xor(h, h >> 16) AS h FROM ff1),
      |ff3 AS (SELECT u, CAST(CAST(h AS HUGEINT) * 2246822507 % 4294967296 AS BIGINT) AS h FROM ff2),
      |ff4 AS (SELECT u, xor(h, h >> 13) AS h FROM ff3),
      |ff5 AS (SELECT u, CAST(CAST(h AS HUGEINT) * 3266489909 % 4294967296 AS BIGINT) AS h FROM ff4),
      |mmh AS (SELECT u, xor(h, h >> 16) AS h FROM ff5)""".stripMargin

  def oracles: Map[String, String] = Map(

    "q168_transform_partitioned_metrics" -> {
      val cap = EngineConfig.default.maxGroupBytes
      val fetch = EngineConfig.default.fetchSize
      val ms = EngineConfig.default.msPerScan
      s"""WITH RECURSIVE uids AS (SELECT DISTINCT user_id AS u FROM events),
         |$murmurSql,
         |files AS (
         |  SELECT '{"ts_day":' || d || ',"uid_bucket":' || b || ',"etype_tr":"' || tr || '"}' AS pk,
         |         sub, CAST(sub % 3 AS INT) AS content,
         |         CAST((ssum + 100 * rc) * 65536 AS BIGINT) AS size
         |  FROM (SELECT date_diff('day', DATE '1970-01-01', CAST(e.ts AS DATE)) AS d,
         |               CAST((m.h & 2147483647) % 8 AS INT) AS b,
         |               substring(e.event_type, 1, 2) AS tr,
         |               CAST(e.event_id % 4 AS INT) AS sub,
         |               count(*) AS rc, sum(e.event_id % 997) AS ssum
         |        FROM events e JOIN mmh m ON e.user_id = m.u
         |        GROUP BY 1, 2, 3, 4)),
         |datafiles AS (
         |  SELECT pk, size, row_number() OVER (PARTITION BY pk ORDER BY size, sub) AS rn
         |  FROM files WHERE content = 0),
         |rec AS (
         |  SELECT pk, rn, size AS cur_sum, 1 AS group_id FROM datafiles WHERE rn = 1
         |  UNION ALL
         |  SELECT d.pk, d.rn,
         |    CASE WHEN rec.cur_sum > $cap THEN d.size ELSE rec.cur_sum + d.size END,
         |    CASE WHEN rec.cur_sum > $cap THEN rec.group_id + 1 ELSE rec.group_id END
         |  FROM rec JOIN datafiles d ON d.pk = rec.pk AND d.rn = rec.rn + 1),
         |groups_ AS (
         |  SELECT pk, group_id, max(cur_sum) AS gsum FROM rec GROUP BY pk, group_id),
         |after_pk AS (
         |  SELECT pk, max(group_id) AS n_groups,
         |         sum(gsum // $fetch + 2) AS after_overhead
         |  FROM groups_ GROUP BY pk),
         |before_pk AS (
         |  SELECT pk, count(*) AS fc, sum(size) AS tsz,
         |         sum(size // $fetch + 2) AS ovh,
         |         count(CASE WHEN content = 0 THEN 1 END) AS dc,
         |         sum(CASE WHEN content = 0 THEN size END) AS dsz
         |  FROM files GROUP BY pk),
         |per_pk AS (
         |  SELECT b.*, coalesce(a.n_groups, 0) AS n_groups,
         |         coalesce(a.after_overhead, 0) AS after_overhead
         |  FROM before_pk b LEFT JOIN after_pk a USING (pk)),
         |worst_fc AS (
         |  SELECT fc, n_groups, fc - n_groups AS red FROM per_pk
         |  ORDER BY red DESC, pk DESC LIMIT 1),
         |worst_so AS (
         |  SELECT ovh, after_overhead, ovh - after_overhead AS red FROM per_pk
         |  ORDER BY red DESC, pk DESC LIMIT 1)
         |SELECT
         |  (SELECT CAST(sum(ovh) + 2 * $ms AS BIGINT) FROM per_pk) AS full_scan_before,
         |  (SELECT CAST(sum(after_overhead) AS BIGINT) FROM per_pk) AS full_scan_after,
         |  (SELECT CAST(CASE WHEN red > 0 THEN ovh ELSE 0 END AS BIGINT) FROM worst_so) AS worst_scan_before,
         |  (SELECT CAST(CASE WHEN red > 0 THEN after_overhead ELSE 0 END AS BIGINT) FROM worst_so) AS worst_scan_after,
         |  (SELECT CAST(sum(fc) AS BIGINT) FROM per_pk) AS file_count_before,
         |  (SELECT CAST(sum(n_groups) AS BIGINT) FROM per_pk) AS file_count_after,
         |  (SELECT CAST(CASE WHEN red > 0 THEN fc ELSE 0 END AS BIGINT) FROM worst_fc) AS worst_fc_before,
         |  (SELECT CAST(CASE WHEN red > 0 THEN n_groups ELSE 0 END AS BIGINT) FROM worst_fc) AS worst_fc_after,
         |  (SELECT round(CAST(sum(dsz) AS DOUBLE) / sum(dc), 4) FROM per_pk) AS avg_data_size,
         |  (SELECT round(min(CAST(tsz AS DOUBLE) / fc), 4) FROM per_pk) AS worst_avg_size,
         |  (SELECT CAST(sum(tsz) AS BIGINT) FROM per_pk) AS total_size,
         |  (SELECT CAST(max(tsz) AS BIGINT) FROM per_pk) AS largest_partition,
         |  (SELECT count(*) FROM per_pk) AS n_partitions""".stripMargin
    },

    "q169_snapshot_changelog" ->
      """WITH b AS (
        |  SELECT LEAST(CAST(FLOOR(l_extendedprice / 12000) AS BIGINT), 7) AS fid
        |  FROM lineitem),
        |s1 AS (SELECT fid, CAST(count(*) AS BIGINT) AS rc FROM b GROUP BY fid),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem
        |       WHERE l_orderkey % 13 = 0),
        |removed AS (
        |  SELECT 'f' || fid || '.parquet' AS file_path, CAST(0 AS INT) AS content,
        |         'removed' AS change, rc AS record_count,
        |         CAST(rc * 100 AS BIGINT) AS size_bytes
        |  FROM s1 WHERE fid < 4),
        |added_data AS (
        |  SELECT 'c' || (fid // 2) || '.parquet' AS file_path, CAST(0 AS INT),
        |         'added', CAST(sum(rc) AS BIGINT),
        |         CAST(sum(rc) * 100 AS BIGINT)
        |  FROM s1 WHERE fid < 4 GROUP BY fid // 2),
        |added_del AS (
        |  SELECT 'del0.parquet', CAST(1 AS INT), 'added', n,
        |         CAST(n * 20 + 40 AS BIGINT) FROM nd)
        |SELECT * FROM removed UNION ALL SELECT * FROM added_data
        |UNION ALL SELECT * FROM added_del
        |ORDER BY change, file_path""".stripMargin)
}
