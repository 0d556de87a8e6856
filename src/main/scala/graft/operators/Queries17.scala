package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 batch: the spec's remaining TYPE surface and the metadata
  * relations a debugging user reaches for —
  *
  *  - wide decimals (q285): DECIMAL(precision 19–38) lake columns in
  *    all three data-file formats, encoded per the Iceberg spec's
  *    fixed-length unscaled mapping (parquet FIXED_LEN_BYTE_ARRAY /
  *    avro `fixed` of minimum width, ORC native HiveDecimal — spec
  *    Appendix A; reference: the `file_format`-typed manifest entries
  *    iceberg-diag walks in `iceberg_diag/manager.py` carry these
  *    files like any other).
  *
  * Oracle-parity conventions as in [[Queries]]: identical aliases both
  * sides, exact string construction for money values (engine-identical
  * by definition), full ORDER BY tie-breaks.
  */
object Queries17 {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    Rel.t(dir, name)

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- WIDE DECIMALS (spec decimal(P,S), P>18 — fixed-length
    // unscaled encoding): values are built 22+ digits wide (cents
    // followed by 14 zeros, plus an exact 1e-10 fraction so the scale-10
    // tail is live), far past any long-backed range, written in all
    // THREE formats in one table (format flipped between inserts), a
    // wide-decimal-predicate MOR DELETE tombstones across the mix, and
    // the rollup SUMS the 38-digit decimal exactly — rendered AS STRING
    // so the hash compares the value, not engine result precisions.
    "q285_wide_decimal" -> { (s, dir) => implicit val sp = s
      val wh = TmpFixture.dir("q285wh", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(wh); wh.mkdirs()
      val cat = "graft_" + Integer.toHexString(wh.getAbsolutePath.hashCode)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.getAbsolutePath)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.wd")
      s.sql(s"DROP TABLE IF EXISTS $cat.wd.money")
      t(dir, "orders").createOrReplaceTempView("q285_src")
      s.sql(s"""CREATE TABLE $cat.wd.money (
               |  okey BIGINT, mon BIGINT, price DECIMAL(38,10))
               |USING `graft-iceberg` TBLPROPERTIES (
               |  'write.format.default' = 'parquet',
               |  'write.delete.mode' = 'merge-on-read')""".stripMargin)
      def insertYear(y: Int): Unit =
        s.sql(s"""INSERT INTO $cat.wd.money
                 |SELECT /*+ COALESCE(1) */ o_orderkey AS okey,
                 |  CAST(month(o_orderdate) AS BIGINT) AS mon,
                 |  CAST(CONCAT(CAST(cents AS STRING),
                 |    '00000000000000.0000000001') AS DECIMAL(38,10)) AS price
                 |FROM (SELECT *,
                 |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
                 |  FROM q285_src)
                 |WHERE year(o_orderdate) = $y""".stripMargin)
      insertYear(1995) // PARQUET: FIXED_LEN_BYTE_ARRAY(16) unscaled
      s.sql(s"ALTER TABLE $cat.wd.money " +
        "SET TBLPROPERTIES ('write.format.default' = 'orc')")
      insertYear(1996) // ORC: native decimal(38,10)
      s.sql(s"ALTER TABLE $cat.wd.money " +
        "SET TBLPROPERTIES ('write.format.default' = 'avro')")
      insertYear(1997) // AVRO: `fixed` dec_38_10 of 16 bytes
      val tdir = s"${wh.getAbsolutePath}/wd/money"
      val fmts = graft.sources.IcebergManifestSource
        .statsFromTableDir(s, tdir, "t", Nil)
        .filter(col("content") === 0)
        .select("file_format").distinct().collect()
        .map(_.getString(0)).toSet
      require(fmts == Set("PARQUET", "ORC", "AVRO"),
        s"wide decimals must ride all three formats: $fmts")
      // wide-decimal-predicate MOR delete across the mixed formats
      // (threshold = 300000.00 in q284's cents scale, 3 then 21 zeros)
      val thr = "3" + "0" * 21
      s.sql(s"DELETE FROM $cat.wd.money " +
        s"WHERE price >= CAST('$thr' AS DECIMAL(38,10))")
      require(graft.sources.IcebergManifestSource
        .statsFromTableDir(s, tdir, "t", Nil)
        .filter(col("content") === 1).count() > 0,
        "the wide-decimal DELETE must land tombstones")
      s.sql(s"""SELECT mon, count(*) AS n_orders,
               |  CAST(sum(price) AS STRING) AS sum_price,
               |  CAST(min(price) AS STRING) AS min_price,
               |  CAST(max(price) AS STRING) AS max_price
               |FROM $cat.wd.money
               |GROUP BY mon ORDER BY mon""".stripMargin)
    },

    // ---- VECTOR COLUMNS IN ORC AND AVRO (q275 lifted off its
    // parquet-only bound): the SAME embedding table accretes one ORC
    // slice and one AVRO slice (format flipped between inserts — ORC
    // ListColumnVector / avro array-of-union encodings, both read back
    // through the connector's recursive composite readers), then a MOR
    // DELETE tombstones across both formats — the ordinal-carrying
    // ORC/AVRO scans must handle the nested shape. Pinned in-query:
    // both formats live in the manifest, the delete moved no vector
    // byte (files carried verbatim), tombstones landed. The oracle
    // recomputes the element-exact rollup from the raw embeddings.
    "q286_vector_orc_avro" -> { (s, dir) => implicit val sp = s
      val wh = TmpFixture.dir("q286wh", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(wh); wh.mkdirs()
      val cat = "graft_" + Integer.toHexString(wh.getAbsolutePath.hashCode)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.getAbsolutePath)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.vo")
      s.sql(s"DROP TABLE IF EXISTS $cat.vo.emb")
      t(dir, "embeddings").createOrReplaceTempView("q286_src")
      s.sql(s"""CREATE TABLE $cat.vo.emb (vec_id BIGINT, e ARRAY<BIGINT>)
               |USING `graft-iceberg` TBLPROPERTIES (
               |  'write.format.default' = 'orc',
               |  'write.delete.mode' = 'merge-on-read')""".stripMargin)
      def insertHalf(mod: Int): Unit =
        s.sql(s"""INSERT INTO $cat.vo.emb
                 |SELECT vec_id, transform(embedding,
                 |  v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000) AS BIGINT)) AS e
                 |FROM q286_src WHERE vec_id % 2 = $mod""".stripMargin)
      insertHalf(0) // ORC lists
      s.sql(s"ALTER TABLE $cat.vo.emb " +
        "SET TBLPROPERTIES ('write.format.default' = 'avro')")
      insertHalf(1) // AVRO arrays
      val tdir = s"${wh.getAbsolutePath}/vo/emb"
      val fmts = graft.sources.IcebergManifestSource
        .statsFromTableDir(s, tdir, "t", Nil)
        .filter(col("content") === 0)
        .select("file_format").distinct().collect()
        .map(_.getString(0)).toSet
      require(fmts == Set("ORC", "AVRO"),
        s"vectors must ride ORC and AVRO: $fmts")
      val filesBefore = s.sql(s"SELECT DISTINCT _file FROM $cat.vo.emb")
        .collect().map(_.getString(0)).toSet
      s.sql(s"DELETE FROM $cat.vo.emb WHERE vec_id % 5 = 0")
      val filesAfter = s.sql(s"SELECT DISTINCT _file FROM $cat.vo.emb")
        .collect().map(_.getString(0)).toSet
      require(filesBefore == filesAfter,
        "MOR delete must carry the vector files verbatim")
      require(graft.sources.IcebergManifestSource
        .statsFromTableDir(s, tdir, "t", Nil)
        .filter(col("content") === 1).count() > 0,
        "the DELETE must land position tombstones")
      s.sql(s"""SELECT CAST(vec_id % 4 AS BIGINT) AS bucket,
               |  count(*) AS n_vecs,
               |  sum(aggregate(e, 0L, (a, x) -> a + x)) AS sum_elems,
               |  sum(aggregate(e, 0L, (a, x) -> a + x * x)) AS sum_sq,
               |  min(vec_id) AS min_vec, max(vec_id) AS max_vec
               |FROM $cat.vo.emb
               |GROUP BY 1 ORDER BY 1""".stripMargin)
    },

    // ---- THE `entries` METADATA-TABLE FAMILY (Iceberg's standard
    // debugging relations): an append→append→MOR-delete→rewrite history,
    // then pinned in-query —
    //   * `$entries` (current) names exactly the LIVE file set (the
    //     compacted file + tombstone), while `$entries` of the
    //     PRE-rewrite snapshot still names the small files;
    //   * `$all_entries` covers every (snapshot, file) pairing history
    //     reached, including files no current manifest names;
    //   * `$all_data_files ∪ $all_delete_files == $all_files` exactly
    //     (the role split partitions the reachability set);
    //   * `$all_partitions` rolls up every partition history touched.
    // The final rollup reads the post-rewrite table; DuckDB recomputes
    // it from predicate algebra on the source.
    "q287_entries_family" -> { (s, dir) => implicit val sp = s
      val wh = TmpFixture.dir("q287wh", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(wh); wh.mkdirs()
      val cat = "graft_" + Integer.toHexString(wh.getAbsolutePath.hashCode)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.getAbsolutePath)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.en")
      s.sql(s"DROP TABLE IF EXISTS $cat.en.prof")
      t(dir, "orders").createOrReplaceTempView("q287_src")
      s.sql(s"""CREATE TABLE $cat.en.prof (okey BIGINT, yr BIGINT)
               |USING `graft-iceberg` TBLPROPERTIES (
               |  'write.delete.mode' = 'merge-on-read',
               |  'pushdown.fields' = 'okey:1:long')""".stripMargin)
      (1995 to 1996).foreach { y =>
        s.sql(s"""INSERT INTO $cat.en.prof
                 |SELECT /*+ COALESCE(1) */ o_orderkey,
                 |  CAST(year(o_orderdate) AS BIGINT)
                 |FROM q287_src WHERE year(o_orderdate) = $y""".stripMargin)
      }
      s.sql(s"DELETE FROM $cat.en.prof WHERE okey % 10 = 3")
      val tdir = s"${wh.getAbsolutePath}/en/prof"
      val preRewriteSnap = s.sql(
        s"SELECT snapshot_id FROM $cat.en.prof.history " +
          "WHERE is_current_ancestor ORDER BY ordinal DESC LIMIT 1")
        .head.getLong(0)
      val preFiles = s.sql(
        s"SELECT DISTINCT file_path FROM $cat.en.prof.entries " +
          "WHERE content = 0").collect().map(_.getString(0)).toSet
      require(preFiles.size == 2, s"two small files expected: $preFiles")
      // (7) readable_metrics: every data file's per-column bounds
      // rendered AT THE COLUMN TYPE equal the scan's actual min/max per
      // file (round 14 — Iceberg's standard nested metrics struct on
      // $files/$entries)
      // ONE action serves the $files metrics pin AND the $entries
      // parity pin below (r16 pin fold; requires unchanged)
      val rmAll = s.sql(
        s"""SELECT 'f' AS src, file_path,
           |  readable_metrics.okey.lower_bound AS lo,
           |  readable_metrics.okey.upper_bound AS hi,
           |  record_count,
           |  readable_metrics.okey.value_count AS vc,
           |  readable_metrics.okey.null_value_count AS nc
           |FROM $cat.en.prof.files
           |WHERE content = 0
           |  AND readable_metrics.okey.lower_bound IS NOT NULL
           |UNION ALL
           |SELECT 'e', file_path,
           |  readable_metrics.okey.lower_bound,
           |  readable_metrics.okey.upper_bound,
           |  record_count, 0L, 0L
           |FROM $cat.en.prof.entries
           |WHERE content = 0 AND status != 2
           |  AND readable_metrics.okey.lower_bound IS NOT NULL
           |""".stripMargin).collect()
      val rmRows = rmAll.filter(_.getString(0) == "f")
        .map(r => org.apache.spark.sql.Row(r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      val rm = rmRows.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      require(rm.nonEmpty, "readable_metrics must serve data-file bounds")
      // value/null counts (spec fields 109/110) are REAL: value_count
      // equals the file's record_count, null_value_count is 0 (okey is
      // never null in the source)
      require(rmRows.forall(r => r.getLong(4) == r.getLong(3) &&
          r.getLong(5) == 0L),
        s"value/null counts must match the files: " +
          rmRows.map(_.toSeq).mkString("; "))
      val actual = s.sql(
        s"SELECT _file, min(okey), max(okey) FROM $cat.en.prof GROUP BY 1")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      // tombstoned rows may tighten the live min/max past the recorded
      // bound, but every recorded bound must CONTAIN the live range
      val liveOf = actual.map(t => t._1 -> ((t._2, t._3))).toMap
      rm.foreach { case (p, lo, hi) =>
        liveOf.get(p).foreach { case (lmin, lmax) =>
          require(lo <= lmin && hi >= lmax,
            s"readable_metrics bound [$lo,$hi] must contain [$lmin,$lmax]")
        }
      }
      // $entries serves the same struct (from the folded action above)
      val rmE = rmAll.filter(_.getString(0) == "e")
        .map(r => (r.getLong(2), r.getLong(3))).toSet
      require(rmE == rm.map(t => (t._2, t._3)).toSet,
        s"entries and files must agree on readable_metrics: $rmE")
      s.sql(s"CALL $cat.system.rewrite_data_files('en.prof')")
      // (1) current $entries names exactly the live set — ONE action
      // serves both relations (r16: sibling pins folded; every require
      // below is byte-identical to the unfolded form)
      val liveRows = s.sql(
        s"""SELECT 'e' AS src, file_path, content FROM $cat.en.prof.entries
           |UNION ALL
           |SELECT 'f', file_path, content FROM $cat.en.prof.files
           |""".stripMargin).collect()
      val liveEntries = liveRows.filter(_.getString(0) == "e")
        .map(r => (r.getString(1), r.getInt(2))).toSet
      val liveFiles = liveRows.filter(_.getString(0) == "f")
        .map(r => (r.getString(1), r.getInt(2))).toSet
      require(liveEntries == liveFiles,
        s"current entries must equal the live file set")
      require(!liveEntries.exists(e => preFiles.contains(e._1)),
        "the rewrite must have replaced both small files")
      // (2) the PRE-rewrite snapshot's entries still name them
      val oldEntries = graft.sources.MetadataTables
        .entries(s, tdir, Some(preRewriteSnap))
        .filter(col("content") === 0)
        .select(col("file_path")).distinct()
        .collect().map(_.getString(0)).toSet
      require(oldEntries == preFiles,
        s"pinned-snapshot entries must name the pre-rewrite files")
      // (3)+(5) one pass over all_entries serves the status pin AND the
      // reachability pin
      val aeRows = s.sql(
        s"SELECT DISTINCT status, content, file_path " +
          s"FROM $cat.en.prof.all_entries").collect()
      val statuses = aeRows.map(_.getInt(0)).toSet
      require(statuses.subsetOf(Set(0, 1, 2)) && statuses.contains(1),
        s"spec statuses expected: $statuses")
      val allEntryFiles = aeRows.filter(_.getInt(1) == 0)
        .map(_.getString(2)).toSet
      require(preFiles.subsetOf(allEntryFiles),
        "all_entries must still reach the compacted-away files")
      // (4)+(6) the four reachability counts in ONE action
      val counts = s.sql(
        s"""SELECT 'all' AS k, count(*) AS n FROM $cat.en.prof.all_files
           |UNION ALL SELECT 'data', count(*) FROM $cat.en.prof.all_data_files
           |UNION ALL SELECT 'del', count(*) FROM $cat.en.prof.all_delete_files
           |UNION ALL SELECT 'parts', count(*) FROM $cat.en.prof.all_partitions
           |""".stripMargin).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val (nAll, nAllData, nAllDel) =
        (counts("all"), counts("data"), counts("del"))
      require(nAllData + nAllDel == nAll && nAllData >= 3 && nAllDel >= 1,
        s"all_data_files + all_delete_files must partition all_files: " +
          s"$nAllData + $nAllDel != $nAll")
      require(counts("parts") == 1L,
        s"one partition bucket expected: ${counts("parts")}")
      // (8) ORC slice: column_size is recorded symmetrically from ORC
      // stripe stream lengths (round 15 — mixed-format readable_metrics
      // parity), alongside the parquet files' footer-derived sizes
      s.sql(s"ALTER TABLE $cat.en.prof SET TBLPROPERTIES (" +
        "'write.format.default' = 'orc')")
      s.sql(s"""INSERT INTO $cat.en.prof
               |SELECT /*+ COALESCE(1) */ o_orderkey,
               |  CAST(year(o_orderdate) AS BIGINT)
               |FROM q287_src WHERE year(o_orderdate) = 1997""".stripMargin)
      val orcSizes = s.sql(
        s"""SELECT f.readable_metrics.okey.column_size
           |FROM $cat.en.prof.files f
           |JOIN $cat.en.prof.entries e ON f.file_path = e.file_path
           |WHERE f.content = 0 AND e.file_format = 'ORC'""".stripMargin)
        .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
      require(orcSizes.nonEmpty && orcSizes.forall(_ > 0L),
        s"ORC column_size must record: ${orcSizes.mkString(",")}")
      // (9) NESTED readable_metrics (round 15): struct leaves key by
      // LEAF field id and render bounds/counts as `col.leaf` entries
      s.sql(s"DROP TABLE IF EXISTS $cat.en.nst")
      s.sql(s"CREATE TABLE $cat.en.nst (k BIGINT, " +
        "s STRUCT<lo: BIGINT, hi: BIGINT>) USING `graft-iceberg`")
      s.sql(s"""INSERT INTO $cat.en.nst
               |SELECT /*+ COALESCE(1) */ o_orderkey,
               |  named_struct('lo', o_orderkey % 7,
               |    'hi', o_orderkey % 7 + 100)
               |FROM q287_src WHERE year(o_orderdate) = 1995""".stripMargin)
      val nrm = s.sql(
        s"""SELECT readable_metrics.`s.lo`.lower_bound,
           |  readable_metrics.`s.hi`.upper_bound,
           |  readable_metrics.`s.lo`.value_count, record_count
           |FROM $cat.en.nst.files WHERE content = 0""".stripMargin).head
      require(nrm.getLong(0) == 0L && nrm.getLong(1) == 106L &&
        nrm.getLong(2) == nrm.getLong(3),
        s"nested leaf bounds/counts must serve: $nrm")
      s.sql(s"""SELECT yr, count(*) AS n_orders, min(okey) AS min_okey,
               |  sum(okey % 100) AS sum_mod
               |FROM $cat.en.prof
               |GROUP BY yr ORDER BY yr""".stripMargin)
    },

    // ---- V3 ROW LINEAGE (spec "Row Lineage"): data files get
    // `first_row_id` at commit from the table's `next-row-id` counter,
    // the scan serves `_row_id` / `_last_updated_sequence_number`
    // metadata columns, and a merge-on-read UPDATE MATERIALIZES the old
    // row id into the new row version — ids are STABLE under update,
    // only the touched rows' last-updated sequence moves. The insert is
    // ONE file in okey order, so `_row_id` == rank(okey) - 1 and the
    // ORACLE RECOMPUTES THE ACTUAL LINEAGE VALUES with a window
    // function — the row-id assignment itself is hash-gated, not just
    // counted. Pinned in-query: the full (okey → _row_id) map is
    // IDENTICAL before and after the UPDATE.
    "q288_row_lineage" -> { (s, dir) => implicit val sp = s
      val wh = TmpFixture.dir("q288wh", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(wh); wh.mkdirs()
      val cat = "graft_" + Integer.toHexString(wh.getAbsolutePath.hashCode)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.getAbsolutePath)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.rl")
      s.sql(s"DROP TABLE IF EXISTS $cat.rl.ord")
      t(dir, "orders").createOrReplaceTempView("q288_src")
      s.sql(s"""CREATE TABLE $cat.rl.ord (
               |  okey BIGINT, prio STRING, price BIGINT)
               |USING `graft-iceberg` TBLPROPERTIES (
               |  'write.update.mode' = 'merge-on-read',
               |  'write.delete.mode' = 'merge-on-read')""".stripMargin)
      s.sql(s"""INSERT INTO $cat.rl.ord
               |SELECT /*+ COALESCE(1) */ o_orderkey AS okey,
               |  o_orderpriority AS prio,
               |  CAST(FLOOR(o_totalprice) AS BIGINT) AS price
               |FROM q288_src WHERE year(o_orderdate) = 1995
               |ORDER BY o_orderkey""".stripMargin)
      val before = s.sql(s"SELECT okey, _row_id FROM $cat.rl.ord")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      require(before.values.toSeq.sorted ==
        (0L until before.size.toLong).toSeq,
        "row ids must be dense rank-of-okey (single ordered file)")
      s.sql(s"UPDATE $cat.rl.ord SET price = price + 1 WHERE okey % 7 = 0")
      val after = s.sql(s"SELECT okey, _row_id FROM $cat.rl.ord")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      require(after == before,
        "the UPDATE must keep every row's _row_id stable")
      val touched = s.sql(s"SELECT count(*) FROM $cat.rl.ord " +
        "WHERE _last_updated_sequence_number > 1").head.getLong(0)
      require(touched > 0 && s.sql(
        s"SELECT count(*) FROM $cat.rl.ord " +
          "WHERE _last_updated_sequence_number > 1 AND okey % 7 <> 0")
        .head.getLong(0) == 0L,
        "last-updated must move for EXACTLY the touched rows")
      // COMPACTION preserves lineage (spec v3: rewrites keep row ids):
      // every data file is replaced, yet the full (okey → _row_id,
      // _last_updated) state is IDENTICAL — the compacted file
      // materializes both columns
      val preRw = s.sql(s"SELECT okey, _row_id, " +
        s"_last_updated_sequence_number FROM $cat.rl.ord").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val filesPre = s.sql(s"SELECT DISTINCT _file FROM $cat.rl.ord")
        .collect().map(_.getString(0)).toSet
      s.sql(s"CALL $cat.system.rewrite_data_files('rl.ord')")
      val filesPost = s.sql(s"SELECT DISTINCT _file FROM $cat.rl.ord")
        .collect().map(_.getString(0)).toSet
      require(filesPre.intersect(filesPost).isEmpty,
        "the rewrite must replace every data file")
      val postRw = s.sql(s"SELECT okey, _row_id, " +
        s"_last_updated_sequence_number FROM $cat.rl.ord").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      require(postRw == preRw,
        "row lineage must survive compaction verbatim")
      s.sql(s"""SELECT prio, count(*) AS n_orders, sum(price) AS sum_price,
               |  count(DISTINCT _row_id) AS n_ids,
               |  min(_row_id) AS min_rid, max(_row_id) AS max_rid,
               |  sum(CASE WHEN _last_updated_sequence_number > 1
               |      THEN 1 ELSE 0 END) AS n_touched
               |FROM $cat.rl.ord
               |GROUP BY prio ORDER BY prio""".stripMargin)
    },

    // ---- TIMESTAMP_NTZ LAKE COLUMNS (the spec's tz-naive `timestamp`
    // type: parquet INT64 micros NOT UTC-adjusted, ORC zone-free
    // TIMESTAMP, avro local-timestamp-micros): naive event times ride
    // all THREE formats in one month(ntz)-PARTITIONED table (format
    // flipped between inserts), an NTZ-predicate MOR DELETE tombstones
    // across the mix, and the rollup renders min/max AS STRING — DuckDB
    // TIMESTAMP is naive by construction, so the hash compares the
    // wall-clock values with no zone arithmetic on either side.
    "q289_ntz_lake" -> { (s, dir) => implicit val sp = s
      val wh = TmpFixture.dir("q289wh", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(wh); wh.mkdirs()
      val cat = "graft_" + Integer.toHexString(wh.getAbsolutePath.hashCode)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.getAbsolutePath)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.nz")
      s.sql(s"DROP TABLE IF EXISTS $cat.nz.ev")
      t(dir, "orders").createOrReplaceTempView("q289_src")
      s.sql(s"""CREATE TABLE $cat.nz.ev (okey BIGINT, ts TIMESTAMP_NTZ)
               |USING `graft-iceberg` PARTITIONED BY (month(ts))
               |TBLPROPERTIES (
               |  'write.format.default' = 'parquet',
               |  'write.delete.mode' = 'merge-on-read')""".stripMargin)
      def insert(lo: Int, hi: Int): Unit =
        s.sql(s"""INSERT INTO $cat.nz.ev
                 |SELECT /*+ COALESCE(1) */ o_orderkey AS okey,
                 |  timestampadd(SECOND, CAST(o_orderkey % 86400 AS INT),
                 |    CAST(o_orderdate AS TIMESTAMP_NTZ)) AS ts
                 |FROM q289_src WHERE year(o_orderdate) = 1995
                 |  AND month(o_orderdate) BETWEEN $lo AND $hi""".stripMargin)
      insert(1, 4) // PARQUET: INT64 micros, isAdjustedToUTC = false
      s.sql(s"ALTER TABLE $cat.nz.ev " +
        "SET TBLPROPERTIES ('write.format.default' = 'orc')")
      insert(5, 8) // ORC: zone-free TIMESTAMP
      s.sql(s"ALTER TABLE $cat.nz.ev " +
        "SET TBLPROPERTIES ('write.format.default' = 'avro')")
      insert(9, 12) // AVRO: local-timestamp-micros
      val tdir = s"${wh.getAbsolutePath}/nz/ev"
      val fmts = graft.sources.IcebergManifestSource
        .statsFromTableDir(s, tdir, "t", Nil)
        .filter(col("content") === 0)
        .select("file_format").distinct().collect()
        .map(_.getString(0)).toSet
      require(fmts == Set("PARQUET", "ORC", "AVRO"),
        s"naive timestamps must ride all three formats: $fmts")
      // NTZ-predicate MOR delete across the mixed formats
      s.sql(s"DELETE FROM $cat.nz.ev " +
        "WHERE ts < TIMESTAMP_NTZ'1995-02-01 00:00:00' AND okey % 3 = 0")
      require(graft.sources.IcebergManifestSource
        .statsFromTableDir(s, tdir, "t", Nil)
        .filter(col("content") === 1).count() > 0,
        "the NTZ DELETE must land tombstones")
      s.sql(s"""SELECT CAST(month(ts) AS BIGINT) AS mon,
               |  count(*) AS n_events,
               |  CAST(min(ts) AS STRING) AS first_ts,
               |  CAST(max(ts) AS STRING) AS last_ts,
               |  min(okey) AS min_okey
               |FROM $cat.nz.ev
               |GROUP BY month(ts) ORDER BY mon""".stripMargin)
    },

    // ---- SIZE METRICS SERVED FROM PARTITION STATISTICS (the 9-metric
    // pipeline's A5–A9 arm short-circuited): after compute_partition_
    // stats, the size-family metrics come from the KB-sized stats file
    // with ZERO manifest I/O — pinned in-query EQUAL to the full
    // manifest-scan pipeline's values, field by field (the per-file arm
    // — overheads + the packer — keeps its manifest scan by design: it
    // needs file sizes). At thousands of tables this is the difference
    // between a size report reading KBs and re-walking every manifest.
    // The returned rollup reads the stats-served `$partitions` relation;
    // DuckDB recomputes record counts per partition from the source.
    "q290_metrics_from_stats" -> { (s, dir) => implicit val sp = s
      import s.implicits._
      val wh = TmpFixture.dir("q290wh", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(wh); wh.mkdirs()
      val cat = "graft_" + Integer.toHexString(wh.getAbsolutePath.hashCode)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.getAbsolutePath)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ms")
      s.sql(s"DROP TABLE IF EXISTS $cat.ms.ord")
      t(dir, "orders").createOrReplaceTempView("q290_src")
      s.sql(s"""CREATE TABLE $cat.ms.ord (okey BIGINT, mon BIGINT,
               |  price BIGINT)
               |USING `graft-iceberg` PARTITIONED BY (mon)""".stripMargin)
      (1 to 3).foreach { third =>
        s.sql(s"""INSERT INTO $cat.ms.ord
                 |SELECT /*+ COALESCE(1) */ o_orderkey,
                 |  CAST(month(o_orderdate) AS BIGINT),
                 |  CAST(FLOOR(o_totalprice) AS BIGINT)
                 |FROM q290_src WHERE year(o_orderdate) = 1995
                 |  AND o_orderkey % 3 = ${third - 1}""".stripMargin)
      }
      val tdir = s"${wh.getAbsolutePath}/ms/ord"
      graft.sources.LayoutMaintenance.computePartitionStats(s, tdir)
      // arm A: size metrics from the KB stats file alone
      val fromStats = graft.metrics.MetricsCalculator
        .sizeMetricsFromStats(s, tdir, "t")
        .getOrElse(sys.error("fresh stats must serve the size arm"))
        .collect().head
      // arm B: the full manifest-scan pipeline
      val files = graft.sources.IcebergManifestSource
        .statsFromTableDir(s, tdir, "t", Nil)
        .select(col("table"), col("content"), col("partitionKey"),
          col("sizeBytes"))
        .as[graft.model.FileEntry]
      val nManifests = graft.sources.MetadataTables
        .manifests(s, tdir).count()
      val full = graft.metrics.MetricsCalculator
        .computeMetricsWide(files, Seq(("t", nManifests)).toDS())
        .collect().head
      require(fromStats.getDouble(1) == full.avgFileSize &&
        fromStats.getDouble(2) == full.worstAvgFileSize &&
        fromStats.getLong(3) == full.totalTableSize &&
        fromStats.getLong(4) == full.largestPartitionSize &&
        fromStats.getLong(5) == full.totalPartitions,
        s"stats-served size metrics must equal the manifest pipeline: " +
          s"$fromStats vs $full")
      // the $partitions relation serves from the SAME fresh stats file
      // (KB read); its record counts are the oracle-checked output
      s.sql(s"""SELECT CAST(get_json_object(partition, '$$.mon') AS BIGINT)
               |    AS mon,
               |  sum(record_count) AS n_records,
               |  sum(file_count) AS n_files
               |FROM $cat.ms.ord.partitions
               |GROUP BY 1 ORDER BY mon""".stripMargin)
    },

    // ---- ROW-LEVEL CHANGELOG VIA ROW LINEAGE (the spec's primitive
    // for incremental consumers — the file-level changelog family
    // q211/q274 upgraded to ROW identity): two snapshot reads FULL
    // OUTER JOINED ON `_row_id` classify every row as inserted /
    // deleted / updated / unchanged exactly — an update is the SAME
    // row id on both sides with a moved last-updated sequence, which
    // no file-diff can see (the MOR delta moved the row to a new file).
    // At 100 TB the join is over row ids (sorted-bucketable longs),
    // never a value-equality heuristic. The oracle recomputes the
    // classification from predicate algebra alone.
    "q291_lineage_changelog" -> { (s, dir) => implicit val sp = s
      val wh = TmpFixture.dir("q291wh", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(wh); wh.mkdirs()
      val cat = "graft_" + Integer.toHexString(wh.getAbsolutePath.hashCode)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.getAbsolutePath)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.cl")
      s.sql(s"DROP TABLE IF EXISTS $cat.cl.ord")
      t(dir, "orders").createOrReplaceTempView("q291_src")
      s.sql(s"""CREATE TABLE $cat.cl.ord (okey BIGINT, price BIGINT)
               |USING `graft-iceberg` TBLPROPERTIES (
               |  'write.update.mode' = 'merge-on-read',
               |  'write.delete.mode' = 'merge-on-read')""".stripMargin)
      def insertYear(y: Int): Unit =
        s.sql(s"""INSERT INTO $cat.cl.ord
                 |SELECT /*+ COALESCE(1) */ o_orderkey,
                 |  CAST(FLOOR(o_totalprice) AS BIGINT)
                 |FROM q291_src WHERE year(o_orderdate) = $y""".stripMargin)
      insertYear(1995)
      val s1 = s.sql(s"SELECT snapshot_id FROM $cat.cl.ord.history " +
        "WHERE is_current_ancestor ORDER BY ordinal DESC LIMIT 1")
        .head.getLong(0)
      s.sql(s"UPDATE $cat.cl.ord SET price = price + 10 WHERE okey % 5 = 0")
      insertYear(1996)
      s.sql(s"DELETE FROM $cat.cl.ord WHERE okey % 11 = 3")
      // row-identity diff: FULL OUTER ON _row_id between snapshot s1
      // and the current head
      s.sql(s"""SELECT okey, price, _row_id AS rid,
               |  _last_updated_sequence_number AS seq
               |FROM $cat.cl.ord VERSION AS OF $s1""".stripMargin)
        .createOrReplaceTempView("q291_a")
      s.sql(s"""SELECT okey, price, _row_id AS rid,
               |  _last_updated_sequence_number AS seq
               |FROM $cat.cl.ord""".stripMargin)
        .createOrReplaceTempView("q291_b")
      val changes = s.sql(s"""
        |SELECT CASE
        |    WHEN a.rid IS NULL THEN 'inserted'
        |    WHEN b.rid IS NULL THEN 'deleted'
        |    WHEN b.seq > a.seq THEN 'updated'
        |    ELSE 'unchanged' END AS change,
        |  coalesce(b.okey, a.okey) AS okey,
        |  coalesce(b.price, a.price) AS price
        |FROM q291_a a FULL OUTER JOIN q291_b b ON a.rid = b.rid""".stripMargin)
      changes.createOrReplaceTempView("q291_changes")
      // pinned: updated rows kept their key (row identity is REAL — the
      // same _row_id carries the same okey on both sides)
      require(s.sql("""SELECT count(*) FROM q291_a a JOIN q291_b b
        |ON a.rid = b.rid WHERE a.okey <> b.okey""".stripMargin)
        .head.getLong(0) == 0L,
        "a row id must never change its key across commits")
      s.sql("""SELECT change, count(*) AS n, sum(price) AS sum_price,
        |  min(okey) AS min_okey, max(okey) AS max_okey
        |FROM q291_changes GROUP BY change ORDER BY change""".stripMargin)
    },

    // ---- write.delete.format.default (Iceberg's DELETE-FILE format
    // knob, distinct from the data files' write.format.default): an
    // ORC-data table accretes tombstone FILES in all three formats (the
    // property flipped between MOR DELETEs), every read dispatches on
    // the manifest entry's file_format, and rewrite_position_delete_
    // files FOLDS the mixed dialects into one file with the table state
    // unchanged. Pinned in-query: the tombstone format set is exactly
    // {AVRO, ORC, PARQUET} before the fold and a single file after,
    // with the same survivors both sides. DuckDB recomputes survivors
    // from predicate algebra.
    "q292_delete_file_formats" -> { (s, dir) => implicit val sp = s
      val wh = TmpFixture.dir("q292wh", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(wh); wh.mkdirs()
      val cat = "graft_" + Integer.toHexString(wh.getAbsolutePath.hashCode)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.getAbsolutePath)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.df")
      s.sql(s"DROP TABLE IF EXISTS $cat.df.ord")
      t(dir, "orders").createOrReplaceTempView("q292_src")
      s.sql(s"""CREATE TABLE $cat.df.ord (okey BIGINT, mon BIGINT,
               |  price BIGINT)
               |USING `graft-iceberg` TBLPROPERTIES (
               |  'write.format.default' = 'orc',
               |  'write.delete.mode' = 'merge-on-read',
               |  'write.delete.format.default' = 'avro')""".stripMargin)
      s.sql(s"""INSERT INTO $cat.df.ord
               |SELECT /*+ COALESCE(1) */ o_orderkey,
               |  CAST(month(o_orderdate) AS BIGINT),
               |  CAST(FLOOR(o_totalprice) AS BIGINT)
               |FROM q292_src WHERE year(o_orderdate) = 1995""".stripMargin)
      s.sql(s"DELETE FROM $cat.df.ord WHERE okey % 10 = 1") // AVRO
      s.sql(s"ALTER TABLE $cat.df.ord SET TBLPROPERTIES (" +
        "'write.delete.format.default' = 'orc')")
      s.sql(s"DELETE FROM $cat.df.ord WHERE okey % 10 = 2") // ORC
      s.sql(s"ALTER TABLE $cat.df.ord SET TBLPROPERTIES (" +
        "'write.delete.format.default' = 'parquet')")
      s.sql(s"DELETE FROM $cat.df.ord WHERE okey % 10 = 3") // PARQUET
      val tdir = s"${wh.getAbsolutePath}/df/ord"
      def delFmts(): Set[String] = graft.sources.IcebergManifestSource
        .statsFromTableDir(s, tdir, "t", Nil)
        .filter(col("content") === 1)
        .select("file_format").collect().map(_.getString(0)).toSet
      require(delFmts() == Set("AVRO", "ORC", "PARQUET"),
        s"tombstones must span the three delete formats: ${delFmts()}")
      val beforeFold = s.sql(
        s"SELECT count(*), sum(price) FROM $cat.df.ord").head
      val (_, nBefore, nAfter, _) = graft.sources.LayoutMaintenance
        .rewritePositionDeletes(s, tdir)
      require(nBefore == 3 && nAfter == 1,
        s"the fold must consolidate 3 tombstone dialects into 1: " +
          s"$nBefore -> $nAfter")
      val afterFold = s.sql(
        s"SELECT count(*), sum(price) FROM $cat.df.ord").head
      require(beforeFold == afterFold,
        s"the fold must not change table state: $beforeFold vs $afterFold")
      s.sql(s"""SELECT mon, count(*) AS n_orders, sum(price) AS sum_price,
               |  min(okey) AS min_okey
               |FROM $cat.df.ord
               |GROUP BY mon ORDER BY mon""".stripMargin)
    },

    // ---- THE ROW-ID CURSOR (incremental consumption without file
    // diffs): row ids are assigned MONOTONICALLY from the table
    // metadata's `next-row-id` counter, so "rows appended since
    // checkpoint C" is exactly `_row_id >= C` where C is the counter
    // captured at checkpoint time — one predicate, no snapshot diff, no
    // changelog join, and it survives compaction because rewrites
    // preserve ids. An incremental dedup consumes only the new slice
    // and anti-joins it against the already-processed state. Pinned
    // in-query: the cursor slice is EXACTLY the second batch even after
    // a rewrite_data_files replaced every file between batches.
    "q293_rowid_cursor" -> { (s, dir) => implicit val sp = s
      val wh = TmpFixture.dir("q293wh", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(wh); wh.mkdirs()
      val cat = "graft_" + Integer.toHexString(wh.getAbsolutePath.hashCode)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.getAbsolutePath)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.rc")
      s.sql(s"DROP TABLE IF EXISTS $cat.rc.doc")
      t(dir, "orders").createOrReplaceTempView("q293_src")
      s.sql(s"""CREATE TABLE $cat.rc.doc (okey BIGINT, price BIGINT)
               |USING `graft-iceberg`""".stripMargin)
      def insertYear(y: Int): Unit =
        s.sql(s"""INSERT INTO $cat.rc.doc
                 |SELECT /*+ COALESCE(1) */ o_orderkey,
                 |  CAST(FLOOR(o_totalprice) AS BIGINT)
                 |FROM q293_src WHERE year(o_orderdate) = $y""".stripMargin)
      insertYear(1995)
      val tdir = s"${wh.getAbsolutePath}/rc/doc"
      // the CHECKPOINT: one KB metadata read, no snapshot bookkeeping
      val cursor = graft.sources.LayoutMaintenance.nextRowId(s, tdir)
      // a full compaction between batches — every file replaced, ids
      // preserved, so the cursor still cuts exactly
      s.sql(s"CALL $cat.system.rewrite_data_files('rc.doc')")
      insertYear(1996)
      val slice = s.sql(s"SELECT okey FROM $cat.rc.doc " +
        s"WHERE _row_id >= $cursor")
      val fullB = s.sql(s"""SELECT o_orderkey AS okey FROM q293_src
        |WHERE year(o_orderdate) = 1996""".stripMargin)
      require(slice.count() == fullB.count() &&
        slice.except(fullB).count() == 0L,
        "the cursor slice must be exactly the post-checkpoint batch")
      // incremental dedup shape: only the slice anti-joins the old state
      s.sql(s"""SELECT CAST(okey % 4 AS BIGINT) AS bucket,
               |  count(*) AS n_new, sum(price) AS sum_price,
               |  min(okey) AS min_okey
               |FROM $cat.rc.doc WHERE _row_id >= $cursor
               |GROUP BY 1 ORDER BY 1""".stripMargin)
    })

  def oracles: Map[String, String] = Map(

    "q285_wide_decimal" ->
      """WITH src AS (
        |  SELECT CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS mon,
        |    CAST(CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS VARCHAR)
        |      || '00000000000000.0000000001' AS DECIMAL(38,10)) AS price
        |  FROM orders
        |  WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996, 1997))
        |SELECT mon, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(price) AS VARCHAR) AS sum_price,
        |  CAST(min(price) AS VARCHAR) AS min_price,
        |  CAST(max(price) AS VARCHAR) AS max_price
        |FROM src
        |WHERE price < CAST('3000000000000000000000' AS DECIMAL(38,10))
        |GROUP BY mon ORDER BY mon""".stripMargin,

    "q286_vector_orc_avro" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000) AS BIGINT)) AS e
        |  FROM embeddings WHERE vec_id % 5 <> 0)
        |SELECT CAST(vec_id % 4 AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(sum(list_sum(e)) AS BIGINT) AS sum_elems,
        |  CAST(sum(list_sum(list_transform(e, x -> x * x))) AS BIGINT)
        |    AS sum_sq,
        |  CAST(min(vec_id) AS BIGINT) AS min_vec,
        |  CAST(max(vec_id) AS BIGINT) AS max_vec
        |FROM q GROUP BY 1 ORDER BY 1""".stripMargin,

    "q287_entries_family" ->
      """SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_okey,
        |  CAST(sum(o_orderkey % 100) AS BIGINT) AS sum_mod
        |FROM orders
        |WHERE (year(CAST(o_orderdate AS DATE)) IN (1995, 1996)
        |    AND o_orderkey % 10 <> 3)
        |  OR year(CAST(o_orderdate AS DATE)) = 1997
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q288_row_lineage" ->
      """WITH src AS (
        |  SELECT o_orderkey AS okey, o_orderpriority AS prio,
        |    CAST(FLOOR(o_totalprice) AS BIGINT) AS price0,
        |    row_number() OVER (ORDER BY o_orderkey) - 1 AS rid
        |  FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995)
        |SELECT prio, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(price0 + CASE WHEN okey % 7 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS sum_price,
        |  CAST(count(DISTINCT rid) AS BIGINT) AS n_ids,
        |  CAST(min(rid) AS BIGINT) AS min_rid,
        |  CAST(max(rid) AS BIGINT) AS max_rid,
        |  CAST(sum(CASE WHEN okey % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_touched
        |FROM src GROUP BY prio ORDER BY prio""".stripMargin,

    "q289_ntz_lake" ->
      """WITH src AS (
        |  SELECT o_orderkey AS okey,
        |    CAST(o_orderdate AS TIMESTAMP) +
        |      to_seconds(o_orderkey % 86400) AS ts
        |  FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995),
        |kept AS (
        |  SELECT * FROM src
        |  WHERE NOT (ts < TIMESTAMP '1995-02-01 00:00:00'
        |    AND okey % 3 = 0))
        |SELECT CAST(month(ts) AS BIGINT) AS mon,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(min(ts) AS VARCHAR) AS first_ts,
        |  CAST(max(ts) AS VARCHAR) AS last_ts,
        |  CAST(min(okey) AS BIGINT) AS min_okey
        |FROM kept GROUP BY 1 ORDER BY mon""".stripMargin,

    "q290_metrics_from_stats" ->
      """SELECT CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS mon,
        |  CAST(count(*) AS BIGINT) AS n_records,
        |  CAST(3 AS BIGINT) AS n_files
        |FROM orders
        |WHERE year(CAST(o_orderdate AS DATE)) = 1995
        |GROUP BY 1 ORDER BY mon""".stripMargin,

    "q291_lineage_changelog" ->
      """WITH src AS (
        |  SELECT o_orderkey AS okey,
        |    CAST(FLOOR(o_totalprice) AS BIGINT) AS p,
        |    year(CAST(o_orderdate AS DATE)) AS y
        |  FROM orders
        |  WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996)),
        |ch AS (
        |  SELECT CASE
        |      WHEN y = 1996 THEN 'inserted'
        |      WHEN okey % 11 = 3 THEN 'deleted'
        |      WHEN okey % 5 = 0 THEN 'updated'
        |      ELSE 'unchanged' END AS change,
        |    okey,
        |    CASE WHEN y = 1995 AND okey % 11 <> 3 AND okey % 5 = 0
        |      THEN p + 10 ELSE p END AS price
        |  FROM src
        |  WHERE NOT (y = 1996 AND okey % 11 = 3))
        |SELECT change, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(price) AS BIGINT) AS sum_price,
        |  CAST(min(okey) AS BIGINT) AS min_okey,
        |  CAST(max(okey) AS BIGINT) AS max_okey
        |FROM ch GROUP BY change ORDER BY change""".stripMargin,

    "q292_delete_file_formats" ->
      """SELECT CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS mon,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(FLOOR(o_totalprice)) AS BIGINT) AS sum_price,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_okey
        |FROM orders
        |WHERE year(CAST(o_orderdate AS DATE)) = 1995
        |  AND o_orderkey % 10 NOT IN (1, 2, 3)
        |GROUP BY 1 ORDER BY mon""".stripMargin,

    "q293_rowid_cursor" ->
      """SELECT CAST(o_orderkey % 4 AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_new,
        |  CAST(sum(FLOOR(o_totalprice)) AS BIGINT) AS sum_price,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_okey
        |FROM orders
        |WHERE year(CAST(o_orderdate AS DATE)) = 1996
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
