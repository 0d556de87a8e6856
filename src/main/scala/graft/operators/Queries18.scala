package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 batch: the lake type system's last gaps and the CDC
  * surface —
  *
  *  - MAP lake columns (q294): `MAP<STRING,BIGINT>` data in all three
  *    data-file formats (parquet MAP-annotated key_value groups, ORC
  *    MapColumnVector, avro native map — Iceberg spec Appendix A /
  *    the Avro appendix; SURVEY.md §1.2 maps the reference's dict
  *    types to Spark `MapType`).
  *
  * Oracle-parity conventions as in [[Queries]]: identical aliases both
  * sides, full ORDER BY tie-breaks.
  */
object Queries18 {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    Rel.t(dir, name)

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- MAP LAKE COLUMNS (the last composite type): a
    // MAP<STRING,BIGINT> column accretes one slice per data-file
    // format (write.format.default flipped between inserts), a MOR
    // DELETE keyed off a MAP ACCESS (`m['okey_mod'] < 10`) tombstones
    // across the mix — the residual predicate forces every format's
    // map decode — and the rollup EXPLODES the map so each (key,
    // value) pair's value is hash-gated. The oracle recomputes the
    // exploded pairs as a UNION ALL over the source columns.
    "q294_map_lake" -> { (s, dir) => implicit val sp = s
      val wh = TmpFixture.dir("q294wh", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(wh); wh.mkdirs()
      val cat = "graft_" + Integer.toHexString(wh.getAbsolutePath.hashCode)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.getAbsolutePath)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.mp")
      s.sql(s"DROP TABLE IF EXISTS $cat.mp.props")
      t(dir, "orders").createOrReplaceTempView("q294_src")
      s.sql(s"""CREATE TABLE $cat.mp.props (
               |  okey BIGINT, m MAP<STRING, BIGINT>)
               |USING `graft-iceberg` TBLPROPERTIES (
               |  'write.format.default' = 'parquet',
               |  'write.delete.mode' = 'merge-on-read')""".stripMargin)
      def insertYear(y: Int): Unit =
        s.sql(s"""INSERT INTO $cat.mp.props
                 |SELECT /*+ COALESCE(1) */ o_orderkey AS okey,
                 |  map('cents', CAST(FLOOR(o_totalprice * 100) AS BIGINT),
                 |      'mon', CAST(month(o_orderdate) AS BIGINT),
                 |      'okey_mod', o_orderkey % 100) AS m
                 |FROM q294_src WHERE year(o_orderdate) = $y""".stripMargin)
      insertYear(1995) // PARQUET MAP key_value groups
      s.sql(s"ALTER TABLE $cat.mp.props " +
        "SET TBLPROPERTIES ('write.format.default' = 'orc')")
      insertYear(1996) // ORC MapColumnVector
      s.sql(s"ALTER TABLE $cat.mp.props " +
        "SET TBLPROPERTIES ('write.format.default' = 'avro')")
      insertYear(1997) // AVRO native map (string keys)
      val tdir = s"${wh.getAbsolutePath}/mp/props"
      val fmts = graft.sources.IcebergManifestSource
        .statsFromTableDir(s, tdir, "t", Nil)
        .filter(col("content") === 0)
        .select("file_format").distinct().collect()
        .map(_.getString(0)).toSet
      require(fmts == Set("PARQUET", "ORC", "AVRO"),
        s"maps must ride all three formats: $fmts")
      // MOR delete keyed off a map access — every format decodes the
      // map to evaluate the residual predicate
      s.sql(s"DELETE FROM $cat.mp.props WHERE m['okey_mod'] < 10")
      require(graft.sources.IcebergManifestSource
        .statsFromTableDir(s, tdir, "t", Nil)
        .filter(col("content") === 1).count() > 0,
        "the map-predicate DELETE must land tombstones")
      s.sql(s"""SELECT mk AS mkey, count(*) AS n_vals,
               |  sum(v) AS sum_v, min(v) AS min_v, max(v) AS max_v
               |FROM (SELECT explode(m) AS (mk, v) FROM $cat.mp.props)
               |GROUP BY mk ORDER BY mkey""".stripMargin)
    },

    // ---- EQUALITY-DELETE FILE FORMATS (q292's shape for the OTHER
    // tombstone kind): Iceberg keys ALL delete files off
    // `write.delete.format.default`; three eq-granularity DELETEs land
    // one equality-tombstone file per dialect (ORC, AVRO, parquet),
    // every arm of the MOR read applies them, and
    // `convert_equality_deletes` folds the mixed dialects into ONE
    // position-delete file with the visible row set bit-identical —
    // the rollup runs post-conversion so the hash gates both the
    // mixed-dialect read AND the fold.
    "q295_eq_delete_formats" -> { (s, dir) => implicit val sp = s
      val wh = TmpFixture.dir("q295wh", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(wh); wh.mkdirs()
      val cat = "graft_" + Integer.toHexString(wh.getAbsolutePath.hashCode)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.getAbsolutePath)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ef")
      s.sql(s"DROP TABLE IF EXISTS $cat.ef.ord")
      t(dir, "orders").createOrReplaceTempView("q295_src")
      s.sql(s"""CREATE TABLE $cat.ef.ord (
               |  okey BIGINT NOT NULL, mon BIGINT, price BIGINT)
               |USING `graft-iceberg` TBLPROPERTIES (
               |  'write.delete.mode' = 'merge-on-read',
               |  'write.delete.granularity' = 'equality',
               |  'identifier.columns' = 'okey',
               |  'write.delete.format.default' = 'orc')""".stripMargin)
      s.sql(s"""INSERT INTO $cat.ef.ord
               |SELECT /*+ COALESCE(1) */ o_orderkey AS okey,
               |  CAST(month(o_orderdate) AS BIGINT) AS mon,
               |  CAST(FLOOR(o_totalprice) AS BIGINT) AS price
               |FROM q295_src WHERE year(o_orderdate) = 1995""".stripMargin)
      // one eq-tombstone file per dialect (non-pushable predicates
      // route through the eq-granularity delta path)
      s.sql(s"DELETE FROM $cat.ef.ord WHERE okey % 10 = 1") // ORC
      s.sql(s"ALTER TABLE $cat.ef.ord SET TBLPROPERTIES (" +
        "'write.delete.format.default' = 'avro')")
      s.sql(s"DELETE FROM $cat.ef.ord WHERE okey % 10 = 2") // AVRO
      s.sql(s"ALTER TABLE $cat.ef.ord SET TBLPROPERTIES (" +
        "'write.delete.format.default' = 'parquet')")
      s.sql(s"DELETE FROM $cat.ef.ord WHERE okey % 10 = 3") // PARQUET
      val tdir = s"${wh.getAbsolutePath}/ef/ord"
      val eqFmts = graft.sources.IcebergManifestSource
        .statsFromTableDir(s, tdir, "t", Nil)
        .filter(col("content") === 2)
        .select("file_format").distinct().collect()
        .map(_.getString(0)).toSet
      require(eqFmts == Set("ORC", "AVRO", "PARQUET"),
        s"eq tombstones must ride all three formats: $eqFmts")
      // mixed-dialect fold: eq entries gone, ONE pos file, rows intact
      val (_, nEq, nPairs) = graft.sources.LayoutMaintenance
        .convertEqualityDeletes(s, tdir)
      require(nEq == 3 && nPairs > 0,
        s"conversion must fold 3 eq files: $nEq, $nPairs pairs")
      val after = graft.sources.IcebergManifestSource
        .statsFromTableDir(s, tdir, "t", Nil)
        .select("content").collect().map(_.getInt(0))
        .groupBy(identity).view.mapValues(_.length).toMap
      require(after.getOrElse(2, 0) == 0 && after.getOrElse(1, 0) == 1,
        s"post-conversion layout must be pos-only: $after")
      s.sql(s"""SELECT mon, count(*) AS n_orders, sum(price) AS sum_price,
               |  min(okey) AS min_okey, max(okey) AS max_okey
               |FROM $cat.ef.ord
               |GROUP BY mon ORDER BY mon""".stripMargin)
    },

    // ---- UUID + FIXED(L) LAKE TYPES (the spec's remaining
    // primitives): a `graft.lake-type` uuid key (Spark STRING, stored
    // as the spec's 16 fixed bytes — parquet FLBA(16)+UUID annotation,
    // avro fixed(16) logicalType uuid, ORC canonical string) and a
    // fixed[8] payload (Spark BINARY, exactly-8 fixed bytes) ride all
    // THREE formats in one table; a UUID-PREDICATE MOR DELETE forces
    // every format's fixed-byte decode; the rollup groups by the
    // uuid's first hex digit and hash-gates ids + payload hex against
    // DuckDB recomputing the same md5-derived uuids.
    "q296_uuid_fixed" -> { (s, dir) => implicit val sp = s
      val wh = TmpFixture.dir("q296wh", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(wh); wh.mkdirs()
      val cat = "graft_" + Integer.toHexString(wh.getAbsolutePath.hashCode)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.getAbsolutePath)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.uu")
      s.sql(s"DROP TABLE IF EXISTS $cat.uu.keys")
      t(dir, "orders").createOrReplaceTempView("q296_src")
      s.sql(s"""CREATE TABLE $cat.uu.keys (
               |  id STRING, okey BIGINT, payload BINARY)
               |USING `graft-iceberg` TBLPROPERTIES (
               |  'write.format.default' = 'parquet',
               |  'write.delete.mode' = 'merge-on-read',
               |  'graft.lake-type.id' = 'uuid',
               |  'graft.lake-type.payload' = 'fixed[8]')""".stripMargin)
      // md5-derived uuid-shaped key (both engines compute it
      // identically); payload = the key as 8 big-endian bytes
      def insertSlice(mod: Int): Unit =
        s.sql(s"""INSERT INTO $cat.uu.keys
                 |SELECT /*+ COALESCE(1) */
                 |  concat(substring(h, 1, 8), '-', substring(h, 9, 4),
                 |    '-', substring(h, 13, 4), '-', substring(h, 17, 4),
                 |    '-', substring(h, 21, 12)) AS id,
                 |  okey,
                 |  unhex(lpad(hex(okey), 16, '0')) AS payload
                 |FROM (SELECT o_orderkey AS okey,
                 |    md5(concat('graft-', CAST(o_orderkey AS STRING))) AS h
                 |  FROM q296_src
                 |  WHERE year(o_orderdate) = 1995
                 |    AND o_orderkey % 3 = $mod)""".stripMargin)
      insertSlice(0) // PARQUET: FLBA(16)+UUID / FLBA(8)
      s.sql(s"ALTER TABLE $cat.uu.keys " +
        "SET TBLPROPERTIES ('write.format.default' = 'orc')")
      insertSlice(1) // ORC: canonical string / binary (dialect)
      s.sql(s"ALTER TABLE $cat.uu.keys " +
        "SET TBLPROPERTIES ('write.format.default' = 'avro')")
      insertSlice(2) // AVRO: fixed(16) logicalType uuid / fixed(8)
      val tdir = s"${wh.getAbsolutePath}/uu/keys"
      val fmts = graft.sources.IcebergManifestSource
        .statsFromTableDir(s, tdir, "t", Nil)
        .filter(col("content") === 0)
        .select("file_format").distinct().collect()
        .map(_.getString(0)).toSet
      require(fmts == Set("PARQUET", "ORC", "AVRO"),
        s"uuid keys must ride all three formats: $fmts")
      // UUID-predicate MOR delete: every format decodes the fixed
      // bytes to evaluate the residual
      s.sql(s"DELETE FROM $cat.uu.keys WHERE substring(id, 1, 1) < '4'")
      require(graft.sources.IcebergManifestSource
        .statsFromTableDir(s, tdir, "t", Nil)
        .filter(col("content") === 1).count() > 0,
        "the uuid-predicate DELETE must land tombstones")
      s.sql(s"""SELECT substring(id, 1, 1) AS hx, count(*) AS n_keys,
               |  min(id) AS min_id, max(id) AS max_id,
               |  sum(okey) AS sum_okey,
               |  min(lower(hex(payload))) AS min_payload
               |FROM $cat.uu.keys
               |GROUP BY 1 ORDER BY hx""".stripMargin)
    },

    // ---- TRUE UPDATE ROWS IN THE CDC CHANGELOG (Iceberg v3's
    // changelog semantics): a MOR UPDATE commit adds data files AND
    // position tombstones in one snapshot; the `.changes` relation now
    // PAIRS the deleted and inserted row versions on v3 row lineage
    // (`_row_id` — materialized by the lineage-carrying update files,
    // first_row_id+pos for the old rows) into
    // `update_before`/`update_after` rows instead of bare
    // delete+insert. In-query: the update commit emits ONLY pair rows
    // and replaying the changelog reproduces the table state
    // (fold equality); the rollup audits per change type and the
    // oracle replays the mutation from the source.
    "q297_cdc_update_pairs" -> { (s, dir) => implicit val sp = s
      val wh = TmpFixture.dir("q297wh", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(wh); wh.mkdirs()
      val cat = "graft_" + Integer.toHexString(wh.getAbsolutePath.hashCode)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.getAbsolutePath)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.cu")
      s.sql(s"DROP TABLE IF EXISTS $cat.cu.ord")
      t(dir, "orders").createOrReplaceTempView("q297_src")
      s.sql(s"""CREATE TABLE $cat.cu.ord (okey BIGINT, price BIGINT)
               |USING `graft-iceberg` TBLPROPERTIES (
               |  'write.update.mode' = 'merge-on-read',
               |  'write.delete.mode' = 'merge-on-read')""".stripMargin)
      s.sql(s"""INSERT INTO $cat.cu.ord
               |SELECT /*+ COALESCE(1) */ o_orderkey,
               |  CAST(FLOOR(o_totalprice) AS BIGINT)
               |FROM q297_src WHERE year(o_orderdate) = 1995""".stripMargin)
      s.sql(s"UPDATE $cat.cu.ord SET price = price + 10 WHERE okey % 7 = 0")
      // the update commit must emit ONLY paired rows — one changelog
      // scan (r16: the scalar-subquery max cost a second build of the
      // .changes relation); the latest-commit filter is a driver max
      // over the per-commit rollup, the same value the subquery picked
      val byCommit = s.sql(
        s"""SELECT _commit_snapshot_id AS sid, _change_type AS ct,
           |  count(*) AS n FROM $cat.cu.ord.changes
           |GROUP BY 1, 2""".stripMargin).collect()
      val maxSid = byCommit.map(_.getLong(0)).max
      val updCommit = byCommit.filter(_.getLong(0) == maxSid)
        .map(r => r.getString(1) -> r.getLong(2)).toMap
      require(updCommit.keySet == Set("update_before", "update_after") &&
        updCommit("update_before") == updCommit("update_after"),
        s"the UPDATE commit must pair every row: $updCommit")
      // fold equality: replaying the changelog reproduces table state
      val folded = s.sql(
        s"""SELECT okey, max(CASE WHEN _change_type IN
           |    ('insert', 'update_after') THEN price END) AS price
           |FROM (SELECT okey, price, _change_type,
           |    row_number() OVER (PARTITION BY okey
           |      ORDER BY _commit_snapshot_id DESC,
           |        CASE _change_type WHEN 'update_after' THEN 0
           |          WHEN 'insert' THEN 0 ELSE 1 END) AS rn
           |  FROM $cat.cu.ord.changes)
           |WHERE rn = 1 GROUP BY okey""".stripMargin)
      val direct = s.sql(s"SELECT okey, price FROM $cat.cu.ord")
      // multiset equality in ONE action (both sides are keyed by okey,
      // so signed-count equality ⟺ the old counts-equal ∧ except-empty
      // pair, at a third of the changelog scans)
      val mismatch = folded.withColumn("side", lit(1L))
        .unionByName(direct.withColumn("side", lit(-1L)))
        .groupBy(col("okey"), col("price"))
        .agg(sum(col("side")).as("d"))
        .filter(col("d") =!= 0L).count()
      require(mismatch == 0L,
        "replaying the changelog must reproduce the table state")
      s.sql(s"""SELECT _change_type AS op, count(*) AS n_rows,
               |  sum(price) AS sum_price, sum(okey) AS sum_okey,
               |  min(okey) AS min_okey
               |FROM $cat.cu.ord.changes
               |GROUP BY 1 ORDER BY op""".stripMargin)
    },

    // ---- ROW LINEAGE FOR ADOPTED TABLES: `migrate` converts an
    // external parquet directory into a governed table IN PLACE (one
    // metadata commit, zero data movement) and the import commit
    // ASSIGNS `first_row_id` to the adopted files like any append —
    // so the row-id cursor (q293's incremental-consumption primitive)
    // works from the moment of adoption. In-query: adopted rows carry
    // dense ids 0..n-1; the cursor cut after adoption slices exactly
    // the post-adoption batch; the rollup reads the slice and the
    // oracle recomputes it from the raw source.
    "q298_migrate_lineage" -> { (s, dir) => implicit val sp = s
      val wh = TmpFixture.dir("q298wh", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(wh); wh.mkdirs()
      val cat = "graft_" + Integer.toHexString(wh.getAbsolutePath.hashCode)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.getAbsolutePath)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.mg")
      s.sql(s"DROP TABLE IF EXISTS $cat.mg.ord")
      // the pre-existing external parquet data (the un-governed estate)
      val ext = new java.io.File(wh, "external-ord")
      t(dir, "orders").filter(year(col("o_orderdate")) === 1995)
        .select(col("o_orderkey").as("okey"),
          floor(col("o_totalprice")).cast("long").as("price"))
        .coalesce(2)
        .write.mode("overwrite").parquet(ext.getAbsolutePath)
      s.sql(s"CALL $cat.system.migrate('${ext.getAbsolutePath}', 'mg.ord')")
      val tdir = s"${wh.getAbsolutePath}/mg/ord"
      val nAdopted = s.sql(s"SELECT count(*) FROM $cat.mg.ord")
        .head.getLong(0)
      // adopted rows carry dense lineage from the import commit
      val idSpan = s.sql(
        s"""SELECT count(DISTINCT _row_id), min(_row_id), max(_row_id)
           |FROM $cat.mg.ord""".stripMargin).head
      require(idSpan.getLong(0) == nAdopted && idSpan.getLong(1) == 0L &&
        idSpan.getLong(2) == nAdopted - 1,
        s"adoption must assign dense row ids: $idSpan over $nAdopted")
      require(graft.sources.LayoutMaintenance.nextRowId(s, tdir) == nAdopted,
        "the counter must sit past the adopted rows")
      // the CURSOR at adoption time; the post-adoption batch slices out
      val cursor = graft.sources.LayoutMaintenance.nextRowId(s, tdir)
      t(dir, "orders").createOrReplaceTempView("q298_src")
      s.sql(s"""INSERT INTO $cat.mg.ord
               |SELECT /*+ COALESCE(1) */ o_orderkey,
               |  CAST(FLOOR(o_totalprice) AS BIGINT)
               |FROM q298_src WHERE year(o_orderdate) = 1996""".stripMargin)
      s.sql(s"""SELECT CAST(okey % 4 AS BIGINT) AS bucket,
               |  count(*) AS n_new, sum(price) AS sum_price,
               |  min(okey) AS min_okey
               |FROM $cat.mg.ord WHERE _row_id >= $cursor
               |GROUP BY 1 ORDER BY 1""".stripMargin)
    },

    // ---- VARIANT LAKE COLUMNS (Iceberg v3's self-describing
    // semi-structured type, Spark 4's native VariantType): JSON
    // documents parse into VARIANT, land UNSHREDDED as the spec's
    // two-binary (metadata, value) pair in all THREE formats (parquet
    // group / ORC struct / avro record), a MOR DELETE keyed off a
    // VARIANT EXTRACTION tombstones across the mix, and the rollup
    // extracts typed fields with variant_get — schema-on-read over
    // lake data. The oracle recomputes from the raw columns.
    "q299_variant_lake" -> { (s, dir) => implicit val sp = s
      val wh = TmpFixture.dir("q299wh", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(wh); wh.mkdirs()
      val cat = "graft_" + Integer.toHexString(wh.getAbsolutePath.hashCode)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.getAbsolutePath)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.vj")
      s.sql(s"DROP TABLE IF EXISTS $cat.vj.docs")
      t(dir, "orders").createOrReplaceTempView("q299_src")
      s.sql(s"""CREATE TABLE $cat.vj.docs (okey BIGINT, doc VARIANT)
               |USING `graft-iceberg` TBLPROPERTIES (
               |  'write.format.default' = 'parquet',
               |  'write.delete.mode' = 'merge-on-read')""".stripMargin)
      def insertSlice(mod: Int): Unit =
        s.sql(s"""INSERT INTO $cat.vj.docs
                 |SELECT /*+ COALESCE(1) */ o_orderkey AS okey,
                 |  parse_json(concat('{"mon":', month(o_orderdate),
                 |    ',"cents":', CAST(FLOOR(o_totalprice * 100) AS BIGINT),
                 |    ',"prio":"', o_orderpriority,
                 |    '","meta":{"mod":', o_orderkey % 7, '}}')) AS doc
                 |FROM q299_src
                 |WHERE year(o_orderdate) = 1995
                 |  AND o_orderkey % 3 = $mod""".stripMargin)
      insertSlice(0) // PARQUET variant group
      s.sql(s"ALTER TABLE $cat.vj.docs " +
        "SET TBLPROPERTIES ('write.format.default' = 'orc')")
      insertSlice(1) // ORC two-binary struct
      s.sql(s"ALTER TABLE $cat.vj.docs " +
        "SET TBLPROPERTIES ('write.format.default' = 'avro')")
      insertSlice(2) // AVRO two-binary record
      val tdir = s"${wh.getAbsolutePath}/vj/docs"
      val fmts = graft.sources.IcebergManifestSource
        .statsFromTableDir(s, tdir, "t", Nil)
        .filter(col("content") === 0)
        .select("file_format").distinct().collect()
        .map(_.getString(0)).toSet
      require(fmts == Set("PARQUET", "ORC", "AVRO"),
        s"variants must ride all three formats: $fmts")
      // MOR delete keyed off a nested VARIANT extraction
      s.sql(s"DELETE FROM $cat.vj.docs " +
        "WHERE variant_get(doc, '$.meta.mod', 'bigint') = 3")
      require(graft.sources.IcebergManifestSource
        .statsFromTableDir(s, tdir, "t", Nil)
        .filter(col("content") === 1).count() > 0,
        "the variant-predicate DELETE must land tombstones")
      s.sql(s"""SELECT variant_get(doc, '$$.mon', 'bigint') AS mon,
               |  count(*) AS n_docs,
               |  sum(variant_get(doc, '$$.cents', 'bigint')) AS sum_cents,
               |  min(variant_get(doc, '$$.prio', 'string')) AS min_prio,
               |  min(okey) AS min_okey
               |FROM $cat.vj.docs
               |GROUP BY 1 ORDER BY mon""".stripMargin)
    },

    // ---- TIME LAKE COLUMNS (the spec's `time` — microseconds from
    // midnight; Spark 4's TimeType behind spark.sql.timeType.enabled):
    // derived times land in all THREE formats (parquet INT64
    // time-micros, the ORC long dialect, avro time-micros), a MOR
    // DELETE keyed off a TIME comparison routes through the row-level
    // path (the connector scan decodes TIME in every format), and the
    // rollup groups by the hour rendered from the time string — both
    // engines compute make_time identically on whole seconds.
    "q300_time_lake" -> { (s, dir) => implicit val sp = s
      s.conf.set("spark.sql.timeType.enabled", "true")
      val wh = TmpFixture.dir("q300wh", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(wh); wh.mkdirs()
      val cat = "graft_" + Integer.toHexString(wh.getAbsolutePath.hashCode)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.getAbsolutePath)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.tm")
      s.sql(s"DROP TABLE IF EXISTS $cat.tm.clk")
      t(dir, "orders").createOrReplaceTempView("q300_src")
      s.sql(s"""CREATE TABLE $cat.tm.clk (okey BIGINT, t TIME(6))
               |USING `graft-iceberg` TBLPROPERTIES (
               |  'write.format.default' = 'parquet',
               |  'write.delete.mode' = 'merge-on-read')""".stripMargin)
      def insertSlice(mod: Int): Unit =
        s.sql(s"""INSERT INTO $cat.tm.clk
                 |SELECT /*+ COALESCE(1) */ o_orderkey AS okey,
                 |  make_time(CAST(o_orderkey % 24 AS INT),
                 |    CAST((o_orderkey div 7) % 60 AS INT),
                 |    CAST(o_orderkey % 60 AS DECIMAL(8,6))) AS t
                 |FROM q300_src
                 |WHERE year(o_orderdate) = 1995
                 |  AND o_orderkey % 3 = $mod""".stripMargin)
      insertSlice(0) // PARQUET INT64 time-micros
      s.sql(s"ALTER TABLE $cat.tm.clk " +
        "SET TBLPROPERTIES ('write.format.default' = 'orc')")
      insertSlice(1) // ORC long dialect (micros from midnight)
      s.sql(s"ALTER TABLE $cat.tm.clk " +
        "SET TBLPROPERTIES ('write.format.default' = 'avro')")
      insertSlice(2) // AVRO time-micros
      val tdir = s"${wh.getAbsolutePath}/tm/clk"
      val fmts = graft.sources.IcebergManifestSource
        .statsFromTableDir(s, tdir, "t", Nil)
        .filter(col("content") === 0)
        .select("file_format").distinct().collect()
        .map(_.getString(0)).toSet
      require(fmts == Set("PARQUET", "ORC", "AVRO"),
        s"times must ride all three formats: $fmts")
      // TIME-predicate MOR delete: every format decodes micros
      s.sql(s"DELETE FROM $cat.tm.clk WHERE t < TIME'06:00:00'")
      require(graft.sources.IcebergManifestSource
        .statsFromTableDir(s, tdir, "t", Nil)
        .filter(col("content") === 1).count() > 0,
        "the time-predicate DELETE must land tombstones")
      s.sql(s"""SELECT CAST(substring(CAST(t AS STRING), 1, 2) AS BIGINT)
               |    AS hh,
               |  count(*) AS n_rows,
               |  min(CAST(t AS STRING)) AS min_t,
               |  max(CAST(t AS STRING)) AS max_t,
               |  sum(okey) AS sum_okey
               |FROM $cat.tm.clk
               |GROUP BY 1 ORDER BY hh""".stripMargin)
    },

    // format-version fidelity end-to-end: a table PINNED to v2 (no row
    // lineage, v3 features refuse), the spec's one-way metadata-only
    // upgrade to 3, then v3 features in anger — a deletion-vector
    // DELETE and lineage-assigning appends — with the final state
    // hash-gated against the oracle.
    "q301_format_version" -> { (s, dir) => implicit val sp = s
      val wh = TmpFixture.dir("q301wh", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(wh); wh.mkdirs()
      val cat = "graft_" + Integer.toHexString(wh.getAbsolutePath.hashCode)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.getAbsolutePath)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.fv")
      s.sql(s"DROP TABLE IF EXISTS $cat.fv.ord")
      t(dir, "orders").createOrReplaceTempView("q301_src")
      s.sql(s"""CREATE TABLE $cat.fv.ord (okey BIGINT, price BIGINT,
               |  mon BIGINT) USING `graft-iceberg` TBLPROPERTIES (
               |  'format-version' = '2',
               |  'write.delete.mode' = 'merge-on-read')""".stripMargin)
      def insertSlice(pred: String): Unit =
        s.sql(s"""INSERT INTO $cat.fv.ord
                 |SELECT /*+ COALESCE(1) */ o_orderkey AS okey,
                 |  CAST(FLOOR(o_totalprice) AS BIGINT) AS price,
                 |  CAST(month(o_orderdate) AS BIGINT) AS mon
                 |FROM q301_src
                 |WHERE year(o_orderdate) = 1995 AND ($pred)""".stripMargin)
      insertSlice("o_orderkey % 3 IN (0, 1)")
      val tdir = s"${wh.getAbsolutePath}/fv/ord"
      require(graft.sources.LayoutMaintenance
        .tableFormatVersion(s, tdir) == 2,
        "an explicitly-v2 table must be stamped 2")
      // the spec's upgrade: ONE metadata-only commit (version bumps,
      // snapshot count does not)
      val hintBefore = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(tdir, "metadata/version-hint.text").toPath),
        "UTF-8").trim.toLong
      val snapsBefore = graft.sources.LayoutMaintenance
        .snapshotIds(s, tdir).size
      // no explicit delete-format: on a DECLARED-v3 table, position
      // tombstones default to deletion vectors (the v3 spec rule) —
      // the PUFFIN pin below gates the default flip itself
      s.sql(s"ALTER TABLE $cat.fv.ord SET TBLPROPERTIES (" +
        "'format-version' = '3')")
      require(graft.sources.LayoutMaintenance
        .tableFormatVersion(s, tdir) == 3, "the upgrade stamps 3")
      require(new String(java.nio.file.Files.readAllBytes(
        new java.io.File(tdir, "metadata/version-hint.text").toPath),
        "UTF-8").trim.toLong == hintBefore + 1 &&
        graft.sources.LayoutMaintenance.snapshotIds(s, tdir)
          .size == snapsBefore,
        "the upgrade is ONE metadata-only commit")
      // v3 feature #1: a deletion-vector DELETE (PUFFIN tombstones)
      s.sql(s"DELETE FROM $cat.fv.ord WHERE okey % 10 < 2")
      val delFmts = graft.sources.IcebergManifestSource
        .statsFromTableDir(s, tdir, "t", Nil)
        .filter(col("content") === 1)
        .select("file_format").distinct().collect()
        .map(_.getString(0)).toSet
      require(delFmts == Set("PUFFIN"),
        s"the post-upgrade DELETE must land deletion vectors: $delFmts")
      // v3 feature #2: row lineage assigns on post-upgrade appends
      insertSlice("o_orderkey % 3 = 2")
      require(graft.sources.LayoutMaintenance.nextRowId(s, tdir) > 0,
        "post-upgrade appends must assign row lineage")
      s.sql(s"""SELECT mon, count(*) AS n_rows,
               |  sum(price) AS sum_price,
               |  min(okey) AS min_okey, max(okey) AS max_okey
               |FROM $cat.fv.ord
               |GROUP BY mon ORDER BY mon""".stripMargin)
    },

    // VARIANT SHREDDING (Iceberg v3): declared paths materialize as
    // typed parquet subcolumns with per-file bounds — a variant_get
    // predicate SKIPS FILES (plan-asserted below) instead of running
    // as a full-scan residual; reads reassemble losslessly.
    "q302_variant_shred" -> { (s, dir) => implicit val sp = s
      val wh = TmpFixture.dir("q302wh", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(wh); wh.mkdirs()
      val cat = "graft_" + Integer.toHexString(wh.getAbsolutePath.hashCode)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.getAbsolutePath)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.vs")
      s.sql(s"DROP TABLE IF EXISTS $cat.vs.doc")
      t(dir, "orders").createOrReplaceTempView("q302_src")
      s.sql(s"""CREATE TABLE $cat.vs.doc (okey BIGINT, doc VARIANT)
               |USING `graft-iceberg` TBLPROPERTIES (
               |  'graft.variant-shred.doc' =
               |    '$$.mon:bigint,$$.cents:bigint')""".stripMargin)
      // four files with DISJOINT $.mon ranges (one per quarter)
      (0 until 4).foreach { qtr =>
        s.sql(s"""INSERT INTO $cat.vs.doc
                 |SELECT /*+ COALESCE(1) */ o_orderkey AS okey,
                 |  parse_json(concat('{"mon": ', month(o_orderdate),
                 |    ', "cents": ', CAST(FLOOR(o_totalprice * 100) AS
                 |      BIGINT), '}')) AS doc
                 |FROM q302_src
                 |WHERE year(o_orderdate) = 1995
                 |  AND CAST((month(o_orderdate) - 1) / 3 AS INT) = $qtr
                 |""".stripMargin)
      }
      // plan-asserted FILE SKIP: the Q4 predicate must touch ONE of the
      // four files (the _shred_doc_mon twin pushes + prunes on bounds)
      val probe = s.sql(s"SELECT okey FROM $cat.vs.doc " +
        "WHERE variant_get(doc, '$.mon', 'bigint') >= 10")
      require(probe.rdd.getNumPartitions == 1,
        s"variant predicate must skip to 1 file, " +
          s"got ${probe.rdd.getNumPartitions}")
      require(probe.queryExecution.executedPlan.toString
        .contains("_shred_doc_mon"),
        "the shred pruning twin must reach the scan")
      s.sql(s"""SELECT variant_get(doc, '$$.mon', 'bigint') AS mon,
               |  count(*) AS n_rows,
               |  sum(variant_get(doc, '$$.cents', 'bigint')) AS sum_cents,
               |  min(okey) AS min_okey, max(okey) AS max_okey
               |FROM $cat.vs.doc
               |WHERE variant_get(doc, '$$.mon', 'bigint') >= 7
               |GROUP BY 1 ORDER BY mon""".stripMargin)
    },

    // GEOMETRY lake columns (Iceberg v3): WKB points in all three data
    // formats, per-file bbox bounds, and a bbox-intersects predicate
    // that SKIPS FILES (plan-asserted) — plus an `unknown` null-only
    // sibling column. The oracle recomputes coordinates numerically
    // (DuckDB spatial is unavailable offline; the geometry machinery is
    // exercised Spark-side and the VALUES are hash-gated).
    "q303_geometry_lake" -> { (s, dir) => implicit val sp = s
      val wh = TmpFixture.dir("q303wh", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(wh); wh.mkdirs()
      val cat = "graft_" + Integer.toHexString(wh.getAbsolutePath.hashCode)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.getAbsolutePath)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ge")
      s.sql(s"DROP TABLE IF EXISTS $cat.ge.pts")
      t(dir, "orders").createOrReplaceTempView("q303_src")
      s.sql(s"""CREATE TABLE $cat.ge.pts (okey BIGINT, g BINARY,
               |  u STRING) USING `graft-iceberg` TBLPROPERTIES (
               |  'graft.lake-type.g' = 'geometry',
               |  'graft.lake-type.u' = 'unknown')""".stripMargin)
      // three format slices with DISJOINT x ranges (x = month*30 + k%30)
      def slice(fmt: String, moLo: Int, moHi: Int): Unit = {
        s.sql(s"ALTER TABLE $cat.ge.pts SET TBLPROPERTIES (" +
          s"'write.format.default' = '$fmt')")
        s.sql(s"""INSERT INTO $cat.ge.pts
                 |SELECT /*+ COALESCE(1) */ o_orderkey AS okey,
                 |  st_point(
                 |    CAST(month(o_orderdate) * 30 + o_orderkey % 30
                 |      AS DOUBLE),
                 |    CAST(o_orderkey % 90 AS DOUBLE)) AS g,
                 |  CAST(NULL AS STRING) AS u
                 |FROM q303_src
                 |WHERE year(o_orderdate) = 1995
                 |  AND month(o_orderdate) BETWEEN $moLo AND $moHi
                 |""".stripMargin)
      }
      slice("parquet", 1, 4) // x in [30, 150)
      slice("orc", 5, 8) //      x in [150, 270)
      slice("avro", 9, 12) //    x in [270, 390)
      val tdir = s"${wh.getAbsolutePath}/ge/pts"
      val fmts = graft.sources.IcebergManifestSource
        .statsFromTableDir(s, tdir, "t", Nil)
        .filter(col("content") === 0)
        .select("file_format").distinct().collect()
        .map(_.getString(0)).toSet
      require(fmts == Set("PARQUET", "ORC", "AVRO"),
        s"geometries must ride all three formats: $fmts")
      // plan-asserted bbox FILE SKIP: the intersects window x in
      // [280, 300] touches only the avro slice
      val probe = s.sql(s"SELECT okey FROM $cat.ge.pts " +
        "WHERE _geo_g_xmin <= 300.0 AND _geo_g_xmax >= 280.0")
      require(probe.rdd.getNumPartitions == 1,
        s"bbox predicate must skip to 1 file, " +
          s"got ${probe.rdd.getNumPartitions}")
      // the unknown column reads null across every format
      require(s.sql(s"SELECT count(u) FROM $cat.ge.pts").head.getLong(0)
        == 0L, "unknown columns are null-only")
      s.sql(s"""SELECT CAST(st_xmin(g) AS BIGINT) div 30 AS mon,
               |  count(*) AS n_pts,
               |  CAST(sum(st_xmin(g)) AS BIGINT) AS sum_x,
               |  CAST(sum(st_ymin(g)) AS BIGINT) AS sum_y,
               |  min(okey) AS min_okey, max(okey) AS max_okey
               |FROM $cat.ge.pts
               |GROUP BY 1 ORDER BY mon""".stripMargin)
    },

    // The training-corpus shape variant shredding exists for: documents
    // land with a VARIANT provenance/quality sidecar, declared shred
    // paths give the semi-structured fields real file bounds, a
    // quality-band predicate SKIPS FILES (plan-asserted), and a
    // language gate runs as a MOR DELETE keyed off the variant — the
    // corpus profile is hash-gated against the raw documents table.
    "q304_shred_corpus" -> { (s, dir) => implicit val sp = s
      val wh = TmpFixture.dir("q304wh", dir)
      org.apache.commons.io.FileUtils.deleteQuietly(wh); wh.mkdirs()
      val cat = "graft_" + Integer.toHexString(wh.getAbsolutePath.hashCode)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.getAbsolutePath)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.cp")
      s.sql(s"DROP TABLE IF EXISTS $cat.cp.docs")
      t(dir, "documents").createOrReplaceTempView("q304_src")
      s.sql(s"""CREATE TABLE $cat.cp.docs (doc_id BIGINT, meta VARIANT)
               |USING `graft-iceberg` TBLPROPERTIES (
               |  'write.delete.mode' = 'merge-on-read',
               |  'graft.variant-shred.meta' =
               |    '$$.n_chars:bigint,$$.lang:string')""".stripMargin)
      // three files banded by document length (disjoint $.n_chars)
      Seq("n_chars < 200", "n_chars >= 200 AND n_chars < 400",
        "n_chars >= 400").foreach { band =>
        s.sql(s"""INSERT INTO $cat.cp.docs
                 |SELECT /*+ COALESCE(1) */ doc_id,
                 |  parse_json(to_json(named_struct(
                 |    'lang', lang, 'n_chars', n_chars,
                 |    'source', source))) AS meta
                 |FROM q304_src WHERE $band""".stripMargin)
      }
      // the long-document band predicate must touch ONE of three files
      val probe = s.sql(s"SELECT doc_id FROM $cat.cp.docs " +
        "WHERE variant_get(meta, '$.n_chars', 'bigint') >= 400")
      require(probe.rdd.getNumPartitions == 1,
        s"length-band predicate must skip to 1 file, " +
          s"got ${probe.rdd.getNumPartitions}")
      // language gate as a MOR DELETE keyed off the variant sidecar
      s.sql(s"DELETE FROM $cat.cp.docs " +
        "WHERE variant_get(meta, '$.lang', 'string') = 'zh'")
      require(graft.sources.IcebergManifestSource
        .statsFromTableDir(s, s"${wh.getAbsolutePath}/cp/docs", "t", Nil)
        .filter(col("content") =!= 0).count() > 0,
        "the language gate must land tombstones")
      s.sql(s"""SELECT variant_get(meta, '$$.lang', 'string') AS lang,
               |  count(*) AS n_docs,
               |  sum(variant_get(meta, '$$.n_chars', 'bigint'))
               |    AS sum_chars,
               |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
               |FROM $cat.cp.docs
               |GROUP BY 1 ORDER BY lang""".stripMargin)
    })

  def oracles: Map[String, String] = Map(

    "q294_map_lake" ->
      """WITH src AS (
        |  SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
        |    CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS mon,
        |    o_orderkey % 100 AS okey_mod
        |  FROM orders
        |  WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996, 1997)
        |    AND o_orderkey % 100 >= 10),
        |kv AS (
        |  SELECT 'cents' AS mkey, cents AS v FROM src
        |  UNION ALL SELECT 'mon', mon FROM src
        |  UNION ALL SELECT 'okey_mod', okey_mod FROM src)
        |SELECT mkey, CAST(count(*) AS BIGINT) AS n_vals,
        |  CAST(sum(v) AS BIGINT) AS sum_v,
        |  CAST(min(v) AS BIGINT) AS min_v,
        |  CAST(max(v) AS BIGINT) AS max_v
        |FROM kv GROUP BY mkey ORDER BY mkey""".stripMargin,

    "q295_eq_delete_formats" ->
      """SELECT CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS mon,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(FLOOR(o_totalprice)) AS BIGINT) AS sum_price,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_okey,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_okey
        |FROM orders
        |WHERE year(CAST(o_orderdate AS DATE)) = 1995
        |  AND o_orderkey % 10 NOT IN (1, 2, 3)
        |GROUP BY 1 ORDER BY mon""".stripMargin,

    "q296_uuid_fixed" ->
      """WITH src AS (
        |  SELECT o_orderkey AS okey,
        |    md5('graft-' || CAST(o_orderkey AS VARCHAR)) AS h
        |  FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995),
        |u AS (
        |  SELECT okey,
        |    substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-' ||
        |    substr(h, 13, 4) || '-' || substr(h, 17, 4) || '-' ||
        |    substr(h, 21, 12) AS id
        |  FROM src)
        |SELECT substr(id, 1, 1) AS hx, CAST(count(*) AS BIGINT) AS n_keys,
        |  min(id) AS min_id, max(id) AS max_id,
        |  CAST(sum(okey) AS BIGINT) AS sum_okey,
        |  min(lower(lpad(to_hex(okey), 16, '0'))) AS min_payload
        |FROM u
        |WHERE substr(id, 1, 1) >= '4'
        |GROUP BY 1 ORDER BY hx""".stripMargin,

    "q297_cdc_update_pairs" ->
      """WITH src AS (
        |  SELECT o_orderkey AS okey,
        |    CAST(FLOOR(o_totalprice) AS BIGINT) AS price
        |  FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995),
        |ch AS (
        |  SELECT 'insert' AS op, okey, price FROM src
        |  UNION ALL
        |  SELECT 'update_before', okey, price FROM src WHERE okey % 7 = 0
        |  UNION ALL
        |  SELECT 'update_after', okey, price + 10 FROM src
        |  WHERE okey % 7 = 0)
        |SELECT op, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(price) AS BIGINT) AS sum_price,
        |  CAST(sum(okey) AS BIGINT) AS sum_okey,
        |  CAST(min(okey) AS BIGINT) AS min_okey
        |FROM ch GROUP BY op ORDER BY op""".stripMargin,

    "q298_migrate_lineage" ->
      """SELECT CAST(o_orderkey % 4 AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_new,
        |  CAST(sum(FLOOR(o_totalprice)) AS BIGINT) AS sum_price,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_okey
        |FROM orders
        |WHERE year(CAST(o_orderdate AS DATE)) = 1996
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q299_variant_lake" ->
      """SELECT CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS mon,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  min(o_orderpriority) AS min_prio,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_okey
        |FROM orders
        |WHERE year(CAST(o_orderdate AS DATE)) = 1995
        |  AND o_orderkey % 7 <> 3
        |GROUP BY 1 ORDER BY mon""".stripMargin,

    "q300_time_lake" ->
      """WITH src AS (
        |  SELECT o_orderkey AS okey,
        |    make_time(CAST(o_orderkey % 24 AS BIGINT),
        |      CAST((o_orderkey // 7) % 60 AS BIGINT),
        |      CAST(o_orderkey % 60 AS DOUBLE)) AS t
        |  FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995)
        |SELECT CAST(substr(CAST(t AS VARCHAR), 1, 2) AS BIGINT) AS hh,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  min(CAST(t AS VARCHAR)) AS min_t,
        |  max(CAST(t AS VARCHAR)) AS max_t,
        |  CAST(sum(okey) AS BIGINT) AS sum_okey
        |FROM src
        |WHERE t >= TIME '06:00:00'
        |GROUP BY 1 ORDER BY hh""".stripMargin,

    // the first slice (okey % 3 in (0,1)) loses its okey % 10 < 2 rows
    // to the deletion-vector DELETE; the second slice (okey % 3 = 2)
    // lands after it and keeps them
    "q301_format_version" ->
      """SELECT CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS mon,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(FLOOR(o_totalprice)) AS BIGINT) AS sum_price,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_okey,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_okey
        |FROM orders
        |WHERE year(CAST(o_orderdate AS DATE)) = 1995
        |  AND ((o_orderkey % 3 IN (0, 1) AND o_orderkey % 10 >= 2)
        |    OR o_orderkey % 3 = 2)
        |GROUP BY 1 ORDER BY mon""".stripMargin,

    "q302_variant_shred" ->
      """SELECT CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS mon,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_okey,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_okey
        |FROM orders
        |WHERE year(CAST(o_orderdate AS DATE)) = 1995
        |  AND month(CAST(o_orderdate AS DATE)) >= 7
        |GROUP BY 1 ORDER BY mon""".stripMargin,

    // the numeric twin of the WKB points: x = month*30 + okey%30,
    // y = okey%90 — bucket mon = x div 30 = month (okey%30 < 30)
    "q303_geometry_lake" ->
      """WITH pts AS (
        |  SELECT o_orderkey AS okey,
        |    month(CAST(o_orderdate AS DATE)) * 30 + o_orderkey % 30 AS x,
        |    o_orderkey % 90 AS y
        |  FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995)
        |SELECT CAST(x // 30 AS BIGINT) AS mon,
        |  CAST(count(*) AS BIGINT) AS n_pts,
        |  CAST(sum(x) AS BIGINT) AS sum_x,
        |  CAST(sum(y) AS BIGINT) AS sum_y,
        |  CAST(min(okey) AS BIGINT) AS min_okey,
        |  CAST(max(okey) AS BIGINT) AS max_okey
        |FROM pts GROUP BY 1 ORDER BY mon""".stripMargin,

    "q304_shred_corpus" ->
      """SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(min(doc_id) AS BIGINT) AS min_doc,
        |  CAST(max(doc_id) AS BIGINT) AS max_doc
        |FROM documents
        |WHERE lang <> 'zh'
        |GROUP BY 1 ORDER BY lang""".stripMargin)
}
