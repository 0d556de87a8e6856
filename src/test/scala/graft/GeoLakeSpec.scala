package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** GEOMETRY / GEOGRAPHY / UNKNOWN lake types
  * (`graft.lake-type.<col>`): WKB in BINARY across all three formats,
  * per-file bbox bounds (4 virtual DOUBLE edges + the spec's WKB-point
  * lower/upper), `_geo_*` metadata columns, and conservative intersects
  * pruning as ordinary conjunct pushdown. `unknown` is null-only. */
class GeoLakeSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSpec.spark
    val wh = new java.io.File("target/tmp-geo-wh")
    org.apache.commons.io.FileUtils.deleteQuietly(wh)
    s.conf.set("spark.sql.catalog.geo",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.geo.warehouse", wh.getAbsolutePath)
    s.sql("CREATE NAMESPACE IF NOT EXISTS geo.db")
    s
  }

  test("WKB bbox parser: point / linestring / polygon / multi, both endians") {
    import graft.sources.v2.GeoLake
    assert(GeoLake.bbox(GeoLake.wkbPoint(3.5, -2.0))
      .contains((3.5, -2.0, 3.5, -2.0)))
    // big-endian point
    val be = java.nio.ByteBuffer.allocate(21)
      .put(0.toByte).putInt(1).putDouble(1.0).putDouble(2.0).array()
    assert(GeoLake.bbox(be).contains((1.0, 2.0, 1.0, 2.0)))
    // linestring (1,1)-(4,-3)
    val ls = java.nio.ByteBuffer.allocate(9 + 2 * 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(1.toByte).putInt(2).putInt(2)
      .putDouble(1).putDouble(1).putDouble(4).putDouble(-3).array()
    assert(GeoLake.bbox(ls).contains((1.0, -3.0, 4.0, 1.0)))
    // polygon, one ring (0,0) (2,0) (2,2) (0,0)
    val pg = java.nio.ByteBuffer.allocate(13 + 4 * 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(1.toByte).putInt(3).putInt(1).putInt(4)
      .putDouble(0).putDouble(0).putDouble(2).putDouble(0)
      .putDouble(2).putDouble(2).putDouble(0).putDouble(0).array()
    assert(GeoLake.bbox(pg).contains((0.0, 0.0, 2.0, 2.0)))
    // multipoint of two LE points
    val mp = java.nio.ByteBuffer.allocate(9 + 2 * 21)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(1.toByte).putInt(4).putInt(2)
      .put(GeoLake.wkbPoint(-1, 5)).put(GeoLake.wkbPoint(7, 0)).array()
    assert(GeoLake.bbox(mp).contains((-1.0, 0.0, 7.0, 5.0)))
    intercept[Exception] { GeoLake.bbox(Array[Byte](1, 2, 3)) }
  }

  for (fmt <- Seq("parquet", "orc", "avro")) {
    test(s"geometry round-trip + _geo_ columns + MOR delete in $fmt") {
      val tbl = s"geo.db.g_$fmt"
      spark.sql(s"CREATE TABLE $tbl (k BIGINT, g BINARY) " +
        "USING `graft-iceberg` TBLPROPERTIES (" +
        s"'write.format.default' = '$fmt', " +
        "'write.delete.mode' = 'merge-on-read', " +
        "'graft.lake-type.g' = 'geometry')")
      spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ id, " +
        "st_point(CAST(id AS DOUBLE), CAST(id * 2 AS DOUBLE)) " +
        "FROM range(0, 10)")
      val got = spark.sql(
        s"SELECT k, st_xmin(g), st_ymin(g), _geo_g_xmin, _geo_g_ymax " +
          s"FROM $tbl ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4)))
      assert(got.forall { case (k, x, y, mx, my) =>
        x == k.toDouble && y == k * 2.0 && mx == x && my == y }, got.toSeq)
      // MOR delete by a bbox predicate
      spark.sql(s"DELETE FROM $tbl WHERE st_xmin(g) < 5.0")
      val kept = spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect()
        .map(_.getLong(0)).toSeq
      assert(kept == (5L until 10L).toSeq, s"$fmt: $kept")
    }
  }

  test("bbox-predicate file skip: intersects conjuncts prune on bounds") {
    val tbl = "geo.db.skip"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, g BINARY) " +
      "USING `graft-iceberg` TBLPROPERTIES (" +
      "'graft.lake-type.g' = 'geometry')")
    // two files with DISJOINT x ranges
    spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ id, " +
      "st_point(CAST(id AS DOUBLE), 0.0D) FROM range(0, 100)")
    spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ id, " +
      "st_point(CAST(id AS DOUBLE), 0.0D) FROM range(1000, 1100)")
    // intersects window x in [1050, 1060]: the standard bbox test —
    // each conjunct pushes and prunes on the recorded per-file bounds
    val q = spark.sql(s"SELECT k FROM $tbl " +
      "WHERE _geo_g_xmin <= 1060.0 AND _geo_g_xmax >= 1050.0")
    assert(q.rdd.getNumPartitions == 1,
      s"expected 1 surviving file, got ${q.rdd.getNumPartitions}:\n" +
        q.queryExecution.executedPlan)
    assert(q.count() == 11L)
    // spec-shaped WKB-point bounds really landed in the manifest under
    // the geometry column's own stat id
    val tdir = "target/tmp-geo-wh/db/skip"
    val manifest = new java.io.File(tdir, "metadata").listFiles()
      .filter(f => f.getName.startsWith("manifest-") &&
        f.getName.endsWith(".avro")).head
    val rdr = new org.apache.avro.file.DataFileReader(manifest,
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val entry = try rdr.next() finally rdr.close()
    val df = entry.get("data_file")
      .asInstanceOf[org.apache.avro.generic.GenericRecord]
    val lowerIds = df.get("lower_bounds")
      .asInstanceOf[java.util.Collection[
        org.apache.avro.generic.GenericRecord]]
    import scala.jdk.CollectionConverters._
    val keys = lowerIds.asScala.map(_.get("key").asInstanceOf[Int]).toSet
    assert(keys.contains(2), s"WKB-point bound under the column id: $keys")
    assert(keys.exists(_ >= graft.sources.v2.GeoLake.StatIdBase),
      s"virtual bbox-edge bounds: $keys")
  }

  test("geography rides the same machinery") {
    val tbl = "geo.db.gg"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, g BINARY) " +
      "USING `graft-iceberg` TBLPROPERTIES (" +
      "'graft.lake-type.g' = 'geography')")
    spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ id, " +
      "st_point(CAST(id AS DOUBLE) - 90.0, 45.0D) FROM range(0, 4)")
    val got = spark.sql(
      s"SELECT min(_geo_g_xmin), max(_geo_g_xmax) FROM $tbl").head
    assert(got.getDouble(0) == -90.0 && got.getDouble(1) == -87.0, got)
  }

  test("unknown lake type: null-only — reads null, writes refuse values") {
    val tbl = "geo.db.unk"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, u STRING) " +
      "USING `graft-iceberg` TBLPROPERTIES (" +
      "'graft.lake-type.u' = 'unknown')")
    spark.sql(s"INSERT INTO $tbl VALUES (1L, CAST(NULL AS STRING)), " +
      "(2L, CAST(NULL AS STRING))")
    val rows = spark.sql(s"SELECT k, u FROM $tbl ORDER BY k").collect()
    assert(rows.length == 2 && rows.forall(_.isNullAt(1)))
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $tbl VALUES (3L, 'not-null')")
    }
    assert(e.getMessage != null, "non-null write into unknown must refuse")
    assert(spark.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) == 2L,
      "the refused insert must not commit")
  }
}
