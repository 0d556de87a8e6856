package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Vector columns as FIRST-CLASS lake data: `ARRAY<primitive>` columns
  * ride the connector's SQL write path (standard 3-level parquet LIST)
  * and read back through the connector scan with full MOR semantics —
  * the embedding-table shape every similarity/decontamination operator
  * consumes, now creatable and maintainable through pure SQL. */
class VectorTableSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSpec.spark
    val wh = new java.io.File("target/tmp-vec-wh")
    org.apache.commons.io.FileUtils.deleteQuietly(wh)
    s.conf.set("spark.sql.catalog.vec",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.vec.warehouse", wh.getAbsolutePath)
    s.sql("CREATE NAMESPACE IF NOT EXISTS vec.db")
    s
  }

  test("ARRAY<DOUBLE> round-trips through SQL INSERT + connector scan") {
    spark.sql("CREATE TABLE vec.db.emb (vec_id BIGINT, e ARRAY<DOUBLE>) " +
      "USING `graft-iceberg`")
    spark.sql("INSERT INTO vec.db.emb VALUES " +
      "(1, array(1.0D, 0.0D, 0.0D)), " +
      "(2, array(0.0D, 1.0D, 0.0D)), " +
      "(3, array(0.6D, 0.8D, 0.0D)), " +
      "(4, NULL)")
    val rows = spark.sql("SELECT vec_id, e FROM vec.db.emb ORDER BY vec_id")
      .collect()
    assert(rows.length == 4)
    assert(rows(0).getSeq[Double](1) == Seq(1.0, 0.0, 0.0))
    assert(rows(2).getSeq[Double](1) == Seq(0.6, 0.8, 0.0))
    assert(rows(3).isNullAt(1))
    // vector arithmetic over the lake column: cosine vs a probe
    val top = spark.sql("""
      |SELECT vec_id,
      |  round(aggregate(zip_with(e, array(0.0D, 1.0D, 0.0D),
      |    (a, b) -> a * b), 0.0D, (acc, x) -> acc + x), 4) AS dot
      |FROM vec.db.emb WHERE e IS NOT NULL
      |ORDER BY dot DESC, vec_id LIMIT 1""".stripMargin).head
    assert(top.getLong(0) == 2L && top.getDouble(1) == 1.0)
  }

  test("MOR DELETE applies to vector rows; null elements survive") {
    spark.sql("CREATE TABLE vec.db.mor (vec_id BIGINT, e ARRAY<BIGINT>) " +
      "USING `graft-iceberg` TBLPROPERTIES (" +
      "'write.delete.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO vec.db.mor SELECT /*+ COALESCE(1) */ * " +
      "FROM VALUES (1L, array(1L, 2L)), (2L, array(3L, CAST(NULL AS BIGINT)))," +
      " (3L, array(4L)) AS t(vec_id, e)")
    spark.sql("DELETE FROM vec.db.mor WHERE vec_id = 1")
    val rows = spark.sql("SELECT vec_id, e FROM vec.db.mor ORDER BY vec_id")
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 3L))
    // a NULL element inside the array round-trips as null, not dropped
    val e2 = rows(0).getSeq[Any](1)
    assert(e2 == Seq(3L, null), e2.toString)
  }

  for (fmt <- Seq("orc", "avro")) {
    test(s"ARRAY<DOUBLE> vector table round-trips + MOR delete in $fmt") {
      val tbl = s"vec.db.emb_$fmt"
      spark.sql(s"CREATE TABLE $tbl (vec_id BIGINT, e ARRAY<DOUBLE>) " +
        "USING `graft-iceberg` TBLPROPERTIES (" +
        s"'write.format.default' = '$fmt', " +
        "'write.delete.mode' = 'merge-on-read')")
      spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
        "(1L, array(1.0D, 0.0D, 0.0D)), " +
        "(2L, array(0.0D, 1.0D, 0.0D)), " +
        "(3L, array(0.6D, 0.8D, CAST(NULL AS DOUBLE))), " +
        "(4L, CAST(NULL AS ARRAY<DOUBLE>)) AS t(vec_id, e)")
      val rows = spark.sql(s"SELECT vec_id, e FROM $tbl ORDER BY vec_id")
        .collect()
      assert(rows.length == 4)
      assert(rows(0).getSeq[Double](1) == Seq(1.0, 0.0, 0.0))
      assert(rows(2).getSeq[Any](1) == Seq(0.6, 0.8, null))
      assert(rows(3).isNullAt(1))
      // the file really is the declared format
      val fmts = graft.sources.IcebergManifestSource
        .statsFromTableDir(spark, s"target/tmp-vec-wh/db/emb_$fmt", "t", Nil)
        .filter(col("content") === 0)
        .select("file_format").collect().map(_.getString(0)).toSet
      assert(fmts == Set(fmt.toUpperCase), fmts.toString)
      // MOR delete over the vector rows (position tombstones must apply
      // across this format's ordinal accounting)
      spark.sql(s"DELETE FROM $tbl WHERE vec_id IN (1, 4)")
      val left = spark.sql(s"SELECT vec_id FROM $tbl ORDER BY vec_id")
        .collect().map(_.getLong(0)).toSeq
      assert(left == Seq(2L, 3L), left.toString)
      // vector arithmetic still exact through the scan
      val top = spark.sql(s"""
        |SELECT vec_id,
        |  round(aggregate(zip_with(e, array(0.0D, 1.0D, 0.0D),
        |    (a, b) -> coalesce(a, 0.0D) * b), 0.0D, (acc, x) -> acc + x),
        |    4) AS dot
        |FROM $tbl ORDER BY dot DESC, vec_id LIMIT 1""".stripMargin).head
      assert(top.getLong(0) == 2L && top.getDouble(1) == 1.0)
    }
  }

  for (fmt <- Seq("parquet", "orc", "avro")) {
    test(s"two-level struct + array-of-struct round-trip in $fmt") {
      val tbl = s"vec.db.deep_$fmt"
      spark.sql(s"""CREATE TABLE $tbl (k BIGINT,
        |  meta STRUCT<src: STRING, geo: STRUCT<lat: DOUBLE, lon: DOUBLE>>,
        |  tags ARRAY<STRUCT<name: STRING, score: BIGINT>>)
        |USING `graft-iceberg` TBLPROPERTIES (
        |  'write.format.default' = '$fmt',
        |  'write.delete.mode' = 'merge-on-read')""".stripMargin)
      spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
        "(1L, named_struct('src', 'web', 'geo', " +
        "   named_struct('lat', 1.5D, 'lon', -2.5D)), " +
        "  array(named_struct('name', 'a', 'score', 10L), " +
        "        named_struct('name', 'b', 'score', 20L))), " +
        "(2L, named_struct('src', 'pdf', 'geo', " +
        "   CAST(NULL AS STRUCT<lat: DOUBLE, lon: DOUBLE>)), " +
        "  array(named_struct('name', 'c', 'score', CAST(NULL AS BIGINT)))), " +
        "(3L, CAST(NULL AS STRUCT<src: STRING, " +
        "   geo: STRUCT<lat: DOUBLE, lon: DOUBLE>>), " +
        "  CAST(NULL AS ARRAY<STRUCT<name: STRING, score: BIGINT>>)) " +
        "AS t(k, meta, tags)")
      val got = spark.sql(s"""SELECT k, meta.src, meta.geo.lat,
        |  coalesce(size(tags), -1) AS n_tags,
        |  aggregate(tags, 0L, (a, x) -> a + coalesce(x.score, 0L)) AS total
        |FROM $tbl ORDER BY k""".stripMargin).collect()
        .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("-"),
          if (r.isNullAt(2)) -999.0 else r.getDouble(2),
          r.getInt(3), if (r.isNullAt(4)) -999L else r.getLong(4)))
      assert(got.toSeq == Seq(
        (1L, "web", 1.5, 2, 30L),
        (2L, "pdf", -999.0, 1, 0L),
        (3L, "-", -999.0, -1, -999L)), got.mkString(", "))
      // MOR delete by a DEEP leaf predicate: the ordinal-carrying scan
      // must handle the nested shape
      spark.sql(s"DELETE FROM $tbl WHERE meta.geo.lat > 1.0D")
      assert(spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect()
        .map(_.getLong(0)).toSeq == Seq(2L, 3L))
    }
  }

  test("CTAS from the embeddings fixture: float arrays land and aggregate") {
    val src = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    src.createOrReplaceTempView("vts_src")
    spark.sql("DROP TABLE IF EXISTS vec.db.ctas")
    spark.sql("""CREATE TABLE vec.db.ctas USING `graft-iceberg` AS
      |SELECT vec_id, transform(embedding, v -> CAST(v AS DOUBLE)) AS e
      |FROM vts_src WHERE vec_id < 50""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM vec.db.ctas").head.getLong(0) == 50L)
    // element-wise arithmetic exact vs the source
    val got = spark.sql(
      "SELECT round(sum(aggregate(e, 0.0D, (a, x) -> a + x)), 4) " +
        "FROM vec.db.ctas").head.getDouble(0)
    val want = spark.sql(
      "SELECT round(sum(aggregate(transform(embedding, " +
        "v -> CAST(v AS DOUBLE)), 0.0D, (a, x) -> a + x)), 4) " +
        "FROM vts_src WHERE vec_id < 50").head.getDouble(0)
    assert(got == want)
  }

  test("ARRAY<ARRAY<DOUBLE>> round-trips (nested lists, any depth)") {
    spark.sql("CREATE TABLE vec.db.nested (k BIGINT, e ARRAY<ARRAY<DOUBLE>>) " +
      "USING `graft-iceberg`")
    spark.sql("INSERT INTO vec.db.nested SELECT /*+ COALESCE(1) */ * " +
      "FROM VALUES " +
      "(1L, array(array(1.0D, 2.0D), array(3.0D))), " +
      "(2L, array(array(CAST(NULL AS DOUBLE)), " +
      "  CAST(NULL AS ARRAY<DOUBLE>))) AS t(k, e)")
    val rows = spark.sql(
      "SELECT k, e FROM vec.db.nested ORDER BY k").collect()
    assert(rows(0).getSeq[Seq[Double]](1) == Seq(Seq(1.0, 2.0), Seq(3.0)))
    val r2 = rows(1).getSeq[Any](1)
    assert(r2 == Seq(Seq(null), null), r2.toString)
    // flattened arithmetic through the scan stays exact
    val s = spark.sql("SELECT sum(aggregate(flatten(filter(e, " +
      "x -> x IS NOT NULL)), 0.0D, (a, x) -> a + coalesce(x, 0.0D))) " +
      "FROM vec.db.nested").head.getDouble(0)
    assert(s == 6.0, s.toString)
  }

  // MAP lake columns (round 14 — the last composite type): string-key
  // maps ride parquet MAP key_value groups / ORC MapColumnVector / the
  // native avro map; null values and null maps survive; MOR DELETE by
  // a map-key predicate tombstones without touching data bytes.
  for (fmt <- Seq("parquet", "orc", "avro")) {
    test(s"MAP<STRING,BIGINT> round-trips + MOR delete in $fmt") {
      val tbl = s"vec.db.map_$fmt"
      spark.sql(s"CREATE TABLE $tbl (k BIGINT, m MAP<STRING, BIGINT>) " +
        "USING `graft-iceberg` TBLPROPERTIES (" +
        s"'write.format.default' = '$fmt', " +
        "'write.delete.mode' = 'merge-on-read')")
      spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
        "(1L, map('a', 1L, 'b', 2L)), " +
        "(2L, map('a', 10L, 'c', CAST(NULL AS BIGINT))), " +
        "(3L, map()), " +
        "(4L, CAST(NULL AS MAP<STRING, BIGINT>)) AS t(k, m)")
      val rows = spark.sql(s"SELECT k, m FROM $tbl ORDER BY k").collect()
      assert(rows.length == 4)
      assert(rows(0).getMap[String, Any](1) == Map("a" -> 1L, "b" -> 2L))
      assert(rows(1).getMap[String, Any](1) == Map("a" -> 10L, "c" -> null))
      assert(rows(2).getMap[String, Any](1).isEmpty)
      assert(rows(3).isNullAt(1))
      // MOR delete keyed off a map access — the scan must decode the
      // map to evaluate the residual predicate
      spark.sql(s"DELETE FROM $tbl WHERE m['a'] = 1")
      val kept = spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect()
        .map(_.getLong(0)).toSeq
      assert(kept == Seq(2L, 3L, 4L), kept.toString)
      // map functions evaluate through the scan
      val s2 = spark.sql(s"SELECT sum(coalesce(m['a'], 0L)) FROM $tbl")
        .head.getLong(0)
      assert(s2 == 10L, s2.toString)
    }

    test(s"MAP<BIGINT,STRING> (non-string keys) round-trips in $fmt") {
      val tbl = s"vec.db.mapk_$fmt"
      spark.sql(s"CREATE TABLE $tbl (k BIGINT, m MAP<BIGINT, STRING>) " +
        "USING `graft-iceberg` TBLPROPERTIES (" +
        s"'write.format.default' = '$fmt')")
      spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
        "(1L, map(7L, 'x', 8L, 'y')), " +
        "(2L, map(9L, CAST(NULL AS STRING))) AS t(k, m)")
      val rows = spark.sql(s"SELECT k, m FROM $tbl ORDER BY k").collect()
      assert(rows(0).getMap[Long, Any](1) == Map(7L -> "x", 8L -> "y"))
      assert(rows(1).getMap[Long, Any](1) == Map(9L -> null))
    }

    test(s"composite maps (map-of-array, struct-with-map) in $fmt") {
      val tbl = s"vec.db.mapc_$fmt"
      spark.sql(s"CREATE TABLE $tbl (k BIGINT, " +
        "m MAP<STRING, ARRAY<BIGINT>>, " +
        "s STRUCT<tag: STRING, props: MAP<STRING, BIGINT>>) " +
        "USING `graft-iceberg` TBLPROPERTIES (" +
        s"'write.format.default' = '$fmt')")
      spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
        "(1L, map('p', array(1L, 2L), 'q', array(3L)), " +
        "  named_struct('tag', 't1', 'props', map('n', 5L))), " +
        "(2L, map('r', CAST(NULL AS ARRAY<BIGINT>)), " +
        "  named_struct('tag', CAST(NULL AS STRING), " +
        "    'props', CAST(NULL AS MAP<STRING, BIGINT>))) AS t(k, m, s)")
      val rows = spark.sql(s"SELECT k, m, s FROM $tbl ORDER BY k").collect()
      val m1 = rows(0).getMap[String, Any](1)
      assert(m1("p") == Seq(1L, 2L) && m1("q") == Seq(3L))
      assert(rows(0).getStruct(2).getString(0) == "t1")
      assert(rows(0).getStruct(2).getMap[String, Long](1) == Map("n" -> 5L))
      assert(rows(1).getMap[String, Any](1) == Map("r" -> null))
      assert(rows(1).getStruct(2).isNullAt(0) &&
        rows(1).getStruct(2).isNullAt(1))
      // exploded rollup through the scan
      val sum = spark.sql(s"SELECT sum(v) FROM (SELECT explode(m) AS (mk, a) " +
        s"FROM $tbl) LATERAL VIEW explode(a) AS v").head.getLong(0)
      assert(sum == 6L, sum.toString)
    }
  }
}
