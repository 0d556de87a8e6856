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

  test("nested array elements are refused loudly (arrays of primitives only)") {
    spark.sql("CREATE TABLE vec.db.bad (k BIGINT, e ARRAY<ARRAY<DOUBLE>>) " +
      "USING `graft-iceberg`")
    val ex = intercept[Exception] {
      spark.sql("INSERT INTO vec.db.bad VALUES (1, array(array(1.0D)))")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("primitive")), msgs(ex).toString)
  }
}
