package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Iceberg-v3 VARIANT SHREDDING (`graft.variant-shred.<col>`): declared
  * paths materialize as typed parquet subcolumns, per-file bounds are
  * recorded under synthetic stat ids, reads reassemble the variant
  * losslessly, and `variant_get` predicates SKIP FILES through the
  * `_shred_*` metadata-column twin ([[graft.plans.VariantShredPrune]]). */
class VariantShredSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSpec.spark
    val wh = new java.io.File("target/tmp-vshred-wh")
    org.apache.commons.io.FileUtils.deleteQuietly(wh)
    s.conf.set("spark.sql.catalog.vsh",
      classOf[graft.sources.v2.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.vsh.warehouse", wh.getAbsolutePath)
    s.sql("CREATE NAMESPACE IF NOT EXISTS vsh.db")
    s
  }

  private def mkTable(name: String): String = {
    val tbl = s"vsh.db.$name"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, doc VARIANT) " +
      "USING `graft-iceberg` TBLPROPERTIES (" +
      "'graft.variant-shred.doc' = '$.mon:bigint,$.tag:string')")
    tbl
  }

  test("shredded files round-trip losslessly (typed, mistyped, missing, non-object)") {
    val tbl = mkTable("rt")
    spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
      // typed match on both paths + residual fields
      "(1L, parse_json('{\"mon\": 3, \"tag\": \"a\", \"extra\": [1, 2]}')), " +
      // mon mistyped (string) -> field-level value fallback
      "(2L, parse_json('{\"mon\": \"notanum\", \"tag\": \"b\"}')), " +
      // paths missing entirely
      "(3L, parse_json('{\"other\": true}')), " +
      // not an object
      "(4L, parse_json('[1, 2, 3]')), " +
      // empty object
      "(5L, parse_json('{}')), " +
      // null variant
      "(6L, CAST(NULL AS VARIANT)) AS t(k, doc)")
    val got = spark.sql(
      s"SELECT k, to_json(doc) FROM $tbl ORDER BY k").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("-"))).toSeq
    assert(got == Seq(
      (1L, """{"extra":[1,2],"mon":3,"tag":"a"}"""),
      (2L, """{"mon":"notanum","tag":"b"}"""),
      (3L, """{"other":true}"""),
      (4L, "[1,2,3]"),
      (5L, "{}"),
      (6L, "-")), got.mkString(", "))
    // the physical file really is SHREDDED: typed_value group present
    val tdir = "target/tmp-vshred-wh/db/rt"
    val dataFile = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, tdir, "t", Nil)
      .filter(col("content") === 0).select("file_path").head.getString(0)
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(dataFile),
      new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val fs = try r.getFooter.getFileMetaData.getSchema finally r.close()
    val docType = fs.getFields.get(fs.getFieldIndex("doc")).asGroupType()
    assert(docType.containsField("typed_value"), docType.toString)
    val tv = docType.getType("typed_value").asGroupType()
    assert(tv.containsField("mon") && tv.containsField("tag"), tv.toString)
  }

  test("_shred_* metadata columns serve variant_get try-cast semantics") {
    val tbl = mkTable("meta")
    spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
      "(1L, parse_json('{\"mon\": 7, \"tag\": \"x\"}')), " +
      "(2L, parse_json('{\"mon\": \"bad\"}')), " +
      "(3L, parse_json('[]')) AS t(k, doc)")
    val got = spark.sql(
      s"SELECT k, _shred_doc_mon, _shred_doc_tag FROM $tbl ORDER BY k")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) "-" else r.getString(2))).toSeq
    // mon='bad' casts to NULL under try semantics; non-object -> NULL
    assert(got == Seq((1L, 7L, "x"), (2L, -1L, "-"), (3L, -1L, "-")),
      got.mkString(", "))
  }

  test("variant_get predicates skip files on recorded shred bounds") {
    val tbl = mkTable("skip")
    // two files with DISJOINT $.mon ranges
    spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ id AS k, " +
      "parse_json(concat('{\"mon\": ', id, '}')) AS doc " +
      "FROM range(0, 100)")
    spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ id AS k, " +
      "parse_json(concat('{\"mon\": ', id, '}')) AS doc " +
      "FROM range(1000, 1100)")
    val q = spark.sql(s"SELECT k FROM $tbl " +
      "WHERE variant_get(doc, '$.mon', 'bigint') >= 1000")
    // the pruning twin must reach the scan: one of two files survives
    assert(q.rdd.getNumPartitions == 1,
      s"expected 1 surviving file, got ${q.rdd.getNumPartitions} " +
        s"partitions; plan:\n${q.queryExecution.executedPlan}")
    assert(q.count() == 100L)
    // the twin is pushed (visible in the scan description)
    val scanDesc = q.queryExecution.executedPlan.toString
    assert(scanDesc.contains("_shred_doc_mon"),
      s"pushed shred filter missing from plan:\n$scanDesc")
    // and the unshredded-direction predicate still answers exactly
    val low = spark.sql(s"SELECT sum(k) FROM $tbl " +
      "WHERE variant_get(doc, '$.mon', 'bigint') < 50").head.getLong(0)
    assert(low == (0L until 50L).sum, low.toString)
  }

  for (fmt <- Seq("orc", "avro")) {
    test(s"variant_get filters answer correctly over $fmt data files") {
      // non-parquet files of a shred-declared table are physically
      // unshredded, but the pruning twin VariantShredPrune ands on is
      // evaluated ROW-LEVEL by their reader too — a reader that
      // null-filled _shred_* would silently drop every matching row
      val tbl = s"vsh.db.row_$fmt"
      spark.sql(s"CREATE TABLE $tbl (k BIGINT, doc VARIANT) " +
        "USING `graft-iceberg` TBLPROPERTIES (" +
        s"'write.format.default' = '$fmt', " +
        "'graft.variant-shred.doc' = '$.mon:bigint,$.tag:string')")
      spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ id, " +
        "parse_json(concat('{\"mon\": ', id, '}')) FROM range(0, 20)")
      val got = spark.sql(s"SELECT k FROM $tbl " +
        "WHERE variant_get(doc, '$.mon', 'bigint') >= 15 ORDER BY k")
        .collect().map(_.getLong(0)).toSeq
      assert(got == (15L until 20L).toSeq, s"$fmt: $got")
      // the _shred_ metadata column itself serves from the row reader
      val meta = spark.sql(s"SELECT sum(_shred_doc_mon) FROM $tbl")
        .head.getLong(0)
      assert(meta == (0L until 20L).sum, s"$fmt meta: $meta")
    }
  }

  test("a mistyped value suppresses the file's shred bounds (never pruned)") {
    val tbl = "vsh.db.sup"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, doc VARIANT) " +
      "USING `graft-iceberg` TBLPROPERTIES (" +
      "'graft.variant-shred.doc' = '$.mon:bigint')")
    // file A: strictly-typed 0..99; file B: strictly 200..299 PLUS one
    // mistyped value ("5e2" is a string whose try-cast to bigint could
    // exceed any strict bound) -> B records NO mon bounds
    spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ id, " +
      "parse_json(concat('{\"mon\": ', id, '}')) FROM range(0, 100)")
    spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ id, " +
      "CASE WHEN id = 250 THEN parse_json('{\"mon\": \"500\"}') " +
      "ELSE parse_json(concat('{\"mon\": ', id, '}')) END " +
      "FROM range(200, 300)")
    // try-cast of the string lands OUTSIDE B's strict value range —
    // B must still be read (bounds suppressed), A prunes away
    val q = spark.sql(s"SELECT k FROM $tbl " +
      "WHERE variant_get(doc, '$.mon', 'bigint') = 500")
    assert(q.rdd.getNumPartitions == 1,
      s"A pruned, B conservatively kept: ${q.rdd.getNumPartitions}")
    val got = q.collect().map(_.getLong(0)).toSeq
    assert(got == Seq(250L), s"the mistyped row must surface: $got")
  }

  test("maintenance rewrites preserve shredded variants losslessly") {
    val tbl = "vsh.db.rw"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, doc VARIANT) " +
      "USING `graft-iceberg` TBLPROPERTIES (" +
      "'graft.variant-shred.doc' = '$.mon:bigint')")
    spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
      "(1L, parse_json('{\"mon\": 5, \"other\": \"x\"}')), " +
      "(2L, parse_json('{\"mon\": 9}')) AS t(k, doc)")
    val before = spark.sql(
      s"SELECT k, to_json(doc) FROM $tbl ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(before == Seq((1L, """{"mon":5,"other":"x"}"""),
      (2L, """{"mon":9}""")), before.toString)
    spark.sql("CALL vsh.system.rewrite_data_files('db.rw')")
    val after = spark.sql(
      s"SELECT k, to_json(doc) FROM $tbl ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(after == before,
      s"rewrite must not lose shredded fields: $after vs $before")
  }

  test("MOR deletes and unshredded history coexist with shredding") {
    val tbl = "vsh.db.mix"
    // table born UNSHREDDED, then the property lands via ALTER — old
    // files stay two-binary, new files shred, both read back
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, doc VARIANT) " +
      "USING `graft-iceberg` TBLPROPERTIES (" +
      "'write.delete.mode' = 'merge-on-read')")
    spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
      "(1L, parse_json('{\"mon\": 1}')), " +
      "(2L, parse_json('{\"mon\": 2}')) AS t(k, doc)")
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES (" +
      "'graft.variant-shred.doc' = '$.mon:bigint')")
    spark.sql(s"INSERT INTO $tbl SELECT /*+ COALESCE(1) */ * FROM VALUES " +
      "(3L, parse_json('{\"mon\": 3}')), " +
      "(4L, parse_json('{\"mon\": 4}')) AS t(k, doc)")
    // MOR delete keyed off the variant across both file generations
    spark.sql(s"DELETE FROM $tbl " +
      "WHERE variant_get(doc, '$.mon', 'bigint') % 2 = 0")
    val got = spark.sql(
      s"SELECT k, variant_get(doc, '$$.mon', 'bigint') AS mon " +
        s"FROM $tbl ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 1L), (3L, 3L)), got.mkString(", "))
  }
}
