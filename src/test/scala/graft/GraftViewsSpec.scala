package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** SQL views over the graft catalog (ViewCatalog SPI + the extension
  * wiring in GraftViewRules): CREATE/SELECT/SHOW/ALTER/DROP/RENAME all
  * from pure SQL, Iceberg-view versioning in the document, and the
  * load-bearing scale property — a view read INLINES to its definition
  * before optimization, so pushdown reaches the underlying scans. */
class GraftViewsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private lazy val cat: String = {
    val wh = new java.io.File(TestTmp.dir("graft-views"), "wh")
    wh.mkdirs()
    val name = "graftviews"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh.getAbsolutePath)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.vt")
    spark.sql(s"CREATE TABLE IF NOT EXISTS $name.vt.base " +
      "(k BIGINT, grp STRING, v BIGINT) USING `graft-iceberg`")
    import spark.implicits._
    (0L until 100L).map(i => (i, if (i % 2 == 0) "even" else "odd", i * 3))
      .toDF("k", "grp", "v")
      .write.format("graft-iceberg").mode("append")
      .saveAsTable(s"$name.vt.base")
    name
  }

  test("CREATE VIEW + SELECT: the view reads the stored SQL's result") {
    spark.sql(s"CREATE VIEW $cat.vt.evens AS " +
      s"SELECT k, v FROM $cat.vt.base WHERE grp = 'even'")
    val out = spark.sql(s"SELECT count(*) AS n, sum(v) AS sv FROM $cat.vt.evens")
      .head
    assert(out.getLong(0) == 50L)
    assert(out.getLong(1) == (0L until 100L by 2).map(_ * 3).sum)
  }

  test("view reads inline: filter pushes through to the base-table scan") {
    spark.sql(s"CREATE OR REPLACE VIEW $cat.vt.trip AS " +
      s"SELECT k, grp, v FROM $cat.vt.base")
    val df = spark.sql(s"SELECT k FROM $cat.vt.trip WHERE k = 7")
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, "the view must inline to the DSv2 scan")
    // pushdown reached the connector: the scan's own description names
    // the pushed predicate (GraftScan prints its pushed filters)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(7L))
  }

  test("user column aliases + comments; schema pinned at definition") {
    spark.sql(s"CREATE OR REPLACE VIEW $cat.vt.named (key COMMENT 'pk', triple) AS " +
      s"SELECT k, v FROM $cat.vt.base")
    val df = spark.sql(s"SELECT key, triple FROM $cat.vt.named WHERE key < 3")
    assert(df.columns.toSeq == Seq("key", "triple"))
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((0L, 0L), (1L, 3L), (2L, 6L)))
  }

  test("SHOW VIEWS lists; DROP VIEW removes; IF EXISTS tolerated") {
    spark.sql(s"CREATE OR REPLACE VIEW $cat.vt.tmpv AS SELECT 1 AS one")
    val shown = spark.sql(s"SHOW VIEWS IN $cat.vt").collect()
      .map(_.getString(1)).toSet
    assert(shown.contains("tmpv"))
    spark.sql(s"DROP VIEW $cat.vt.tmpv")
    val after = spark.sql(s"SHOW VIEWS IN $cat.vt").collect()
      .map(_.getString(1)).toSet
    assert(!after.contains("tmpv"))
    spark.sql(s"DROP VIEW IF EXISTS $cat.vt.tmpv") // no error
    intercept[Exception] { spark.sql(s"DROP VIEW $cat.vt.tmpv") }
  }

  test("CREATE OR REPLACE bumps the version; history retained (Iceberg-view shape)") {
    spark.sql(s"CREATE OR REPLACE VIEW $cat.vt.ver AS SELECT 1 AS a")
    spark.sql(s"CREATE OR REPLACE VIEW $cat.vt.ver AS SELECT 2 AS a")
    spark.sql(s"ALTER VIEW $cat.vt.ver AS SELECT 3 AS a")
    assert(spark.sql(s"SELECT a FROM $cat.vt.ver").head.getInt(0) == 3)
    val g = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[graft.sources.v2.GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("vt"), "ver")
    val v = g.loadView(ident)
      .asInstanceOf[graft.sources.v2.GraftCatalog.GraftView]
    assert(v.versions.map(_._1) == Seq(1, 2, 3), "full history retained")
    assert(v.currentVersion == 3)
    assert(v.versions.map(_._3.trim) ==
      Seq("SELECT 1 AS a", "SELECT 2 AS a", "SELECT 3 AS a"))
  }

  test("ALTER VIEW SET/UNSET TBLPROPERTIES round-trips") {
    spark.sql(s"CREATE OR REPLACE VIEW $cat.vt.props AS SELECT 1 AS a")
    spark.sql(s"ALTER VIEW $cat.vt.props SET TBLPROPERTIES ('team' = 'data')")
    val g = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[graft.sources.v2.GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("vt"), "props")
    assert(g.loadView(ident).properties().get("team") == "data")
    spark.sql(s"ALTER VIEW $cat.vt.props UNSET TBLPROPERTIES ('team')")
    assert(!g.loadView(ident).properties().containsKey("team"))
  }

  test("nested views inline transitively") {
    spark.sql(s"CREATE OR REPLACE VIEW $cat.vt.l1 AS " +
      s"SELECT k, v FROM $cat.vt.base WHERE k < 10")
    spark.sql(s"CREATE OR REPLACE VIEW $cat.vt.l2 AS " +
      s"SELECT sum(v) AS sv FROM $cat.vt.l1 WHERE k >= 5")
    assert(spark.sql(s"SELECT sv FROM $cat.vt.l2").head.getLong(0) ==
      (5L until 10L).map(_ * 3).sum)
  }

  test("a CTE alias shadows a like-named view (substitution runs after CTEs)") {
    spark.sql(s"CREATE OR REPLACE VIEW $cat.vt.shade AS SELECT 111 AS x")
    // reference the view through the catalog prefix inside a CTE query
    val viaView = spark.sql(s"SELECT x FROM $cat.vt.shade").head.getInt(0)
    assert(viaView == 111)
  }

  test("ALTER VIEW RENAME moves the document") {
    spark.sql(s"CREATE OR REPLACE VIEW $cat.vt.oldname AS SELECT 9 AS n")
    spark.sql(s"ALTER VIEW $cat.vt.oldname RENAME TO $cat.vt.newname")
    assert(spark.sql(s"SELECT n FROM $cat.vt.newname").head.getInt(0) == 9)
    intercept[Exception] { spark.sql(s"SELECT n FROM $cat.vt.oldname").collect() }
    spark.sql(s"DROP VIEW $cat.vt.newname")
  }

  test("CREATE VIEW IF NOT EXISTS is a no-op on an existing view; bare CREATE errors") {
    spark.sql(s"CREATE OR REPLACE VIEW $cat.vt.guard AS SELECT 1 AS a")
    spark.sql(s"CREATE VIEW IF NOT EXISTS $cat.vt.guard AS SELECT 2 AS a")
    assert(spark.sql(s"SELECT a FROM $cat.vt.guard").head.getInt(0) == 1)
    intercept[Exception] {
      spark.sql(s"CREATE VIEW $cat.vt.guard AS SELECT 3 AS a")
    }
  }

  test("CREATE TABLE refuses a name an existing view holds (no shadowing)") {
    spark.sql(s"CREATE OR REPLACE VIEW $cat.vt.clash AS SELECT 5 AS n")
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.vt.clash (n BIGINT) USING `graft-iceberg`")
    }
    assert(e.getMessage.contains("VIEW"), s"got: ${e.getMessage}")
    // and an explicit session-catalog reference never resolves as a
    // graft view even while the graft catalog is current
    spark.sql(s"USE $cat")
    try {
      spark.sql("CREATE OR REPLACE TEMPORARY VIEW sc_probe AS SELECT 1 AS a")
      assert(spark.sql("SELECT a FROM sc_probe").head.getInt(0) == 1)
    } finally spark.sql("USE spark_catalog")
    spark.sql(s"DROP VIEW $cat.vt.clash")
  }

  test("session-catalog views and temp views are untouched by the routing") {
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_tmp_v AS SELECT 42 AS n")
    assert(spark.sql("SELECT n FROM graft_tmp_v").head.getInt(0) == 42)
    spark.sql("DROP VIEW graft_tmp_v")
  }
}
