package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-bench for metadata-pin query shapes (guide §1: measure before
  * touching): builds a q287-like fixture (2 inserts, a MOR delete, a
  * rewrite) and times each pin SELECT warm, so "fold sibling pins" and
  * "cheapen all_* sources" decisions rest on numbers, not guesses.
  * `runMain graft.tools.MetaPinBench <sfDir>`. */
object MetaPinBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    implicit val s: SparkSession = spark
    spark.sparkContext.setLogLevel("WARN")
    spark.range(5000000L).selectExpr("sum(id)").collect()

    val wh = new java.io.File(sys.props("java.io.tmpdir"), "graft-metapin")
    org.apache.commons.io.FileUtils.deleteQuietly(wh); wh.mkdirs()
    val cat = "graft_metapin"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.getAbsolutePath)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.en")
    spark.sql(s"DROP TABLE IF EXISTS $cat.en.prof")
    spark.read.parquet(s"$dir/orders.parquet")
      .createOrReplaceTempView("mp_src")
    spark.sql(s"""CREATE TABLE $cat.en.prof (okey BIGINT, yr BIGINT)
                 |USING `graft-iceberg` TBLPROPERTIES (
                 |  'write.delete.mode' = 'merge-on-read',
                 |  'pushdown.fields' = 'okey:1:long')""".stripMargin)
    def timeIt(label: String)(f: => Unit): Unit = {
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"[pin] ${times.min}%7.1f ms (min of 5: ${times.map(t => f"$t%.0f").mkString(",")})  $label")
    }
    timeIt("INSERT yr=1995") {
      spark.sql(s"""INSERT INTO $cat.en.prof
                   |SELECT /*+ COALESCE(1) */ o_orderkey,
                   |  CAST(year(o_orderdate) AS BIGINT)
                   |FROM mp_src WHERE year(o_orderdate) = 1995""".stripMargin)
    }
    spark.sql(s"""INSERT INTO $cat.en.prof
                 |SELECT /*+ COALESCE(1) */ o_orderkey,
                 |  CAST(year(o_orderdate) AS BIGINT)
                 |FROM mp_src WHERE year(o_orderdate) = 1996""".stripMargin)
    spark.sql(s"DELETE FROM $cat.en.prof WHERE okey % 10 = 3")
    spark.sql(s"CALL $cat.system.rewrite_data_files('en.prof')")

    timeIt("floor: SELECT 1") { spark.sql("SELECT 1").collect() }
    timeIt("floor: range(5).count") { spark.range(5).count() }
    timeIt("floor: local Seq toDF collect") {
      import spark.implicits._
      Seq((1L, "a"), (2L, "b")).toDF("x", "y").collect() }
    timeIt("floor: parquet src count") {
      spark.sql("SELECT count(*) FROM mp_src").head() }
    timeIt("floor: DESCRIBE catalog table") {
      spark.sql(s"DESCRIBE TABLE $cat.en.prof").collect() }
    timeIt("floor: direct MetadataTables.files count") {
      graft.sources.MetadataTables.files(spark,
        s"${wh.getAbsolutePath}/en/prof").count() }
    timeIt("floor: statsFromTableDir collect") {
      graft.sources.IcebergManifestSource.statsFromTableDir(spark,
        s"${wh.getAbsolutePath}/en/prof", "t", Nil).collect() }
    timeIt("files count") {
      spark.sql(s"SELECT count(*) FROM $cat.en.prof.files").head() }
    timeIt("entries distinct file_path") {
      spark.sql(s"SELECT DISTINCT file_path FROM $cat.en.prof.entries " +
        "WHERE content = 0").collect() }
    timeIt("entries readable_metrics collect") {
      spark.sql(s"""SELECT file_path, readable_metrics.okey.lower_bound,
                   |  readable_metrics.okey.upper_bound
                   |FROM $cat.en.prof.files WHERE content = 0""".stripMargin)
        .collect() }
    timeIt("history head") {
      spark.sql(s"SELECT snapshot_id FROM $cat.en.prof.history " +
        "WHERE is_current_ancestor ORDER BY ordinal DESC LIMIT 1").head() }
    timeIt("all_files count") {
      spark.sql(s"SELECT count(*) FROM $cat.en.prof.all_files").head() }
    timeIt("all_data_files count") {
      spark.sql(s"SELECT count(*) FROM $cat.en.prof.all_data_files").head() }
    timeIt("all_entries distinct status") {
      spark.sql(s"SELECT DISTINCT status FROM $cat.en.prof.all_entries")
        .collect() }
    timeIt("all_partitions count") {
      spark.sql(s"SELECT count(*) FROM $cat.en.prof.all_partitions").head() }
    timeIt("3-in-1 all_files role counts (UNION ALL)") {
      spark.sql(s"""SELECT 'all', count(*) FROM $cat.en.prof.all_files
                   |UNION ALL SELECT 'data', count(*) FROM $cat.en.prof.all_data_files
                   |UNION ALL SELECT 'del', count(*) FROM $cat.en.prof.all_delete_files
                   |""".stripMargin).collect() }
    timeIt("scan groupBy _file min/max") {
      spark.sql(s"SELECT _file, min(okey), max(okey) FROM $cat.en.prof GROUP BY 1")
        .collect() }
    timeIt("plain table agg") {
      spark.sql(s"SELECT yr, count(*), min(okey) FROM $cat.en.prof GROUP BY yr ORDER BY yr")
        .collect() }
    spark.stop()
  }
}
