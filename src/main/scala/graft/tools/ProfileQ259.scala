package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Step-timing for the q259 fixture: which stage pays the ORC tax.
  * `runMain graft.tools.ProfileQ259 /root/testdata/sf0.1` */
object ProfileQ259 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(5000000L).selectExpr("sum(id)").collect()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          starts.put(j.jobId, (System.nanoTime(),
            Option(j.properties.getProperty("spark.job.description"))
              .getOrElse("?").take(90)))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.get(j.jobId)).foreach { case (t0, desc) =>
            println(f"[job] ${(System.nanoTime() - t0) / 1e9}%.3f s  $desc")
          }
        }
      })
    def t[T](label: String)(body: => T): T = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val r = body
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s" +
        f"  ${jobs.get() - j0}%3d jobs")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"=== rep $rep ===")
      import graft.sources.{IcebergLayoutWriter, LayoutMaintenance, MorRead, OrcPosRead}
      import graft.sources.IcebergLayoutWriter.ManifestEntrySpec
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey").as("k"), col("l_partkey").as("pk"),
          floor(col("l_quantity")).cast("long").as("qty"))
      val tbl = new java.io.File("target/tmp-prof259")
      org.apache.commons.io.FileUtils.deleteQuietly(tbl)
      val dataDir = new java.io.File(tbl, "data"); dataDir.mkdirs()
      val pf = new java.io.File(dataDir, "slice-a.parquet")
      val nP = t("writeSingleParquet") { IcebergLayoutWriter.writeSingleParquet(
        li.filter(col("k") % 4 === 1).sort(col("k"), col("pk"), col("qty")), pf) }
      IcebergLayoutWriter.writeTable(tbl, Seq(ManifestEntrySpec(
        status = 1, content = 0, filePath = pf.getAbsolutePath,
        recordCount = nP, sizeBytes = pf.length(), sequenceNumber = 1L)))
      val of = new java.io.File(dataDir, "slice-b.orc")
      val nO = t("writeSingleOrc") { IcebergLayoutWriter.writeSingleOrc(
        li.filter(col("k") % 4 === 2).sort(col("k"), col("pk"), col("qty")), of) }
      t("commitAppend") { LayoutMaintenance.commitAppend(spark, tbl.getPath,
        Seq(ManifestEntrySpec(status = 1, content = 0,
          filePath = of.getAbsolutePath, recordCount = nO,
          sizeBytes = of.length(), fileFormat = "ORC"))) }
      t("orcPosRead-raw-count") {
        OrcPosRead.readWithPos(spark, Seq(of.getAbsolutePath)).count() }
      t("deleteWhere qty<10") { LayoutMaintenance.commitDeleteWhere(
        spark, tbl.getPath, col("qty") < 10) }
      t("deleteWhereDv pk%9") { LayoutMaintenance.commitDeleteWhereDv(
        spark, tbl.getPath, col("pk") % 9 === 0) }
      t("final MOR read+agg") { MorRead.readTable(spark, tbl.getPath)
        .groupBy((col("qty") % 7).as("band"))
        .agg(count(lit(1)).as("n_rows"), sum(col("pk")).as("sum_pk"),
          min(col("k")).as("min_k"))
        .orderBy(col("band")).count() }
    }
    spark.stop()
  }
}
