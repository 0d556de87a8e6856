package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Step-timing for the q260 fixture (three-format MOR scenario).
  * `runMain graft.tools.ProfileQ260 /root/testdata/sf0.1` */
object ProfileQ260 {
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
    val verbose = sys.env.contains("PROF_JOBS")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          jobStart.put(j.jobId, (j.time, j.stageInfos.map(_.numTasks).sum))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          if (verbose) Option(jobStart.get(j.jobId)).foreach { case (t0, nt) =>
            println(f"[job] ${j.jobId}%3d ${(j.time - t0) / 1e3}%.3f s  $nt%3d tasks")
          }
      })
    def t[T](label: String)(body: => T): T = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = body
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s" +
        f"  ${jobs.get() - j0}%3d jobs")
      r
    }
    (1 to 2).foreach { _ =>
      println("=== rep ===")
      import graft.sources.{IcebergLayoutWriter, LayoutMaintenance, MorRead}
      import graft.sources.IcebergLayoutWriter.ManifestEntrySpec
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey").as("k"), col("l_partkey").as("pk"),
          floor(col("l_quantity")).cast("long").as("qty"))
      val tbl = new java.io.File("target/tmp-prof260")
      org.apache.commons.io.FileUtils.deleteQuietly(tbl)
      val dataDir = new java.io.File(tbl, "data"); dataDir.mkdirs()
      def slice(mod: Int) = IcebergLayoutWriter.sortedSingle(
        li.filter(col("k") % 3 === mod), col("k"), col("pk"), col("qty"))
      val pf = new java.io.File(dataDir, "slice-p.parquet")
      val of = new java.io.File(dataDir, "slice-o.orc")
      val af = new java.io.File(dataDir, "slice-a.avro")
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val (nP, nO, nA) = t("write3 (parallel)") {
        val fP = Future(IcebergLayoutWriter.writeSingleParquet(slice(0), pf))
        val fO = Future(IcebergLayoutWriter.writeSingleOrc(slice(1), of))
        val fA = Future(IcebergLayoutWriter.writeSingleAvro(slice(2), af))
        (Await.result(fP, Duration.Inf), Await.result(fO, Duration.Inf),
          Await.result(fA, Duration.Inf))
      }
      IcebergLayoutWriter.writeTable(tbl, Seq(ManifestEntrySpec(
        status = 1, content = 0, filePath = pf.getAbsolutePath,
        recordCount = nP, sizeBytes = pf.length(), sequenceNumber = 1L)))
      t("commitOrc") { LayoutMaintenance.commitAppend(spark, tbl.getPath,
        Seq(ManifestEntrySpec(status = 1, content = 0,
          filePath = of.getAbsolutePath, recordCount = nO,
          sizeBytes = of.length(), fileFormat = "ORC"))) }
      t("commitAvro") { LayoutMaintenance.commitAppend(spark, tbl.getPath,
        Seq(ManifestEntrySpec(status = 1, content = 0,
          filePath = af.getAbsolutePath, recordCount = nA,
          sizeBytes = af.length(), fileFormat = "AVRO"))) }
      t("deleteWhere qty>=45") { LayoutMaintenance.commitDeleteWhere(
        spark, tbl.getPath, col("qty") >= 45) }
      t("commitMerge eq") {
        val dels = li.filter(col("k") % 11 === 5)
          .groupBy(col("k")).agg(min(col("pk")).as("pk"),
            min(col("qty")).as("qty"))
          .withColumn("op", lit("D"))
        LayoutMaintenance.commitMerge(spark, tbl.getPath, dels, Seq("k"), "op")
      }
      t("final MOR read+agg") { MorRead.readTable(spark, tbl.getPath)
        .groupBy((col("pk") % 8).as("band"))
        .agg(count(lit(1)).as("n_rows"), sum(col("qty")).as("sum_qty"),
          min(col("k")).as("min_k"))
        .orderBy(col("band")).count() }
    }
    spark.stop()
  }
}
