package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Source/sink format breadth: query results round-trip through parquet,
  * orc, json, and csv with values preserved (schema via explicit read
  * schema for the text formats). */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("query result round-trips through parquet/orc/json/csv") {
    val result = SparkEntry.queries("q6_revenue_by_region")(spark, dir)
    val expected = result.collect().map(_.toString).sorted.toSeq
    val base = TestTmp.dir("graft_fmt")
    try {
      for (fmt <- Seq("parquet", "orc", "json", "csv")) {
        val path = s"$base/$fmt"
        val writer = result.write.mode("overwrite")
        (if (fmt == "csv") writer.option("header", "true") else writer).format(fmt).save(path)
        val reader = spark.read.schema(result.schema)
        val back = (if (fmt == "csv") reader.option("header", "true") else reader)
          .format(fmt).load(path)
        assert(back.collect().map(_.toString).sorted.toSeq == expected, s"format $fmt")
      }
    } finally {
      def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
      rm(new java.io.File(base))
    }
  }

  test("partitioned + sorted sink preserves metrics-report content") {
    import spark.implicits._
    val files = spark.createDataset(Seq(
      graft.model.FileEntry("t1", 0, "p1", 1000L),
      graft.model.FileEntry("t2", 0, "p1", 2000L)))
    val mc = spark.createDataset(Seq(("t1", 1L), ("t2", 1L)))
    val wide = graft.metrics.MetricsCalculator.computeMetricsWide(files, mc)
    val base = TestTmp.dir("graft_sink")
    try {
      wide.write.mode("overwrite").partitionBy("table").parquet(base)
      val back = spark.read.parquet(base)
      assert(back.count() == 2)
      assert(back.select("table").as[String].collect().sorted.toSeq == Seq("t1", "t2"))
    } finally {
      def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
      rm(new java.io.File(base))
    }
  }
}
