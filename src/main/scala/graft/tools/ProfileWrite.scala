package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Breakdown of the single-file fixture write (guide §1): upstream
  * compute vs the coalesce(1) write job vs a parallel-compute
  * (localCheckpoint) variant — decides whether fixture writes should
  * materialize before the single-task sink.
  * `runMain graft.tools.ProfileWrite <sfDir>`. */
object ProfileWrite {
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
    val out = new java.io.File(sys.props("java.io.tmpdir"), "graft-profwrite")
    org.apache.commons.io.FileUtils.deleteQuietly(out); out.mkdirs()

    def df = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderkey") % 4 =!= 3)
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("prio"),
        floor(col("o_totalprice")).cast("long").as("price"))

    def time(label: String)(f: => Long): Unit =
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[w] $label rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s ($n)")
      }

    time("upstream count only") { df.count() }
    time("writeSingleParquet (coalesce 1)") {
      graft.sources.IcebergLayoutWriter.writeSingleParquet(df,
        new java.io.File(out, "a.parquet"))
    }
    time("localCheckpoint + writeSingleParquet") {
      val pinned = df.localCheckpoint()
      val n = graft.sources.IcebergLayoutWriter.writeSingleParquet(pinned,
        new java.io.File(out, "b.parquet"))
      pinned.unpersist(blocking = false)
      n
    }
    time("bare df.coalesce(1).write job") {
      val tmp = new java.io.File(out, "c.parquet")
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
      df.coalesce(1).write.mode("overwrite").parquet(tmp.getPath); 1L
    }
    spark.stop()
  }
}
