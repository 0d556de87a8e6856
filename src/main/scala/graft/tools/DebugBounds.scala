package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: do first/second connector appends record manifest bounds? */
object DebugBounds {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val t = new java.io.File("target/tmp-debug-bounds")
    org.apache.commons.io.FileUtils.deleteQuietly(t)
    Seq((1L, 10L), (2L, 20L)).toDF("k", "price")
      .write.format("graft-iceberg")
      .option("write.schema", "k LONG, price LONG")
      .option("pushdown.fields", "price:2:long")
      .mode("append").save(t.getPath)
    Seq((3L, 30L)).toDF("k", "price").write.format("graft-iceberg")
      .option("pushdown.fields", "price:2:long")
      .mode("append").save(t.getPath)
    graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, t.getPath, "t",
        Seq((2, "price", org.apache.spark.sql.types.LongType)))
      .select("file_path", "lo_price", "hi_price").collect()
      .foreach(println)
    spark.stop()
  }
}
