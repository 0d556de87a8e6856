package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone check (fresh JVM => fresh session) that
  * `spark.sql.extensions=graft.GraftExtensions` injects poly_hash without
  * any manual registration. Exits nonzero on failure. */
object ExtensionsCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val v = spark.sql("SELECT poly_hash('ab') AS h").collect()(0).getLong(0)
    val expected = ('a'.toLong * 131 + 'b') % 1000000007L
    println(s"poly_hash('ab') = $v (expected $expected)")
    spark.stop()
    if (v != expected) sys.exit(1)
    println("extensions check OK")
  }
}
