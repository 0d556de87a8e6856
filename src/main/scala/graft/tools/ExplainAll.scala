package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of each query (or one named
  * query) so plan regressions (lost pushdown, surprise shuffles, broken
  * broadcasts) are visible. Usage: runMain graft.tools.ExplainAll <sfDir> [q] */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val only = if (args.length > 1) Some(args(1)) else None
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_ == q._1))
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        try fn(spark, dir).explain("formatted")
        catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
