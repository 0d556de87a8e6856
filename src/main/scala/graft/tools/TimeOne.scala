package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a single SparkEntry query: `runMain graft.tools.TimeOne <sfDir> <q> [reps]`.
  * Same session config as Bench; prints per-rep wall seconds. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val q = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(5000000L).selectExpr("sum(id)").collect() // warmup
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      println(f"[timeone] $q rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
