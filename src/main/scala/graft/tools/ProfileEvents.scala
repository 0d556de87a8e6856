package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution harness for the r8 q131/q133 regression: times the events
  * scan with each ts_us derivation dialect and the two query bodies'
  * component stages, warm. `runMain graft.tools.ProfileEvents <sfDir>`. */
object ProfileEvents {
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
    implicit val s: SparkSession = spark
    spark.range(5000000L).selectExpr("sum(id)").collect()

    def time(label: String)(f: => Long): Unit = {
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[prof] $label rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s ($n)")
      }
    }

    val raw = spark.read.parquet(s"$dir/events.parquet")
    println("ts type: " + raw.schema("ts").dataType)

    time("scan-count-only") { raw.count() }
    time("sum(value) no ts") {
      raw.agg(sum(col("value"))).collect(); 1L }
    time("timestampdiff derivation") {
      raw.withColumn("ts_us", expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"))
        .agg(sum(expr("ts_us div 86400000000"))).collect(); 1L }
    time("date_diff-day direct") {
      raw.agg(sum(expr(
        "datediff(cast(ts as date), DATE'1970-01-01')"))).collect(); 1L }

    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val rawLtz = spark.read.parquet(s"$dir/events.parquet")
    println("ts type with inferNTZ off: " + rawLtz.schema("ts").dataType)
    time("unix_micros on LTZ (inferNTZ off)") {
      rawLtz.withColumn("ts_us", expr("unix_micros(ts)"))
        .agg(sum(expr("ts_us div 86400000000"))).collect(); 1L }
    // value parity with the NTZ derivation
    val a = raw.agg(sum(expr(
      "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)" +
        " % 1000000007")))
      .head.getLong(0)
    val b = rawLtz.agg(sum(expr("unix_micros(ts) % 1000000007"))).head.getLong(0)
    println(s"parity: ntz=$a ltz=$b equal=${a == b}")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")

    // q131 component stages
    val ev = graft.operators.Rel.events(dir)
    time("q131 body") {
      val maxDay = ev.agg(max(expr("ts_us div 86400000000")).as("d0"))
      ev.select(col("user_id"), expr("ts_us div 86400000000").as("day"),
          floor(col("value") * 1000000).cast("long").as("vm"))
        .crossJoin(broadcast(maxDay))
        .withColumn("age", col("d0") - col("day"))
        .withColumn("w", when(col("age") <= 20,
          expr("shiftleft(CAST(1 AS BIGINT), CAST(20 - age AS INT))")).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("vm") * col("w")).as("score_scaled"))
        .orderBy(desc("score_scaled"), col("user_id"))
        .limit(50).count()
    }
    time("q131 groupBy only (precomputed day)") {
      ev.select(col("user_id"), expr("ts_us div 86400000000").as("day"),
          floor(col("value") * 1000000).cast("long").as("vm"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("vm")).as("sv")).count()
    }
    spark.stop()
  }
}
