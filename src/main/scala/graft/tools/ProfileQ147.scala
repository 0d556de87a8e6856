package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage breakdown of q147 (rangeCumsum constant): where do the ~700 ms
  * go? `runMain graft.tools.ProfileQ147 <sfDir>`. */
object ProfileQ147 {
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
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[prof] $label min=${ts.map(_._1).min}%.3f s (reps ${ts.map(t => f"${t._1}%.2f").mkString(",")}) n=${ts.head._2}")
    }

    def hist = graft.operators.Rel.t(dir, "lineitem")
      .filter(col("l_returnflag").isin("R", "A"))
      .select(floor(col("l_extendedprice") * 100).cast("long").as("cents"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("r"),
        when(col("l_returnflag") === "A", 1L).otherwise(0L).as("a"))
      .groupBy(col("cents"))
      .agg(sum(col("r")).as("c1"), sum(col("a")).as("c2"))

    time("1 hist only") { hist.count() }

    val bkt = graft.operators.StatOps.octaveBucket16(col("cents"))
    time("2 hist+bucket+window1") {
      val w = Window.partitionBy(col("__bkt")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist.withColumn("__bkt", bkt)
        .withColumn("l1", sum(col("c1")).over(w))
        .withColumn("l2", sum(col("c2")).over(w))
        .agg(max(col("l1"))).collect(); 1L
    }

    time("3 full rangeCumsum+agg") {
      graft.operators.StatOps.rangeCumsum(hist, Nil, Seq("cents"),
          Seq("cum1" -> col("c1"), "cum2" -> col("c2")), bkt)
        .agg(max(col("cum1_total")), max(col("cum2_total"))).collect(); 1L
    }
    spark.stop()
  }
}
