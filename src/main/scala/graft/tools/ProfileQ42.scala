package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{ClusterOps, DedupCorpus, TextOps}

/** Scratch profiler for the q42 dedup-clusters pipeline stages. */
object ProfileQ42 {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    implicit val spark: SparkSession = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(5000000L).selectExpr("sum(id)").collect()
    try graft.SparkEntry.queries("q16_lang_profile")(spark, dir).count()
    catch { case _: Throwable => () }

    // replicate the bench order around q42
    for (q <- Seq("q40_simhash_neardup", "q41_tfidf", "q42_dedup_clusters",
                  "q42_dedup_clusters", "q43_stratified_sample")) {
      time(q)(graft.SparkEntry.queries(q)(spark, dir).count())
    }
    spark.stop()
  }
}
