package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** A/B the per-char histogram dialects for the q187/q200 entropy score
  * (guide §1: measure both): regexp_replace vs translate, same host,
  * same JVM, plus value parity. `runMain graft.tools.ProfileEntropy <sfDir>`. */
object ProfileEntropy {
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("text").isNotNull)

    val alphabet: Seq[Char] = ('a' to 'z') :+ ' '
    def entropyVia(cnt: Char => Column): Column = {
      val counts = alphabet.map(c => cnt(c).cast("long"))
      val n = counts.reduce(_ + _)
      counts.map(x => when(x > 0L,
        x * floor(log(x.cast("double")) * lit(1e6)).cast("long"))
        .otherwise(lit(0L))).reduce(_ + _) + n
    }
    val viaRegex = entropyVia(c => length(col("text")) -
      length(regexp_replace(col("text"),
        java.util.regex.Pattern.quote(c.toString), "")))
    val viaTranslate = entropyVia(c => length(col("text")) -
      length(translate(col("text"), c.toString, "")))

    def time(label: String, c: Column): Long = {
      var last = 0L
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        last = docs.agg(sum(c)).head.getLong(0)
        println(f"[ent] $label rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      last
    }
    val a = time("regexp_replace", viaRegex)
    val b = time("translate     ", viaTranslate)
    println(s"[ent] parity: $a == $b -> ${a == b}")
    spark.stop()
  }
}
