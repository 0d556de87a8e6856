package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for q22/q28 hotspots. */
object Profile22 {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val docs = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val corpus = docs.union(docs.select((col("doc_id") + 100000).as("doc_id"),
      expr("substring(text, instr(text, ' ') + 1)").as("text")))
    val th = corpus.select(col("doc_id"), explode(array_distinct(split(col("text"), lit(" ")))).as("tok"))
      .withColumn("h", expr("CAST(conv(substring(md5(tok), 1, 7), 16, 10) AS BIGINT)"))
    time("tokenHashes count")(println(th.count()))
    val P = 2147483647L
    val A = Seq(1000003L, 1999993L, 999331L, 1112111L)
    val B = Seq(12345L, 54321L, 7777L, 424242L)
    val aggs = A.indices.map(j => min((col("h") * A(j) + B(j)) % P).as(s"mh$j"))
    val sigs = th.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    time("sigs count")(println(sigs.count()))
    val bands = sigs.select(col("doc_id"), lit(0).as("band"),
        concat_ws("_", col("mh0"), col("mh1")).as("bkey"))
      .union(sigs.select(col("doc_id"), lit(1).as("band"),
        concat_ws("_", col("mh2"), col("mh3")).as("bkey")))
    time("bands count")(println(bands.count()))
    time("bucket sizes")(bands.groupBy("band", "bkey").count()
      .orderBy(desc("count")).limit(5).show(false))
    val a = bands.select(col("band"), col("bkey"), col("doc_id").as("doc_a"))
    val b = bands.select(col("band"), col("bkey"), col("doc_id").as("doc_b"))
    val pairs = a.join(b, Seq("band", "bkey")).filter(col("doc_a") < col("doc_b"))
    time("join count")(println(pairs.count()))
    time("distinct count")(println(pairs.select("doc_a", "doc_b").distinct().count()))
    spark.stop()
  }
}
