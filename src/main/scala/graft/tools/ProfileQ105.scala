package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Stage-by-stage timing for q105: `runMain graft.tools.ProfileQ105 <sfDir>`. */
object ProfileQ105 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(5000000L).selectExpr("sum(id)").collect()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $label%-18s ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    val dt = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), explode(TextOps.shingles(col("text"), 3)).as("w"))
      .select(col("doc_id"), TextOps.portableHash28(col("w")).as("h"))
      .distinct()
    time("dt")(dt.count())
    val df = dt.groupBy(col("h")).agg(count(lit(1)).as("dfc"))
    time("df")(df.count())
    val docToks = dt.join(broadcast(df), "h")
      .groupBy(col("doc_id"))
      .agg(expr("transform(sort_array(collect_list(struct(dfc, h))), x -> x.h)").as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("plen", expr("CAST(n - (n * 4 + 4) DIV 5 + 1 AS INT)"))
    time("docToks")(docToks.count())
    val prefix = docToks.select(col("doc_id"),
      explode(slice(col("toks"), lit(1), col("plen"))).as("h"))
    time("prefix")(prefix.count())
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    time("cand")(cand.count())
    val full = cand
      .join(docToks.select(col("doc_id").as("id_a"), col("toks").as("ta"), col("n").as("n_a")), Seq("id_a"))
      .join(docToks.select(col("doc_id").as("id_b"), col("toks").as("tb"), col("n").as("n_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .filter(col("inter") * 5 >= (col("n_a") + col("n_b") - col("inter")) * 4)
    time("full")(full.count())
    time("full-again")(full.count())
    spark.stop()
  }
}
