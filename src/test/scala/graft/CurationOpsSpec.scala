package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.CurationOps

/** The public curation API ([[graft.operators.CurationOps]]) behaves like
  * the oracle-gated queries it powers: span dedup catches shared regions
  * between non-duplicate docs, repetition scores match hand computation,
  * DSIR ratios rank target-like docs higher, temperature sampling
  * flattens group shares. */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("spanDuplicates: shared aligned regions across docs are marked, unique text is not") {
    import spark.implicits._
    val shared = ("the quick brown fox jumps over the lazy dog again and " * 3).take(120)
    val docs = Seq(
      (1L, shared + " tail one unique......................."),
      (2L, shared + " something else entirely down here....."),
      (3L, "completely different text with no overlap at all " * 4))
      .toDF("id", "text")
    val out = CurationOps.spanDuplicates(docs, "id", "text")
      .select("id", "is_dup").as[(Long, Boolean)].collect()
    val dupsByDoc = out.groupBy(_._1).view.mapValues(_.count(_._2)).toMap
    assert(dupsByDoc.getOrElse(2L, 0) >= 1,
      "doc 2's copied prefix windows must be marked duplicated")
    assert(dupsByDoc.getOrElse(1L, 0) == 0, "first occurrence keeps its spans")
    assert(dupsByDoc.getOrElse(3L, 0) == 0, "unique text has no dup spans")
  }

  test("repetitionScores match a hand computation") {
    import spark.implicits._
    val docs = Seq((1L, "a a a b"), (2L, "w x y z")).toDF("id", "text")
    val out = CurationOps.repetitionScores(docs, "id", "text")
      .select("id", "dupw_bp", "topbg_bp").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1: 4 words, 2 distinct -> dupw = 10000*2/4 = 5000;
    //        bigrams (a a)x2, (a b) -> top 2 of 3 -> 6666
    assert(out(1L) == ((5000L, 6666L)))
    // doc 2: all distinct -> 0; every bigram unique -> 10000*1/3 = 3333
    assert(out(2L) == ((0L, 3333L)))
  }

  test("dsirScores rank target-domain docs above the rest") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("text").isNotNull)
    val scored = CurationOps.dsirScores(docs.select("doc_id", "lang", "text"),
        "doc_id", "text", isTarget = col("lang") === "en")
      .join(docs.select("doc_id", "lang"), "doc_id")
    val byLang = scored.groupBy("lang").agg(avg(col("ratio")).as("m"))
      .as[(String, Double)].collect().toMap
    assert(byLang("en") > byLang.filterNot(_._1 == "en").values.max,
      s"en must score highest: $byLang")
    scored.select("ratio").as[Double].collect()
      .foreach(r => assert(r > 0 && r <= 1.0))
  }

  test("temperatureSample flattens group shares (head shrinks, tail grows)") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("text").isNotNull).select("doc_id", "lang")
    val kept = CurationOps.temperatureSample(docs, "doc_id", "lang", 300L)
    val agg = kept.groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(when(col("keep"), 1L).otherwise(0L)).as("k"))
      .as[(String, Long, Long)].collect()
    val (totN, totK) = (agg.map(_._2).sum.toDouble, agg.map(_._3).sum.toDouble)
    val head = agg.maxBy(_._2); val tail = agg.minBy(_._2)
    assert(head._3 / totK < head._2 / totN, "head group share must shrink")
    assert(tail._3 / totK > tail._2 / totN, "tail group share must grow")
  }
}
