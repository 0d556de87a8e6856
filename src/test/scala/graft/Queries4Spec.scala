package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Queries4

/** Behavioral tests for the round-4 operator families (the oracle gate
  * covers value parity; these pin down SEMANTICS on controlled inputs). */
class Queries4Spec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("chunking: stride-aligned starts, window-capped lengths, full coverage") {
    import spark.implicits._
    val rows = Queries4.all("q68_chunking")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, chunkId, start, n, _) =>
      assert(start == chunkId * 24 + 1, "start must be stride-aligned")
      assert(n >= 1 && n <= 32, s"chunk length $n outside (0, W]")
    }
    // per doc: contiguous chunk ids from 0; the last start lands within the
    // final stride (so the tail chunk is always clipped below the stride),
    // which pins the doc's token count as last.start + last.len - 1; every
    // chunk's length must then be exactly min(W, n - start + 1)
    rows.groupBy(_._1).foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong))
      val last = sorted.last
      assert(last._4 <= 24, s"tail chunk of doc $doc longer than the stride")
      val nToks = last._3 + last._4 - 1
      sorted.foreach { c =>
        assert(c._4 == math.min(32L, nToks - c._3 + 1), s"chunk length wrong for doc $doc")
      }
    }
  }

  test("centroid outliers: top-3 per label, distances consistent and ranked") {
    import spark.implicits._
    val rows = Queries4.all("q69_centroid_outliers")(spark, dir)
      .as[(Int, Long, Long, Double)].collect()
    assert(rows.map(_._1).distinct.length == 10)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L))
      val byRank = rs.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        "distance must be non-increasing in rank")
      assert(rs.forall(_._4 >= 0))
    }
  }

  test("IQR outliers: only the synthesized 10x orders breach the fence") {
    import spark.implicits._
    val rows = Queries4.all("q70_iqr_outliers")(spark, dir)
      .as[(String, Double, Double, Double, Long, Double)].collect()
    assert(rows.length == 5)
    rows.foreach { case (_, p25, p75, hi, nOut, maxOut) =>
      assert(math.abs(hi - (p75 + 1.5 * (p75 - p25))) < 1e-9)
      if (nOut > 0) assert(maxOut > hi) else assert(maxOut == 0.0)
    }
    // the deterministic heavy tail exists and is found somewhere
    assert(rows.map(_._5).sum > 0, "synthesized outliers not detected")
  }

  test("funnel timing: percentile chain is monotone within each cohort") {
    import spark.implicits._
    val rows = Queries4.all("q71_funnel_timing")(spark, dir)
      .as[(Long, Long, Long, Double, Double, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq == Seq(0L, 1L, 2L))
    rows.foreach { case (_, n, mn, med, p90, mx) =>
      assert(n > 0 && mn >= 0)
      assert(mn <= med && med <= p90 && p90 <= mx)
    }
  }

  test("anomaly z-score: flags only |z| > 3 with enough history, and matches a replay") {
    import spark.implicits._
    val rows = Queries4.all("q72_anomaly_zscore")(spark, dir)
      .as[(Long, String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, _, nPrior, z) =>
      assert(nPrior >= 30)
      assert(math.abs(z) > 3)
    }
    // replay one flagged event's statistics sequentially from the raw table
    val (eid, etype, v, nPrior, z) = rows.head
    implicit val s = spark
    val hist = graft.operators.Rel.events(dir)
      .filter(col("event_type") === etype)
      .select(col("ts_us"), col("event_id"), floor(col("value") * 1000).cast("long").as("v"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val prior = hist.takeWhile(_._2 != eid).map(_._3)
    assert(prior.length == nPrior)
    val mean = prior.sum.toDouble / prior.length
    val varr = (prior.map(x => x.toDouble * x).sum - prior.sum.toDouble * prior.sum / prior.length) /
      (prior.length - 1)
    val zRef = (v - mean) / math.sqrt(varr)
    assert(math.abs(z - zRef) < 1e-6, s"z=$z replay=$zRef")
  }
}
