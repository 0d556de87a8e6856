package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Queries7

/** Behavioral tests for the round-5 batch-3 operators — algorithm
  * invariants on top of the oracle gate's value parity: the CMS one-sided
  * error law, linkage recall on the synthesized twins, lift ordering. */
class Queries7Spec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("tpch q5 shape: one row per ASIA nation, deterministic revenue order") {
    val rows = Queries7.all("q100_local_supplier_volume")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 5, "at most the 5 ASIA nations")
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
    val revs = rows.map(_.getDouble(1))
    assert(revs.forall(_ > 0))
    assert(revs.sameElements(revs.sorted(Ordering[Double].reverse)))
  }

  test("tpch q10 shape: top-20 by exact-integer revenue, descending") {
    val rows = Queries7.all("q101_returned_item_losers")(spark, dir).collect()
    assert(rows.length == 20)
    val revs = rows.map(_.getDouble(4))
    assert(revs.sameElements(revs.sorted(Ordering[Double].reverse)))
    // exact ten-thousandths: every revenue is an integer / 10000
    revs.foreach(r => assert((r * 10000).round / 10000.0 == r))
  }

  test("fuzzy linkage: every synthesized twin is recalled at distance 1") {
    import spark.implicits._
    val rows = Queries7.all("q102_fuzzy_linkage")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val nTwins = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 131 === 0)
      // a twin is only findable if the doc has a 13th character to drop
      .filter(length(col("text")) >= 13).count()
    val twinPairs = rows.filter(_._4 == 1L)
    assert(twinPairs.length.toLong == nTwins,
      s"expected $nTwins twin pairs, found ${twinPairs.length}")
    twinPairs.foreach { case (a, b, d, _) =>
      assert(b == a + 1000000L)
      assert(d == 1L, s"dropping one char must be distance 1, got $d for ($a,$b)")
    }
    rows.foreach { case (a, b, d, _) => assert(a < b && d <= 2) }
  }

  test("count-min: one-sided law (est >= exact) and top-10 by exact count") {
    import spark.implicits._
    val rows = Queries7.all("q103_countmin_sketch")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 10)
    rows.foreach { case (_, exact, est, over) =>
      assert(est >= exact, "CMS can only overcount")
      assert(over == est - exact)
    }
    val exacts = rows.map(_._2)
    assert(exacts.sameElements(exacts.sorted(Ordering[Long].reverse)))
  }

  test("pmi co-occurrence: pairs canonical, lift consistent with counts") {
    import spark.implicits._
    val rows = Queries7.all("q104_pmi_cooccurrence")(spark, dir)
      .as[(String, String, Long, Double)].collect()
    assert(rows.nonEmpty)
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    rows.foreach { case (w1, w2, c12, lift) =>
      assert(w1 < w2, "pairs must be canonical (w1 < w2)")
      assert(c12 >= 5)
      assert(lift > 0)
      // c12 <= min(c1,c2) <= N, so lift = c12*N/(c1*c2) >= c12/N... just
      // sanity-bound it by reconstruction: lift * c1 * c2 == c12 * N is the
      // oracle's job; here check the ranking is descending
    }
    val lifts = rows.map(_._4)
    assert(lifts.sameElements(lifts.sorted(Ordering[Double].reverse)))
    assert(n > 0)
  }
}
