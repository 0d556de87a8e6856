package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** The q112 pair-expansion guard: a pathological giant basket must expand
  * to the CAPPED pair count (bounded task memory), while ordinary baskets
  * expand exactly. */
class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("ordinary baskets expand to exactly n(n-1)/2 ordered pairs") {
    import spark.implicits._
    val baskets = Seq(
      (1L, Seq(10L, 20L, 30L)),         // 3 pairs
      (2L, Seq(5L, 7L)),                // 1 pair
      (3L, Seq(42L))                    // 0 pairs
    ).toDF("o", "ps")
    val pairs = GraphOps.basketPairs(baskets, "ps")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(pairs == Seq((5L, 7L), (10L, 20L), (10L, 30L), (20L, 30L)))
  }

  test("a 10k-item basket expands to the capped bound, not 50M pairs") {
    import spark.implicits._
    val cap = GraphOps.BasketCap
    val giant = Seq((1L, (1L to 10000L).toSeq)).toDF("o", "ps")
    val n = GraphOps.basketPairs(giant, "ps").count()
    assert(n == cap.toLong * (cap - 1) / 2,
      s"expected capped ${cap * (cap - 1) / 2} pairs, got $n")
    // and the kept pairs are over the SMALLEST item ids (deterministic cap)
    val maxId = GraphOps.basketPairs(giant, "ps")
      .agg(max(greatest(col("u"), col("v")))).head.getLong(0)
    assert(maxId == cap.toLong)
  }
}
