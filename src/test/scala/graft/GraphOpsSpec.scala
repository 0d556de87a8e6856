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

  // ---- labelPropagation: the two arms of the hybrid dispatch must be
  // bit-identical — the threshold is a memory decision, never a
  // semantics one (same contract PageRankSpec pins for partRanks)

  private def copurchase() = {
    implicit val sp = spark
    graft.operators.Rel.t("/root/testdata/sf0.001", "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      .cache()
  }

  private def seedOf(pairs: org.apache.spark.sql.DataFrame) =
    pairs.select(col("pk")).distinct()
      .select(col("pk"), pmod(col("pk"), lit(5L)).as("lbl"))
      .localCheckpoint()

  test("labelPropagation driver and distributed arms are bit-identical") {
    val pairs = copurchase()
    try {
      val seed = seedOf(pairs)
      // all three arms: edges-on-driver arrays (node + edge thresholds
      // permissive), per-round streaming driver arm (edge threshold 0),
      // and fully distributed (node threshold 0)
      val local = GraphOps.labelPropagation(pairs, seed, rounds = 2,
          localNodeThreshold = Long.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val driver = GraphOps.labelPropagation(pairs, seed, rounds = 2,
          localNodeThreshold = Long.MaxValue, localEdgeThreshold = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val dist = GraphOps.labelPropagation(pairs, seed, rounds = 2,
          localNodeThreshold = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(local.nonEmpty)
      assert(local.size == seed.count(), "one label per node")
      assert(driver == local, "streaming driver arm diverges from array arm")
      assert(dist == local, "distributed labels diverge from array arm")
    } finally pairs.unpersist(blocking = false)
  }

  test("labelPropagation labels change across rounds but stay in the seed vocabulary") {
    val pairs = copurchase()
    try {
      val seed = seedOf(pairs)
      val r2 = GraphOps.labelPropagation(pairs, seed, rounds = 2,
        localNodeThreshold = Long.MaxValue)
      val lbls = r2.select(col("lbl")).distinct()
        .collect().map(_.getLong(0)).toSet
      assert(lbls.subsetOf((0L to 4L).toSet), s"labels outside seed vocabulary: $lbls")
      // propagation must actually move SOME labels off the seed
      val changed = r2.join(seed.withColumnRenamed("lbl", "lbl0"), "pk")
        .filter(col("lbl") =!= col("lbl0")).count()
      assert(changed > 0, "two rounds changed nothing — vote identity broken?")
    } finally pairs.unpersist(blocking = false)
  }
}
