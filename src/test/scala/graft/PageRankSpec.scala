package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{PageRank, Rel}

/** The two PageRank execution paths — driver-localized rank vector vs
  * distributed localCheckpointed rank DataFrame — must be bit-identical:
  * the threshold dispatch is a memory decision, never a semantics one
  * (same contract ClusterOpsSpec pins for connectedComponents). */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  private def orderParts() = {
    implicit val sp = spark
    Rel.t(dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      .repartition(col("o")).sortWithinPartitions(col("o"))
      .cache()
  }

  test("driver and distributed paths produce bit-identical ranks") {
    val op = orderParts()
    try {
      // threshold above any node count -> driver path; 0 -> distributed
      // (edge threshold 0 keeps the fully-local arm out of both)
      val driver = PageRank.partRanks(op, localNodeThreshold = Long.MaxValue,
          localEdgeThreshold = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val dist = PageRank.partRanks(op, localNodeThreshold = 0L,
          localEdgeThreshold = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(driver.nonEmpty)
      assert(dist == driver, "distributed rank vector diverges from driver path")
    } finally op.unpersist(blocking = false)
  }

  test("fully-local arm is bit-identical to the driver-map path") {
    val op = orderParts()
    try {
      val local = PageRank.partRanks(op) // default edge threshold: local
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val driver = PageRank.partRanks(op, localNodeThreshold = Long.MaxValue,
          localEdgeThreshold = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(local.nonEmpty)
      assert(local == driver, "local rank vector diverges from driver path")
    } finally op.unpersist(blocking = false)
  }

  test("q91 top-20 is stable under the forced-distributed path") {
    val op = orderParts()
    try {
      val driverTop = PageRank.partRanks(op, localNodeThreshold = Long.MaxValue,
          localEdgeThreshold = 0L)
        .orderBy(col("rank").desc, col("part")).limit(20)
        .collect().map(_.toString).toSeq
      val distTop = PageRank.partRanks(op, localNodeThreshold = 0L,
          localEdgeThreshold = 0L)
        .orderBy(col("rank").desc, col("part")).limit(20)
        .collect().map(_.toString).toSeq
      assert(driverTop.size == 20)
      assert(distTop == driverTop)
    } finally op.unpersist(blocking = false)
  }
}
