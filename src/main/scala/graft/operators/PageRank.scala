package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Integer-quantized PageRank over the part co-purchase graph (q91's
  * engine), with the same hybrid dispatch as
  * [[ClusterOps.connectedComponents]]: the rank vector — one long per
  * graph node — lives on the driver only while the node count is below a
  * threshold; above it, ranks stay a distributed DataFrame that is
  * localCheckpointed per round (lineage truncated, no re-run of round k-1
  * inside round k). Both paths compute the identical integer arithmetic
  * and therefore bit-identical ranks.
  *
  * Quantization: ranks in micro-units (1e6 = 1.0); per-round contribution
  * c(p) = rank(p) div deg(p); new rank = 150000 + (85 * in_sum) div 100
  * (damping d = 0.85). All integer ops — associative, engine-portable.
  *
  * The co-purchase edge multiset is QUADRATIC in basket size and never
  * materialized: within an order o, part p receives S_o - c(p) where
  * S_o = sum of the order's contributions, so each round is ONE pass over
  * the linear (order, part) relation. In the driver path the contribution
  * table is broadcast and the per-order window inserts one o-exchange per
  * round over the cached relation; the distributed path additionally pays
  * one p-shuffle (rank join) per round — the price of not holding the
  * rank vector in driver heap at 100 TB.
  */
object PageRank {

  /** @param op distinct (order, part) pairs, columns `o` and `p`; needs no
    *           particular partitioning — the cluster arms' windows insert
    *           their own o-exchange when they run, and this method caches
    *           the relation itself for the (1 + rounds) cluster-arm scans
    * @param localNodeThreshold max graph nodes for the driver-map path;
    *           one boxed (Long, Long) per node on collect, so the default
    *           1M nodes is ~100 MB driver heap — same sizing discipline as
    *           [[ClusterOps.connectedComponents]]
    * @param localEdgeThreshold max (order, part) PAIRS for the fully
    *           local path: the LIMIT-bounded dispatch probe (the kmFit
    *           pattern — ONE action, no count() job, no cache
    *           materialization) IS the local arm's input when everything
    *           fits under the cap; rows land in two primitive long arrays
    *           (~32 MB at 2M pairs, no boxed tuples). Past the cap, the
    *           existing node-count dispatch decides, unchanged — the
    *           100 TB paths are exactly what they were, minus the count.
    * @return (part, rank) for ALL nodes with deg > 0, unordered */
  def partRanks(op: DataFrame, rounds: Int = 3,
      localNodeThreshold: Long = 1000000L,
      localEdgeThreshold: Long = 2000000L): DataFrame = {
    implicit val sp: SparkSession = op.sparkSession
    if (localEdgeThreshold > 0L) {
      val cap = math.min(localEdgeThreshold, (Int.MaxValue - 8).toLong).toInt
      val probe = op.select(col("o"), col("p")).limit(cap + 1).collect()
      if (probe.length <= cap) {
        val os = new Array[Long](probe.length)
        val ps = new Array[Long](probe.length)
        var i = 0
        while (i < probe.length) {
          os(i) = probe(i).getLong(0); ps(i) = probe(i).getLong(1); i += 1
        }
        return localRanks(os, ps, rounds)
      }
    }
    // past the cap: the cluster arms scan op (1 + rounds) times — cache it
    // here (not in the caller) so the local arm above never pays for a
    // cache it won't read
    val opC = op.cache()
    try {
      val wo = Window.partitionBy(col("o"))
      // deg(p) = sum over p's orders of (basket size - 1); parts that only
      // ever appear alone have no edges and are excluded (matches the edge-
      // list node set, and keeps c = rank div deg well-defined)
      val degDf = opC.withColumn("sz", count(lit(1)).over(wo))
        .groupBy(col("p")).agg(sum(col("sz") - 1).as("deg"))
        .filter(col("deg") > 0)
        .localCheckpoint()
      val nNodes = degDf.count()
      // both arms fully consume opC before returning (driverRanks collects
      // per round; distributedRanks localCheckpoints per round)
      if (nNodes <= localNodeThreshold) driverRanks(opC, degDf, wo, rounds)
      else distributedRanks(opC, degDf, wo, rounds)
    } finally opC.unpersist(blocking = false)
  }

  /** The fully-local arm: the SAME integer arithmetic as the cluster
    * rounds (PageRankSpec pins all three paths bit-identical), computed
    * over the probed pair list (two primitive arrays, one entry per
    * (order, part) pair). S_o sums c over the order's deg>0 parts —
    * exactly what the cluster round's inner join + window produces — and
    * in(p) folds (S_o - c(p)) over p's orders. */
  private def localRanks(os: Array[Long], ps: Array[Long], rounds: Int)
      (implicit sp: SparkSession): DataFrame = {
    import sp.implicits._
    // group pairs by order once; baskets are the per-round unit
    val baskets: Array[Array[Long]] = {
      val m = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuilder.ofLong]()
      var i = 0
      while (i < os.length) {
        m.computeIfAbsent(os(i), _ => new scala.collection.mutable.ArrayBuilder.ofLong) += ps(i)
        i += 1
      }
      val out = new Array[Array[Long]](m.size)
      val it = m.values().iterator(); var j = 0
      while (it.hasNext) { out(j) = it.next().result(); j += 1 }
      out
    }
    // deg(p) = Σ over p's orders of (basket size - 1); deg 0 excluded
    val deg = new java.util.HashMap[Long, Long]()
    baskets.foreach { b =>
      val d = (b.length - 1).toLong
      if (d > 0) b.foreach(p => deg.merge(p, d, java.lang.Long.sum))
    }
    // parts only ever alone: merge never ran for them, nothing to drop
    var rank = new java.util.HashMap[Long, Long](deg.size)
    deg.keySet().forEach(p => rank.put(p, 1000000L))
    for (_ <- 1 to rounds) {
      val in = new java.util.HashMap[Long, Long](deg.size)
      baskets.foreach { b =>
        // S_o over the order's deg>0 parts (the inner-join semantics)
        var so = 0L
        var k = 0
        while (k < b.length) {
          // deg-0 parts (only ever alone in their basket) have no entry:
          // skip them explicitly — the inner-join semantics
          val d = deg.getOrDefault(b(k), 0L)
          if (d != 0L) so += rank.get(b(k)) / d
          k += 1
        }
        k = 0
        while (k < b.length) {
          val p = b(k)
          val d = deg.getOrDefault(p, 0L)
          if (d != 0L) in.merge(p, so - rank.get(p) / d, java.lang.Long.sum)
          k += 1
        }
      }
      val next = new java.util.HashMap[Long, Long](deg.size)
      deg.keySet().forEach { p =>
        val i = in.getOrDefault(p, 0L)
        next.put(p, 150000L + 85L * i / 100L)
      }
      rank = next
    }
    val out = Seq.newBuilder[(Long, Long)]
    rank.forEach((p, r) => out += ((p, r)))
    out.result().toDF("part", "rank")
  }

  private def driverRanks(op: DataFrame, degDf: DataFrame,
      wo: org.apache.spark.sql.expressions.WindowSpec, rounds: Int)
      (implicit sp: SparkSession): DataFrame = {
    import sp.implicits._
    val deg = degDf.as[(Long, Long)].collect()
    var rank: Map[Long, Long] = deg.iterator.map { case (n, _) => n -> 1000000L }.toMap
    for (_ <- 1 to rounds) {
      // per-part contribution precomputed driver-side: the cluster-side
      // round is broadcast probe + window sum + tiny partial-agg'd groupBy
      val cdf = broadcast(deg.iterator.map { case (n, d) => (n, rank(n) / d) }
        .toSeq.toDF("p", "c"))
      val in = op.join(cdf, Seq("p"))
        .withColumn("so", sum(col("c")).over(wo))
        .groupBy(col("p")).agg(sum(col("so") - col("c")).as("in_sum"))
        .as[(Long, Long)].collect().toMap
      rank = deg.iterator.map { case (n, _) =>
        n -> (150000L + 85L * in.getOrElse(n, 0L) / 100L)
      }.toMap
    }
    rank.toSeq.toDF("part", "rank")
  }

  private def distributedRanks(op: DataFrame, degDf: DataFrame,
      wo: org.apache.spark.sql.expressions.WindowSpec, rounds: Int): DataFrame = {
    var rank = degDf.select(col("p"), lit(1000000L).as("rank")).localCheckpoint()
    for (_ <- 1 to rounds) {
      // c = rank div deg (integer division, matching the driver path's
      // Long `/`); both operands are exact longs
      val cdf = rank.join(degDf, Seq("p"))
        .select(col("p"), expr("rank div deg").as("c"))
      val in = op.join(cdf, Seq("p"))
        .withColumn("so", sum(col("c")).over(wo))
        .groupBy(col("p")).agg(sum(col("so") - col("c")).as("in_sum"))
      // left join keeps isolated-in-this-round nodes at in_sum = 0, the
      // driver path's getOrElse(n, 0L)
      rank = degDf.join(in, Seq("p"), "left")
        .select(col("p"),
          (lit(150000L) + expr("(85 * coalesce(in_sum, 0L)) div 100")).as("rank"))
        .localCheckpoint()
    }
    rank.select(col("p").as("part"), col("rank"))
  }
}
