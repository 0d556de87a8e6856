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
  * table is broadcast, so the o-partitioned cached relation needs no
  * exchange for the per-order window; the distributed path pays one
  * p-shuffle (rank join) and one o-shuffle (window) per round — the price
  * of not holding the rank vector in driver heap at 100 TB.
  */
object PageRank {

  /** @param op distinct (order, part) pairs, columns `o` and `p`, already
    *           repartitioned+sorted by `o` and cached by the caller
    * @param localNodeThreshold max graph nodes for the driver-map path;
    *           one boxed (Long, Long) per node on collect, so the default
    *           1M nodes is ~100 MB driver heap — same sizing discipline as
    *           [[ClusterOps.connectedComponents]]
    * @param localEdgeThreshold max (order, part) PAIRS for the fully
    *           local path: ONE collect of the pair list replaces the
    *           (1 + rounds) cluster jobs of the driver-map path — at 2M
    *           pairs that is a ~50 MB transient, and each in-memory
    *           round is a linear pass (r16: q91's three broadcast-join-
    *           window rounds cost ~0.65 s each at sf0.1 for arithmetic
    *           a single thread does in ~10 ms). Past it, the existing
    *           node-count dispatch decides, unchanged — the 100 TB
    *           paths are exactly what they were.
    * @return (part, rank) for ALL nodes with deg > 0, unordered */
  def partRanks(op: DataFrame, rounds: Int = 3,
      localNodeThreshold: Long = 1000000L,
      localEdgeThreshold: Long = 2000000L): DataFrame = {
    implicit val sp: SparkSession = op.sparkSession
    if (op.count() <= localEdgeThreshold) return localRanks(op, rounds)
    val wo = Window.partitionBy(col("o"))
    // deg(p) = sum over p's orders of (basket size - 1); parts that only
    // ever appear alone have no edges and are excluded (matches the edge-
    // list node set, and keeps c = rank div deg well-defined)
    val degDf = op.withColumn("sz", count(lit(1)).over(wo))
      .groupBy(col("p")).agg(sum(col("sz") - 1).as("deg"))
      .filter(col("deg") > 0)
      .localCheckpoint()
    val nNodes = degDf.count()
    if (nNodes <= localNodeThreshold) driverRanks(op, degDf, wo, rounds)
    else distributedRanks(op, degDf, wo, rounds)
  }

  /** The fully-local arm: the SAME integer arithmetic as the cluster
    * rounds (PageRankSpec pins all three paths bit-identical), computed
    * over the collected pair list. S_o sums c over the order's deg>0
    * parts — exactly what the cluster round's inner join + window
    * produces — and in(p) folds (S_o - c(p)) over p's orders. */
  private def localRanks(op: DataFrame, rounds: Int)
      (implicit sp: SparkSession): DataFrame = {
    import sp.implicits._
    val pairs = op.select(col("o"), col("p")).as[(Long, Long)].collect()
    // group pairs by order once; baskets are the per-round unit
    val baskets: Array[Array[Long]] = {
      val m = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuilder.ofLong]()
      pairs.foreach { case (o, p) =>
        m.computeIfAbsent(o, _ => new scala.collection.mutable.ArrayBuilder.ofLong) += p
      }
      val out = new Array[Array[Long]](m.size)
      val it = m.values().iterator(); var i = 0
      while (it.hasNext) { out(i) = it.next().result(); i += 1 }
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
          val d = deg.get(b(k))
          if (d != 0L) so += rank.get(b(k)) / d
          k += 1
        }
        k = 0
        while (k < b.length) {
          val p = b(k)
          val d = deg.get(p)
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
