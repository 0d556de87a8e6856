package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Basket → co-occurrence pair expansion with a hard per-basket cap.
  *
  * The i<j combination expansion over a basket of n items emits n(n-1)/2
  * structs INSIDE ONE ROW before the explode — quadratic in basket size,
  * inside a single task. On TPC-H (~4 items/basket, max 7) that is
  * nothing; one pathological hub order (a 10k-item basket in a real
  * co-purchase log) is 50M structs ≈ GBs in a single task buffer — an
  * OOM no amount of partitioning fixes, because the blowup is per-ROW.
  *
  * The guard: expand only the first [[BasketCap]] items of the (sorted)
  * basket array, bounding the per-row expansion at
  * BasketCap·(BasketCap-1)/2 ≈ 32k structs (~1 MB). The bound is
  * DETERMINISTIC — baskets arrive sorted, so the cap keeps the smallest
  * item ids — and value-neutral on any corpus whose baskets fit under the
  * cap (the DuckDB oracle runs uncapped; q112's hash gate proves
  * neutrality on TPC-H). GraphOpsSpec drives a synthetic 10k-item basket
  * through the expansion to pin the bound.
  */
object GraphOps {

  /** Max basket items entering the pair expansion: 256² / 2 = 32,768
    * pairs per row worst-case — bounded task memory at any corpus skew. */
  val BasketCap = 256

  /** Distinct unordered co-occurrence pairs (u < v) per basket row,
    * duplicates across baskets preserved (support counting happens
    * downstream). `col` must hold a SORTED array of distinct longs. */
  def basketPairs(baskets: DataFrame, col: String): DataFrame =
    baskets
      .select(explode(expr(
        s"""flatten(transform(slice($col, 1, $BasketCap), (x, i) ->
           |  transform(slice(slice($col, 1, $BasketCap), i + 2, $BasketCap),
           |            y -> struct(x AS u, y AS v))))"""
          .stripMargin)).as("e"))
      .select(org.apache.spark.sql.functions.col("e.u").as("u"),
        org.apache.spark.sql.functions.col("e.v").as("v"))

  /** Synchronized majority-vote label propagation over the basket
    * co-membership graph (q166's engine), without ever materializing the
    * quadratic co-occurrence edge set: part p's neighbor count for label
    * l is Σ over p's baskets of the basket's label-l histogram, minus
    * p's own degree when l is p's label — the subtract-self identity
    * [[PageRank]] uses for contributions, applied to votes. Every
    * relation is linear in `pairs` or in nodes; per-basket histograms
    * are label-vocabulary-bounded (< 8 rows per basket).
    *
    * Hybrid dispatch mirrors [[PageRank.partRanks]]: below
    * `localNodeThreshold` nodes the label vector (one long per node)
    * lives on the driver — each round broadcasts it into the vote join
    * and collects the node-sized result back, so there is no label-side
    * shuffle and no lineage growth BY CONSTRUCTION (each round's input
    * is literal data). Above the threshold labels stay a distributed
    * DataFrame, coalesced to `checkpointBlocks` partitions (the label
    * relation is nodes × 2 longs — writing it at full shuffle
    * parallelism scatters hundreds of near-empty cache blocks whose
    * placement, not content, dominated the round wall time) and
    * localCheckpointed per round — the lineage cut that stops round k
    * re-deriving round k-1 once per consumer (3 consumers/round ⇒
    * exponential re-derivation when left live). Votes are exact integer
    * arithmetic (argmax encoded as votes·8 + (7−label), so max-code =
    * max-votes-then-min-label), so both arms — and any partitioning —
    * produce bit-identical labels; GraphOpsSpec pins arm equality the
    * way PageRankSpec does for ranks.
    *
    * @param pairs distinct (basket, node) rows, columns `ok` and `pk`;
    *              cache it — each round reads it twice
    * @param seed  (pk, lbl) initial integer labels, lbl in [0, 8)
    * @param localNodeThreshold driver-arm cutoff: one boxed (Long, Long)
    *              per node on collect, ~100 MB heap at the default 1M
    * @return (pk, lbl) after `rounds` synchronized rounds */
  def labelPropagation(pairs: DataFrame, seed: DataFrame, rounds: Int = 2,
      localNodeThreshold: Long = 1000000L, checkpointBlocks: Int = 8,
      localEdgeThreshold: Long = DefaultLocalEdgeThreshold): DataFrame = {
    implicit val sp: SparkSession = pairs.sparkSession
    import sp.implicits._

    // degree(p) = # baskets containing p — label-INDEPENDENT, so it is
    // computed ONCE (node-sized) instead of re-aggregated over the full
    // pairs relation inside every round's vote
    val degree = pairs.groupBy(col("pk")).agg(count(lit(1)).as("deg"))

    // labels3 carries (pk, lbl, deg); output is next-round (pk, lbl)
    // for exactly the nodes present in `pairs`
    def vote(labels3: DataFrame): DataFrame = {
      val hist = pairs.join(labels3.select(col("pk"), col("lbl")), "pk")
        .groupBy(col("ok"), col("lbl")).agg(count(lit(1)).as("c"))
      val tot = pairs.join(hist, "ok")
        .groupBy(col("pk"), col("lbl")).agg(sum(col("c")).as("t"))
      tot.join(labels3.select(col("pk"), col("lbl").as("own"), col("deg")), "pk")
        .select(col("pk"), col("own"),
          (col("t") - when(col("lbl") === col("own"), col("deg"))
            .otherwise(lit(0L))).as("votes"),
          col("lbl"))
        .groupBy(col("pk"))
        .agg(max(when(col("votes") > 0L,
            col("votes") * 8L + (lit(7L) - col("lbl")))).as("code"),
          first(col("own")).as("own"))
        // zero-vote isolates keep their current label
        .select(col("pk"),
          coalesce(lit(7L) - pmod(col("code"), lit(8L)), col("own")).as("lbl"))
    }

    // Dispatch probe and driver-arm materialization are ONE action: a
    // LIMIT-bounded collect of threshold+1 rows. If the seed fits, the
    // snapshot IS the round-0 label vector (limit(n+1) on a <=n-row
    // relation returns every row); if it does not, at most threshold+1
    // rows were pulled — the same driver cost as the count() probe this
    // replaces, without the separate count job per invocation.
    val snap = seed.select(col("pk"), col("lbl"))
      .limit(math.min(localNodeThreshold, Int.MaxValue - 1L).toInt + 1)
      .as[(Long, Long)].collect()
    if (snap.length <= localNodeThreshold) {
      // Nodes fit the driver. If the EDGE set fits too (second probe,
      // same LIMIT-bounded single-collect discipline), run every round
      // in primitive arrays with ZERO per-round Spark jobs — the
      // per-round broadcast + two-scan join + collect of the streaming
      // driver arm was the only machinery left whose wall time moved
      // with the host (GC debt, broadcast latency, cache-block
      // placement made q166's reps spread 3x), and at <= threshold
      // edges (~16 B/edge primitive) the whole graph is smaller than
      // one shuffle's overhead. Votes are the SAME exact integer
      // arithmetic, so all three arms are bit-identical
      // (GraphOpsSpec pins it).
      val edges = pairs.select(col("ok"), col("pk"))
        .limit(math.min(localEdgeThreshold, Int.MaxValue - 1L).toInt + 1)
        .as[(Long, Long)].collect()
      if (edges.length <= localEdgeThreshold)
        return localRounds(edges, snap, rounds)(sp)
      val degM = degree.as[(Long, Long)].collect().toMap
      var lbl = snap
      for (_ <- 1 to rounds)
        lbl = vote(broadcast(lbl.iterator
            .map { case (p, l) => (p, l, degM.getOrElse(p, 0L)) }
            .toSeq.toDF("pk", "lbl", "deg")))
          .as[(Long, Long)].collect()
      lbl.toSeq.toDF("pk", "lbl")
    } else {
      val degDf = degree.localCheckpoint()
      var labels = seed.select(col("pk"), col("lbl"))
      for (_ <- 1 to rounds)
        labels = vote(labels.join(degDf, "pk"))
          .coalesce(checkpointBlocks).localCheckpoint()
      labels
    }
  }

  /** Driver-local cutoff for the all-in-arrays arm: edges as two
    * primitive long arrays cost ~16 B each (~80 MB at the default 5M),
    * plus one transient boxed pass at collect — well inside a planning
    * driver's budget, and far below where the distributed arm's fixed
    * per-round costs would be worth paying. */
  val DefaultLocalEdgeThreshold: Long = 5000000L

  /** All `rounds` of the subtract-self majority vote over a
    * driver-resident edge list — the exact arithmetic of [[vote]]
    * (votes·8 + (7−label) argmax code, zero-vote isolates keep their
    * label, only labeled nodes are voted on or emitted), on dense int
    * indexes. No Spark job runs between entry and the final toDF. */
  private def localRounds(edges: Array[(Long, Long)],
      snap: Array[(Long, Long)], rounds: Int)(
      implicit sp: SparkSession): DataFrame = {
    import sp.implicits._
    // dense-index baskets and nodes (insertion order — determinism only
    // needs consistency within this invocation)
    val basketIdx = new java.util.HashMap[Long, Int]()
    val nodeIdx = new java.util.HashMap[Long, Int]()
    val eb = new Array[Int](edges.length)
    val en = new Array[Int](edges.length)
    var i = 0
    while (i < edges.length) {
      val (ok, pk) = edges(i)
      eb(i) = basketIdx.computeIfAbsent(ok, _ => basketIdx.size)
      en(i) = nodeIdx.computeIfAbsent(pk, _ => nodeIdx.size)
      i += 1
    }
    val nB = basketIdx.size; val nN = nodeIdx.size
    // deg(p) = #baskets containing p (pairs are distinct rows)
    val deg = new Array[Long](nN)
    i = 0; while (i < edges.length) { deg(en(i)) += 1L; i += 1 }
    // labels: -1 = never seeded (contributes nothing, never emitted —
    // the streaming arm's inner joins drop exactly these)
    val labels = Array.fill(nN)(-1)
    snap.foreach { case (pk, l) =>
      if (nodeIdx.containsKey(pk)) labels(nodeIdx.get(pk)) = l.toInt
    }
    val hist = new Array[Long](nB * 8)
    val votes = new Array[Long](nN * 8)
    for (_ <- 1 to rounds) {
      java.util.Arrays.fill(hist, 0L)
      java.util.Arrays.fill(votes, 0L)
      i = 0
      while (i < edges.length) { // per-basket label histogram
        val l = labels(en(i))
        if (l >= 0) hist(eb(i) * 8 + l) += 1L
        i += 1
      }
      i = 0
      while (i < edges.length) { // node votes = Σ its baskets' hists
        val n = en(i); val b = eb(i)
        var l = 0
        while (l < 8) { votes(n * 8 + l) += hist(b * 8 + l); l += 1 }
        i += 1
      }
      var n = 0
      while (n < nN) {
        val own = labels(n)
        if (own >= 0) { // argmax by votes*8 + (7-l); subtract self-votes
          var best = -1L
          var l = 0
          while (l < 8) {
            val v = votes(n * 8 + l) - (if (l == own) deg(n) else 0L)
            if (v > 0L) {
              val code = v * 8L + (7L - l)
              if (code > best) best = code
            }
            l += 1
          }
          if (best >= 0L) labels(n) = (7L - best % 8L).toInt
        }
        n += 1
      }
    }
    val out = Array.newBuilder[(Long, Long)]
    nodeIdx.forEach((pk, n) => if (labels(n) >= 0) out += ((pk, labels(n).toLong)))
    out.result().toSeq.toDF("pk", "lbl")
  }
}
