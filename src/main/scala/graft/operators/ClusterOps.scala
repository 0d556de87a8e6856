package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the clustering step of
  * transitive dedup (LSH pairs → duplicate groups).
  *
  * Hybrid execution, like Spark's own broadcast-join threshold: the edge
  * set after LSH banding is orders of magnitude smaller than the corpus
  * (pairs of near-dups, not all docs), so up to `localEdgeThreshold` edges
  * the components are computed with a driver-side union-find (one collect,
  * milliseconds, no iteration); above it, distributed min-label
  * propagation (one join+agg per round, lineage truncated per round,
  * rounds = component diameter). Both paths produce the identical
  * labeling: every node labeled with the MINIMUM member id of its
  * component. */
object ClusterOps {

  /** @param edges two long columns (src, dst); undirected (either
    *              orientation suffices)
    * @param localEdgeThreshold max edges collected to the driver for the
    *              union-find path; collect() materializes boxed Rows (two
    *              boxed Longs + Row wrapper each), so 1M edges is realistically
    *              ~150-200 MB of driver heap, not the 16 MB the raw longs
    *              suggest — still safe at the default threshold, but size any
    *              bump off the boxed figure. Above it, the distributed path
    *              runs with no driver materialization.
    * @return (id, cluster_id) — cluster_id = min member id */
  def connectedComponents(
      edges: DataFrame, srcCol: String, dstCol: String,
      localEdgeThreshold: Long = 1000000L, maxRounds: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    // materialize the (post-LSH, small) edge set once: the sizing count,
    // the collect/propagation, and nothing else re-evaluates the upstream
    // candidate-generation pipeline
    val e = edges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .localCheckpoint()
    val nEdges = e.count()
    if (nEdges <= localEdgeThreshold) localUnionFind(spark, e)
    else distributedMinLabel(e, maxRounds)
  }

  private def localUnionFind(spark: SparkSession, e: DataFrame): DataFrame = {
    import spark.implicits._
    val pairs = e.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    for ((a, b) <- pairs) {
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(if (ra < rb) rb else ra) = math.min(ra, rb)
    }
    // root ids are the minimum member by construction (always union toward
    // the smaller root)
    val labeled = parent.keys.toSeq.map(id => (id, find(id)))
    spark.createDataset(labeled).toDF("id", "cluster_id")
  }

  private def distributedMinLabel(e: DataFrame, maxRounds: Int): DataFrame = {
    val edges = e.union(e.select(col("dst").as("src"), col("src").as("dst"))).localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint()
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val next = edges.join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("lbl"))
        .union(labels)
        .groupBy(col("id")).agg(min(col("lbl")).as("lbl"))
        .localCheckpoint()
      // exact fixpoint test: count labels that changed this round (an
      // id-equijoin of two checkpointed relations — no lineage re-run; a
      // label-sum checksum would be one scan cheaper but is inexact under
      // 64-bit wraparound)
      val changed = next.join(labels.withColumnRenamed("lbl", "prev"), "id")
        .filter(col("lbl") =!= col("prev")).count()
      converged = changed == 0L
      labels = next
      rounds += 1
    }
    if (!converged)
      System.err.println(s"[components] WARNING: min-label propagation truncated at " +
        s"$rounds rounds before the fixpoint; clusters may be split")
    labels.select(col("id"), col("lbl").as("cluster_id"))
  }
}
