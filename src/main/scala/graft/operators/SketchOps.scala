package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared theta-sketch algebra over KMV min-k sketches — the ONE
  * implementation behind batch q164 and the streaming KMV twin
  * ([[graft.streaming.StreamingKmv]]), so batch, stream, and oracle can
  * never disagree on the semantics.
  *
  * Theta convention: an UNSATURATED sketch (fewer than k distinct
  * hashes) is the complete set and carries θ = 2^28 (every hash is
  * "sampled"); a saturated sketch's θ is its kth minimum. The shared
  * threshold for any two-sketch operation is θ = min(θ_A, θ_B), every
  * set estimate is |{h < θ}| · 2^28 div θ in exact integers, and the
  * pre-division count identity n_union = n_inter + n_anotb + n_bnota
  * holds bit-for-bit on any engine computing the same hashes.
  */
object SketchOps {

  /** Hash domain size: portableHash28 values lie in [0, 2^28). */
  val HashDomain = 268435456L

  /** Append theta + count + estimate columns to a frame carrying two
    * min-k sketch arrays `am` and `bm` (ascending, distinct, ≤ k). */
  def kmvAlgebra(df: DataFrame, k: Int): DataFrame =
    df
      .withColumn("theta", least(
        when(size(col("am")) < k, lit(HashDomain)).otherwise(expr(s"element_at(am, $k)")),
        when(size(col("bm")) < k, lit(HashDomain)).otherwise(expr(s"element_at(bm, $k)"))))
      .withColumn("n_inter",
        expr("size(filter(array_intersect(am, bm), x -> x < theta))").cast("long"))
      .withColumn("n_anotb",
        expr("size(filter(array_except(am, bm), x -> x < theta))").cast("long"))
      .withColumn("n_bnota",
        expr("size(filter(array_except(bm, am), x -> x < theta))").cast("long"))
      .withColumn("n_union", col("n_inter") + col("n_anotb") + col("n_bnota"))
      .withColumn("est_union", expr(s"n_union * ${HashDomain}L div theta"))
      .withColumn("est_inter", expr(s"n_inter * ${HashDomain}L div theta"))
      .withColumn("est_anotb", expr(s"n_anotb * ${HashDomain}L div theta"))
      .withColumn("jaccard_bp", when(col("n_union") === 0L, lit(null))
        .otherwise(expr("n_inter * 10000L div n_union")))
}
