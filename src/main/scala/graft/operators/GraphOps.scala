package graft.operators

import org.apache.spark.sql.DataFrame
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
}
