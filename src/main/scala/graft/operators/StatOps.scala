package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Shared exact-statistic building blocks for the query surface. */
private[graft] object StatOps {

  /** Exact LOWER p50/p99 per `flag` over a (flag, cents) relation, the
    * shrink-first way (q117 rule): collapse to the per-(flag, value)
    * histogram FIRST — the shuffle and the window sort see only distinct
    * values, never the row count — then take the value where the
    * cumulative count reaches rank ceil(p·n). Value-at-rank over the
    * multiset == min value whose cumulative count reaches the rank, so
    * this is bit-equal to a row_number formulation at any partitioning.
    * Used by q35 (exact quantile columns) and q145 (the exactness
    * baseline the octave sketch is gated against). */
  def rankQuantiles(cents: DataFrame): DataFrame = {
    val wf = Window.partitionBy(col("flag"))
    cents
      .groupBy(col("flag"), col("cents")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wf.orderBy(col("cents"))))
      .withColumn("n", sum(col("c")).over(wf))
      .groupBy(col("flag"))
      .agg(min(when(col("cum") >= expr("(n + 1) div 2"), col("cents"))).as("p50_cents"),
        min(when(col("cum") >= expr("(99 * n + 99) div 100"), col("cents"))).as("p99_cents"))
  }
}
