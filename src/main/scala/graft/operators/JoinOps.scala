package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join utilities for skewed / co-located workloads at scale.
  *
  * AQE's skew-join handling covers sort-merge joins, but aggregation skew
  * and deliberate key-salting remain user-land patterns — provided here as
  * library operators with result-equivalence guarantees (tested against the
  * unsalted plans in JoinOpsSpec).
  */
object JoinOps {

  /** Salted inner equi-join for a skewed LEFT side: left rows get a random-
    * free deterministic salt from a high-cardinality column hash; the right
    * side is replicated across all salt values. Result set is EXACTLY the
    * plain join's. Use when one join key dominates (AQE can split SMJ skew,
    * but salting also spreads the build/probe hash tables).
    *
    * @param saltBy high-cardinality column on the left used to derive the
    *               salt deterministically (e.g. a row id) — avoids rand()'s
    *               nondeterminism under task retries, which can duplicate or
    *               drop rows in shuffles (a real at-scale hazard).
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String,
      saltBy: Column, parts: Int = 16): DataFrame = {
    val salted = left.withColumn("__salt", pmod(hash(saltBy), lit(parts)))
    val replicated = right
      .withColumn("__salt", explode(sequence(lit(0), lit(parts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (partial -> final) aggregation with an explicit salt stage
    * for heavily-skewed group keys: groupBy(key, salt) first shrinks the
    * hot key's partitions, then the tiny (key) rollup finishes. Supports
    * algebraic aggregates passed as (partial, final) column builders. */
  def saltedCountSum(
      df: DataFrame, key: String, sumCol: String,
      saltBy: Column, parts: Int = 16): DataFrame = {
    df.withColumn("__salt", pmod(hash(saltBy), lit(parts)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__c"), sum(col(sumCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__c")).as("cnt"), sum(col("__s")).as("sum"))
  }

  /** Range join via bucketed equi-join: join `left.pointCol` into
    * `[right.loCol, right.hiCol)` intervals by exploding each interval into
    * its covering buckets of width `bucket`, turning a theta join into an
    * equi-join on the bucket id + residual predicate. Intervals must be
    * non-negative and bounded; pick `bucket` near the median interval width. */
  def rangeJoin(
      left: DataFrame, pointCol: String,
      right: DataFrame, loCol: String, hiCol: String,
      bucket: Long): DataFrame = {
    // integer `div`, not double division: `/` on longs goes through double
    // and loses exactness above 2^53, silently mis-bucketing (and dropping)
    // rows with e.g. nanosecond-epoch points. Columns must be integral;
    // names are backtick-quoted so dotted/spaced names resolve as columns.
    def bucketOf(c: String) = expr(s"`$c` div $bucket")
    val l = left.withColumn("__b", bucketOf(pointCol))
    val r = right.withColumn("__b", explode(sequence(bucketOf(loCol), bucketOf(hiCol))))
    l.join(r, Seq("__b"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__b")
  }
}
