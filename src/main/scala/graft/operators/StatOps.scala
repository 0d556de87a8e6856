package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Shared exact-statistic building blocks for the query surface. */
private[graft] object StatOps {

  /** Exact inclusive running totals over a range-partitioned total order —
    * the scalable replacement for an unpartitioned window cumsum (which
    * Catalyst plans as Exchange SinglePartition + one sorting task over
    * ALL rows, the textbook 100×-scale-killer).
    *
    * Shape (the two-level cumsum): ONE range exchange on (group, order)
    * gives K partitions each locally sorted in parallel; a narrow
    * per-partition sequential scan produces local running sums; the
    * K·|groups| per-partition totals (tiny — they collapse row counts to
    * partition counts) come back to the driver, turn into exclusive prefix
    * offsets, and broadcast-join back so `cum = offset + local`. Exact
    * integer arithmetic end-to-end; the result depends only on the total
    * (group, order) ordering, so it is partition-count invariant.
    *
    * The scanned frame is localCheckpointed (the PageRank idiom) so the
    * offsets job and the downstream consumer see the SAME materialized
    * partitions — without the pin, each action re-samples the range
    * partitioner's boundaries and the offsets could disagree with the
    * partition populations they are added to.
    *
    * For each `(name, w)` in `weights` the output carries two new columns:
    * `name` — the inclusive cumulative sum of `w` within the row's group
    * in `order` — and `${name}_total`, the group's grand total. `order`
    * must be a strict total order within each group (add tie-break
    * columns), otherwise "inclusive" is ambiguous. Weights must be
    * non-negative (counts): the per-partition total is recovered as
    * max(local running sum), which equals the last value only when the
    * running sum is monotone.
    */
  def rangeCumsum(df: DataFrame, group: Seq[String], order: Seq[String],
      weights: Seq[(String, Column)]): DataFrame = {
    val spark = df.sparkSession
    val k = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val sortCols = (group ++ order).map(col)
    val wNames = weights.map { case (n, _) => s"__w_$n" }
    val withW = weights.foldLeft(df) { case (d, (n, w)) =>
      d.withColumn(s"__w_$n", w.cast("long"))
    }
    val ranged = withW
      .repartitionByRange(k, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())

    val schema = ranged.schema
    val groupIdx = group.map(schema.fieldIndex)
    val wIdx = wNames.map(schema.fieldIndex)
    val outSchema = StructType(schema.fields ++
      weights.map { case (n, _) => StructField(s"__local_$n", LongType, nullable = false) })
    // narrow, order-preserving: one sequential scan per partition,
    // accumulators reset at each group boundary (groups are contiguous
    // under the (group, order) range sort)
    val scanned = ranged.mapPartitions { it =>
      var current: Seq[Any] = null
      val acc = new Array[Long](wIdx.length)
      it.map { r =>
        val g = groupIdx.map(r.get)
        if (g != current) { current = g; java.util.Arrays.fill(acc, 0L) }
        var i = 0
        while (i < acc.length) { acc(i) += r.getLong(wIdx(i)); i += 1 }
        Row.fromSeq(r.toSeq ++ acc)
      }
    }(Encoders.row(outSchema)).localCheckpoint()

    // per-(partition, group) totals: K·|groups| rows — driver-bounded
    val totCols = weights.map { case (n, _) => max(col(s"__local_$n")).as(s"__t_$n") }
    val totals = scanned.groupBy((col("__pid") +: group.map(col)): _*)
      .agg(totCols.head, totCols.tail: _*)
      .collect()
    val gSlice = 1 to group.length
    // exclusive prefix per group, scanning partitions in range order
    val offRows = totals
      .groupBy(r => gSlice.map(r.get))
      .valuesIterator.flatMap { rows =>
        val sorted = rows.sortBy(_.getInt(0))
        val grand = weights.indices.map(i =>
          sorted.map(_.getLong(1 + group.length + i)).sum)
        val acc = new Array[Long](weights.length)
        sorted.map { r =>
          val off = acc.toSeq
          weights.indices.foreach(i => acc(i) += r.getLong(1 + group.length + i))
          Row.fromSeq((r.getInt(0) +: gSlice.map(r.get).toSeq) ++ off ++ grand)
        }
      }.toSeq
    val offSchema = StructType(
      StructField("__pid", schema("__pid").dataType, nullable = false) +:
        group.map(schema(_)) ++:
        weights.map { case (n, _) => StructField(s"__off_$n", LongType, nullable = false) } ++:
        weights.map { case (n, _) => StructField(s"${n}_total", LongType, nullable = false) })
    val offsets = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1), offSchema)

    val joined = scanned.join(broadcast(offsets), "__pid" +: group)
    val withCums = weights.foldLeft(joined) { case (d, (n, _)) =>
      d.withColumn(n, col(s"__off_$n") + col(s"__local_$n"))
    }
    withCums.drop("__pid")
      .drop(wNames: _*)
      .drop(weights.map { case (n, _) => s"__local_$n" }: _*)
      .drop(weights.map { case (n, _) => s"__off_$n" }: _*)
  }

  /** Exact LOWER p50/p99 per `flag` over a (flag, cents) relation, the
    * shrink-first way (q117 rule): collapse to the per-(flag, value)
    * histogram FIRST — the shuffle sees only distinct values, never the
    * row count — then take the value where the cumulative count reaches
    * rank ceil(p·n). The cumsum is [[rangeCumsum]], so even a
    * high-cardinality value domain (timestamps, raw doubles) never funnels
    * through one task. Value-at-rank over the multiset == min value whose
    * cumulative count reaches the rank, so this is bit-equal to a
    * row_number formulation at any partitioning. Used by q35 (exact
    * quantile columns) and q145 (the exactness baseline the octave sketch
    * is gated against). */
  def rankQuantiles(cents: DataFrame): DataFrame = {
    val hist = cents.groupBy(col("flag"), col("cents")).agg(count(lit(1)).as("c"))
    rangeCumsum(hist, Seq("flag"), Seq("cents"), Seq("cum" -> col("c")))
      .groupBy(col("flag"))
      .agg(min(when(col("cum") >= expr("(cum_total + 1) div 2"), col("cents"))).as("p50_cents"),
        min(when(col("cum") >= expr("(99 * cum_total + 99) div 100"), col("cents"))).as("p99_cents"))
  }
}
