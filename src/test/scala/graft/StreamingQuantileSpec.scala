package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingQuantile
import graft.streaming.StreamingQuantile.Ev

/** Streaming octave-quantile sketch: closed-window octave counts must
  * equal the batch bucketing of the same rows across micro-batch splits,
  * the folded median estimate must sit within one octave of the exact
  * median, and per-window state stays ≤64 counters. */
class StreamingQuantileSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("closed streaming octave counts equal the batch build; estimate within 2x") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val base = graft.operators.Rel.events(dir)(spark)
      .select(col("event_type").as("eventType"), col("ts_us").as("tsUs"),
        (floor(col("value") * 1000000) + 1).cast("long").as("v"))
    val evs = base.as[(String, Long, Long)].collect()
      .map(r => Ev(r._1, r._2, r._3)).sortBy(_.tsUs)

    val input = MemoryStream[Ev]
    val q = StreamingQuantile.octaves(input.toDS())
      .writeStream.format("memory").queryName("octs").outputMode("append").start()
    try {
      val (a, b) = evs.splitAt(evs.length / 2)
      input.addData(a.toSeq: _*); q.processAllAvailable()
      input.addData(b.toSeq: _*); q.processAllAvailable()
      input.addData(Ev("flush", evs.last.tsUs + 86400000000L * 30, 1L))
      q.processAllAvailable()

      val streamed = spark.table("octs")
        .filter(col("eventType") =!= "flush")
        .as[(String, Long, Int, Long)].collect().toSet

      val batch = spark.createDataset(evs.toSeq).toDF()
        .select(col("eventType"), expr("tsUs div 21600000000").as("bucket"),
          length(bin(col("v"))).as("b"))
        .groupBy(col("eventType"), col("bucket"), col("b"))
        .agg(count(lit(1)).as("c"))
        .as[(String, Long, Int, Long)].collect().toSet

      assert(streamed == batch,
        s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
      assert(streamed.nonEmpty)
      streamed.groupBy(t => (t._1, t._2)).foreach { case (_, g) =>
        assert(g.size <= 64, "more than 64 octaves for one (type, window)")
      }

      // octave guarantee vs the exact per-(type, window) median
      val est = StreamingQuantile.estimate(
        spark.table("octs").filter(col("eventType") =!= "flush"))
        .as[(String, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
      // exact LOWER median (value at rank ceil(n/2)) — the rank the sketch
      // targets; an interpolated midpoint can sit octaves away when n is
      // tiny and the two middle values straddle octaves
      val exact = spark.createDataset(evs.toSeq).toDF()
        .select(col("eventType"), expr("tsUs div 21600000000").as("bucket"), col("v"))
        .groupBy(col("eventType"), col("bucket"))
        .agg(expr("element_at(sort_array(collect_list(v)), " +
          "cast((count(v) + 1) div 2 AS int))").as("med"))
        .as[(String, Long, Long)].collect()
      assert(exact.nonEmpty)
      // bound is INCLUSIVE above: approx = 2^bitlen(med) equals exactly
      // 2*med when med itself is a power of two
      exact.foreach { case (t, bkt, med) =>
        val a = est((t, bkt))
        assert(a >= med && a <= 2 * med,
          s"($t,$bkt): approx $a outside [med, 2*med] of exact lower median $med")
      }
    } finally q.stop()
  }
}
