package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingBars
import graft.streaming.StreamingBars.Ev

/** Streaming OHLC: every CLOSED window emitted by the stream must equal the
  * batch struct-min/max bar computed over the same fixture rows. */
class StreamingBarsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("closed streaming bars equal batch bars on the fixture") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = graft.operators.Rel.events(dir)(spark)
      .select(col("event_type"), col("ts_us"), col("event_id"),
        floor(col("value") * 1000000).cast("long").as("vm"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => Ev(r._1, r._2, r._3, r._4)).sortBy(_.tsUs)

    val input = MemoryStream[Ev]
    val q = StreamingBars.bars(input.toDS())
      .writeStream.format("memory").queryName("bars").outputMode("append").start()
    try {
      val (a, b) = evs.splitAt(evs.length / 2)
      input.addData(a.toSeq: _*); q.processAllAvailable()
      input.addData(b.toSeq: _*); q.processAllAvailable()
      // advance the watermark far past the last event so every bar closes
      val flush = Ev("watermark-flush", evs.last.tsUs + 86400000000L * 30, 0L, 0L)
      input.addData(flush); q.processAllAvailable()

      val streamed = spark.table("bars")
        .filter(col("eventType") =!= "watermark-flush")
        .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet

      val batch = spark.createDataset(evs.toSeq)
        .groupBy(col("eventType"), expr("tsUs div 21600000000").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(struct(col("tsUs"), col("eventId"), col("vm"))).as("o"),
          max(struct(col("tsUs"), col("eventId"), col("vm"))).as("c"),
          max(col("vm")).as("hi"), min(col("vm")).as("lo"))
        .select(col("eventType"), col("bucket"), col("n"),
          col("o.vm"), col("hi"), col("lo"), col("c.vm"))
        .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet

      assert(streamed == batch,
        s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
