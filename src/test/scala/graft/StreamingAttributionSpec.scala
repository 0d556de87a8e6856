package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingAttribution
import graft.streaming.StreamingAttribution.{Attribution, Ev}

/** Streaming last-touch attribution: on in-order per-user delivery, the
  * stream's per-purchase attributions must aggregate to exactly batch
  * q119's (touch, n_conversions, avg gap) — regardless of micro-batch
  * splits. */
class StreamingAttributionSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  private def fixtureLog(): Seq[Ev] = {
    import spark.implicits._
    graft.operators.Rel.events(dir)(spark)
      .filter(col("event_type").isin("click", "view", "purchase"))
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
      .map(r => Ev(r._1, r._2, r._3, r._4))
      // in-order delivery per user: ship in global (ts, kind, id) order
      .sortBy(e => (e.tsUs, if (e.eventType == "purchase") 1 else 0, e.eventId)).toSeq
  }

  private def grouped(rows: Seq[Attribution]): Map[String, (Long, Option[Double])] =
    rows.groupBy(_.touch).map { case (t, rs) =>
      val gaps = rs.filter(_.gapUs != StreamingAttribution.NoGap).map(_.gapUs)
      t -> (rs.size.toLong,
        if (t == "none") None else Some(gaps.sum.toDouble / gaps.size))
    }

  test("stream attributions aggregate to batch q119 across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val log = fixtureLog()
    val input = MemoryStream[Ev]
    val q = StreamingAttribution.attribute(input.toDS())
      .writeStream.format("memory").queryName("attrib").outputMode("append").start()
    try {
      // three uneven splits, cutting mid-user so state must carry
      val (a, rest) = log.splitAt(log.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      input.addData(c: _*); q.processAllAvailable()
      val streamed = grouped(spark.table("attrib").as[Attribution].collect().toSeq)

      val batch = graft.operators.Queries8.all("q119_last_touch")(spark, dir)
        .as[(String, Long, Option[Double])].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(streamed == batch,
        s"stream $streamed != batch $batch")

      // replay reference agrees too (pure-function sanity)
      val replayed = grouped(
        log.groupBy(_.userId).values.flatMap(StreamingAttribution.replay).toSeq)
      assert(replayed == batch)
    } finally q.stop()
  }
}
