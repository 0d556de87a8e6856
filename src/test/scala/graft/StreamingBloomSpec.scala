package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingBloom
import graft.streaming.StreamingBloom.Ev

/** Streaming Bloom: closed-window word tables must equal the batch build
  * over the same rows, across arbitrary micro-batch splits — bit_or is
  * order- and batch-insensitive, so the sketch cannot drift. */
class StreamingBloomSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("closed streaming bloom words equal the batch build; state bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val base = graft.operators.Rel.events(dir)(spark)
      .select(col("event_type").as("eventType"), col("user_id").as("userId"),
        col("ts_us").as("tsUs"))
    val evs = base.as[(String, Long, Long)].collect()
      .map(r => Ev(r._1, r._2, r._3)).sortBy(_.tsUs)

    val input = MemoryStream[Ev]
    val q = StreamingBloom.words(input.toDS())
      .writeStream.format("memory").queryName("bloomwords").outputMode("append").start()
    try {
      val (a, rest) = evs.splitAt(evs.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      input.addData(a.toSeq: _*); q.processAllAvailable()
      input.addData(b.toSeq: _*); q.processAllAvailable()
      input.addData(c.toSeq: _*); q.processAllAvailable()
      input.addData(Ev("flush", 0L, evs.last.tsUs + 86400000000L * 30))
      q.processAllAvailable()

      val streamed = spark.table("bloomwords")
        .filter(col("eventType") =!= "flush")
        .as[(String, Long, Long, Long)].collect().toSet
      val batch = StreamingBloom.batchWords(spark.createDataset(evs.toSeq), "6 hours")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(streamed == batch,
        s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
      assert(streamed.nonEmpty)
      // sign bits clear (63-bit words) and per-window state bounded
      assert(streamed.forall(_._4 >= 0L), "sign bit must stay clear")
      streamed.groupBy(t => (t._1, t._2)).foreach { case (_, g) =>
        assert(g.size <= 66, "more than ceil(4096/63) words for one (type, window)")
      }
    } finally q.stop()
  }

  test("membership: every ingested key's probe bits are set in its window's words") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hour = 3600000000L
    val evs = (0 until 50).map(i => Ev("a", i.toLong * 7919, i.toLong * hour % (6 * hour)))
    val input = MemoryStream[Ev]
    val q = StreamingBloom.words(input.toDS(), windowLen = "6 hours")
      .writeStream.format("memory").queryName("bloomw2").outputMode("append").start()
    try {
      input.addData(evs: _*)
      input.addData(Ev("flush", 0L, 400 * hour))
      q.processAllAvailable()
      val words = spark.table("bloomw2").filter(col("eventType") === "a")
        .as[(String, Long, Long, Long)].collect()
        .map(t => (t._3, t._4)).toMap // word -> bits (single bucket 0)
      // zero false negatives: both probes of every key must be set
      evs.foreach { e =>
        val h = spark.range(1).select(graft.operators.TextOps.portableHash28(
          lit(s"bf:${e.userId}")).as("h")).head().getLong(0)
        for (p <- Seq(h % 4096, (h / 4096) % 4096)) {
          val bits = words.getOrElse(p / 63, 0L)
          assert(((bits >> (p % 63).toInt) & 1L) == 1L,
            s"probe $p of key ${e.userId} not set")
        }
      }
    } finally q.stop()
  }
}
