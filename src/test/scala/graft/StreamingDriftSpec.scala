package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingDrift
import graft.streaming.StreamingDrift.Ev

/** Streaming drift monitor: closed-window bin counts must equal the batch
  * bucketing of the same rows against the same reference cuts. */
class StreamingDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("closed streaming bin counts equal the batch bucketing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val base = graft.operators.Rel.events(dir)(spark)
      .select(col("event_type").as("eventType"), col("ts_us").as("tsUs"),
        col("event_id"), floor(col("value") * 1000000).cast("long").as("vm"))
    // reference = first week; cuts computed batch-side once
    val d0 = base.agg(min(expr("tsUs div 86400000000"))).as[Long].collect().head
    val ref = StreamingDrift.referenceCuts(
      base.filter(expr(s"tsUs div 86400000000 <= $d0 + 6"))
        .select(col("eventType"), col("vm"), col("event_id").as("ord"))).cache()

    val evs = base.select("eventType", "tsUs", "vm").as[(String, Long, Long)]
      .collect().map(r => Ev(r._1, r._2, r._3)).sortBy(_.tsUs)
    val input = MemoryStream[Ev]
    val q = StreamingDrift.binCounts(input.toDS(), ref)
      .writeStream.format("memory").queryName("drift").outputMode("append").start()
    try {
      val (a, b) = evs.splitAt(evs.length / 2)
      input.addData(a.toSeq: _*); q.processAllAvailable()
      input.addData(b.toSeq: _*); q.processAllAvailable()
      input.addData(Ev("flush", evs.last.tsUs + 86400000000L * 30, 0L))
      q.processAllAvailable()

      val streamed = spark.table("drift")
        .filter(col("eventType") =!= "flush")
        .as[(String, Long, Long, Long)].collect().toSet

      val batch = spark.createDataset(evs.toSeq).toDF()
        .join(broadcast(ref.toDF()), Seq("eventType"))
        .withColumn("bin", expr("size(filter(cuts, c -> vm > c)) + 1"))
        .groupBy(col("eventType"), expr("tsUs div 21600000000").as("bucket"),
          col("bin"))
        .agg(count(lit(1)).as("n"))
        .as[(String, Long, Long, Long)].collect().toSet

      assert(streamed == batch,
        s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
      assert(streamed.nonEmpty)
      // every closed (type, window) carries at most 10 bins
      streamed.groupBy(t => (t._1, t._2)).foreach { case (_, g) =>
        assert(g.size <= 10 && g.map(_._3).forall(b => b >= 1 && b <= 10))
      }
    } finally { q.stop(); ref.unpersist() }
  }

  test("non-default windowLen: bucket labels index 1-hour windows, not 6-hour") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hour = 3600000000L
    // one event per hour for 8 hours, all same type/value — under the
    // old hard-coded 6h divisor the first 6 would collapse to one bucket
    val evs = (0 until 8).map(h => Ev("a", h * hour + 1, 5L))
    val ref = spark.createDataset(Seq(
      StreamingDrift.RefBins("a", Array(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L))))
    val input = MemoryStream[Ev]
    val q = StreamingDrift.binCounts(input.toDS(), ref, windowLen = "1 hour")
      .writeStream.format("memory").queryName("drift1h").outputMode("append").start()
    try {
      input.addData(evs: _*)
      input.addData(Ev("flush", 400 * hour, 0L))
      q.processAllAvailable()
      val buckets = spark.table("drift1h").filter(col("eventType") === "a")
        .as[(String, Long, Long, Long)].collect().map(_._2).sorted.toSeq
      assert(buckets == (0L until 8L), s"expected one bucket per hour, got $buckets")
    } finally q.stop()
  }
}
