package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingDistinct
import graft.streaming.StreamingDistinct.Ev

/** Streaming HLL: closed-window registers (and the folded estimates) must
  * equal the batch register build over the same rows, across arbitrary
  * micro-batch splits — max-merge is order- and batch-insensitive. */
class StreamingDistinctSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("closed streaming registers and estimates equal the batch build") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val base = graft.operators.Rel.events(dir)(spark)
      .select(col("event_type").as("eventType"), col("user_id").as("userId"),
        col("ts_us").as("tsUs"))
    val evs = base.as[(String, Long, Long)].collect()
      .map(r => Ev(r._1, r._2, r._3)).sortBy(_.tsUs)

    val input = MemoryStream[Ev]
    val q = StreamingDistinct.registers(input.toDS())
      .writeStream.format("memory").queryName("hllregs").outputMode("append").start()
    try {
      val (a, rest) = evs.splitAt(evs.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      input.addData(a.toSeq: _*); q.processAllAvailable()
      input.addData(b.toSeq: _*); q.processAllAvailable()
      input.addData(c.toSeq: _*); q.processAllAvailable()
      input.addData(Ev("flush", 0L, evs.last.tsUs + 86400000000L * 30))
      q.processAllAvailable()

      val streamed = spark.table("hllregs")
        .filter(col("eventType") =!= "flush")
        .as[(String, Long, Long, Int)].collect().toSet

      val batch = spark.createDataset(evs.toSeq).toDF()
        .withColumn("h", graft.operators.TextOps.portableHash28(
          concat(lit("hll:"), col("userId").cast("string"))))
        .select(col("eventType"), expr("tsUs div 21600000000").as("bucket"),
          (col("h") % 64).as("idx"), expr("h div 64").as("w"))
        .withColumn("rho", when(col("w") === 0, lit(23))
          .otherwise(lit(23) - length(bin(col("w")))))
        .groupBy(col("eventType"), col("bucket"), col("idx"))
        .agg(max(col("rho")).cast("int").as("mreg"))
        .as[(String, Long, Long, Int)].collect().toSet

      assert(streamed == batch,
        s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
      assert(streamed.nonEmpty)

      // the folded estimates agree too, and per-window state was bounded
      val est = StreamingDistinct.estimate(
        spark.table("hllregs").filter(col("eventType") =!= "flush"))
        .as[(String, Long, Long)].collect().toSet
      val batchEst = StreamingDistinct.estimate(
        spark.createDataset(batch.toSeq).toDF("eventType", "bucket", "idx", "mreg"))
        .as[(String, Long, Long)].collect().toSet
      assert(est == batchEst)
      streamed.groupBy(t => (t._1, t._2)).foreach { case (_, g) =>
        assert(g.size <= 64, "more than 64 registers for one (type, window)")
      }
    } finally q.stop()
  }

  test("non-default windowLen: bucket labels index 1-hour windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hour = 3600000000L
    val evs = (0 until 6).map(h => Ev("a", h.toLong, h * hour + 1))
    val input = MemoryStream[Ev]
    val q = StreamingDistinct.registers(input.toDS(), windowLen = "1 hour")
      .writeStream.format("memory").queryName("hll1h").outputMode("append").start()
    try {
      input.addData(evs: _*)
      input.addData(Ev("flush", 0L, 400 * hour))
      q.processAllAvailable()
      val buckets = spark.table("hll1h").filter(col("eventType") === "a")
        .select("bucket").distinct().as[Long].collect().sorted.toSeq
      assert(buckets == (0L until 6L), s"expected one bucket per hour, got $buckets")
    } finally q.stop()
  }
}
