package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingUpsert
import graft.streaming.StreamingUpsert.{Change, Upserted}

/** Streaming CDC upsert: the stream's final per-key state must equal the
  * batch latest-wins merge ([[graft.operators.CdcOps]]), regardless of how
  * the change log is split into micro-batches or reordered. */
class StreamingUpsertSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def lastPerKey(rows: Seq[Upserted]): Map[Long, Upserted] =
    rows.zipWithIndex.groupBy(_._1.k).map { case (k, rs) => k -> rs.maxBy(_._2)._1 }

  test("streaming upsert converges to the batch merge across batch splits and reordering") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val log = Seq(
      Change(1, 0, "U", 10.0), Change(1, 1, "U", 20.0),             // update wins
      Change(2, 0, "U", 10.0), Change(2, 2, "D", 0.0),              // deleted
      Change(3, 1, "U", 30.0), Change(3, 1, "D", 0.0),              // tie: D wins
      Change(4, 5, "U", 99.0),                                      // pure insert
      Change(5, 2, "U", 50.0), Change(5, 1, "U", 40.0),             // late LOWER version ignored
      Change(6, 1, "D", 0.0), Change(6, 0, "U", 70.0))              // late upsert can't resurrect
    val input = MemoryStream[Change]
    val q = StreamingUpsert.upsert(input.toDS())
      .writeStream.format("memory").queryName("upsert").outputMode("update").start()
    try {
      // split mid-key so state must carry across micro-batches
      input.addData(log.take(4): _*); q.processAllAvailable()
      input.addData(log.slice(4, 8): _*); q.processAllAvailable()
      input.addData(log.drop(8): _*); q.processAllAvailable()
      val out = lastPerKey(spark.table("upsert").as[Upserted].collect().toSeq)
      val expected = StreamingUpsert.replay(log)
      assert(out == expected)
      // alive rows match the batch operator exactly
      val batch = graft.operators.CdcOps
        .latestWins(log.toDF(), Seq("k"), "version", "op")
        .as[(Long, Long, String, Double)].collect()
        .map(r => r._1 -> r._4).toMap
      val aliveStream = out.collect { case (k, u) if u.alive => k -> u.price }
      assert(aliveStream == batch)
    } finally q.stop()
  }

  test("no-op changes emit nothing (changelog stays minimal)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val q = StreamingUpsert.upsert(input.toDS())
      .writeStream.format("memory").queryName("upsert2").outputMode("update").start()
    try {
      input.addData(Change(1, 3, "U", 10.0)); q.processAllAvailable()
      val n1 = spark.table("upsert2").count()
      // stale change: lower version, no state transition, no emission
      input.addData(Change(1, 1, "U", 99.0)); q.processAllAvailable()
      val n2 = spark.table("upsert2").count()
      assert(n1 == 1 && n2 == 1)
    } finally q.stop()
  }
}
