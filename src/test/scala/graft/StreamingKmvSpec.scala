package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingKmv
import graft.streaming.StreamingKmv.Ev

/** Streaming KMV: closed-window sketches, estimates, and the two-type
  * set algebra must equal the batch build over the same rows, across
  * arbitrary micro-batch splits — distinct min-k merge is order- and
  * batch-insensitive, and the state per open (type, window) is ≤ k
  * longs. */
class StreamingKmvSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"
  private val K = 64

  test("closed streaming sketches, estimates, and set algebra equal the batch build") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val base = graft.operators.Rel.events(dir)(spark)
      .select(col("event_type").as("eventType"), col("user_id").as("userId"),
        col("ts_us").as("tsUs"))
    val evs = base.as[(String, Long, Long)].collect()
      .map(r => Ev(r._1, r._2, r._3)).sortBy(_.tsUs)

    val input = MemoryStream[Ev]
    val q = StreamingKmv.sketches(input.toDS(), k = K)
      .writeStream.format("memory").queryName("kmvsk").outputMode("append").start()
    try {
      val (a, rest) = evs.splitAt(evs.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      input.addData(a.toSeq: _*); q.processAllAvailable()
      input.addData(b.toSeq: _*); q.processAllAvailable()
      input.addData(c.toSeq: _*); q.processAllAvailable()
      input.addData(Ev("flush", 0L, evs.last.tsUs + 86400000000L * 30))
      q.processAllAvailable()

      val streamedDf = spark.table("kmvsk").filter(col("eventType") =!= "flush")
      val streamed = streamedDf
        .as[(String, Long, Seq[Long])].collect().map(t => (t._1, t._2, t._3)).toSet

      // batch twin: same hash, same distinct min-k per (type, 6h bucket)
      val minK = udaf(new graft.functions.MinKDistinct.MinK(K),
        org.apache.spark.sql.Encoders.scalaLong)
      val batchDf = spark.createDataset(evs.toSeq).toDF()
        .withColumn("h", graft.operators.TextOps.portableHash28(
          concat(lit("kmv:"), col("userId").cast("string"))))
        .groupBy(col("eventType"), expr("tsUs div 21600000000").as("bucket"))
        .agg(minK(col("h")).as("mins"))
      val batch = batchDf
        .as[(String, Long, Seq[Long])].collect().map(t => (t._1, t._2, t._3)).toSet

      assert(streamed == batch,
        s"missing=${(batch -- streamed).take(2)} extra=${(streamed -- batch).take(2)}")
      assert(streamed.nonEmpty)
      streamed.foreach { case (_, _, mins) =>
        assert(mins.length <= K)
        assert(mins == mins.sorted && mins.distinct == mins, "sketch not sorted-distinct")
      }

      // estimates and the cross-type algebra ride the SAME relations
      val est = StreamingKmv.estimate(streamedDf, K)
        .as[(String, Long, Long)].collect().toSet
      val batchEst = StreamingKmv.estimate(batchDf, K)
        .as[(String, Long, Long)].collect().toSet
      assert(est == batchEst)

      val types = streamed.map(_._1).toSeq.sorted
      val (ta, tb) = (types.head, types.last)
      val alg = StreamingKmv.setAlgebra(streamedDf, ta, tb, K)
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      val batchAlg = StreamingKmv.setAlgebra(batchDf, ta, tb, K)
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      assert(alg.sameElements(batchAlg))
      assert(alg.nonEmpty)
      // count identity before the division, per window
      alg.foreach { case (_, _, nUnion, nInter, _, estInter, estAnotb, _) =>
        assert(nInter <= nUnion)
        assert(estInter >= 0 && estAnotb >= 0)
      }
    } finally q.stop()
  }

  test("setAlgebra keeps one-sided windows: absent side = empty sketch, not a dropped row") {
    import spark.implicits._
    val sk = Seq(
      ("a", 0L, Seq(10L, 20L, 30L)),   // bucket 0: both types
      ("b", 0L, Seq(20L, 40L)),
      ("a", 1L, Seq(5L, 6L))           // bucket 1: type b emitted NOTHING
    ).toDF("eventType", "bucket", "mins")
    val alg = StreamingKmv.setAlgebra(sk, "a", "b", K)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(alg.map(_._1).toSeq == Seq(0L, 1L), "one-sided window must still emit")
    val b1 = alg.find(_._1 == 1L).get
    // (bucket, theta, n_union, n_inter, est_union, est_inter, est_anotb, jaccard)
    assert(b1._2 == 268435456L, "unsaturated sketches -> theta = 2^28")
    assert(b1._4 == 0L && b1._6 == 0L, "empty B side -> zero intersection")
    assert(b1._3 == 2L && b1._5 == 2L, "union of a one-sided window = est(A), exact when unsaturated")
  }
}
