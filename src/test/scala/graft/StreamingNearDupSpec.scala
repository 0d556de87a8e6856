package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingNearDup
import graft.streaming.StreamingNearDup.{Candidate, Doc}
import graft.operators.TextOps

/** Streaming LSH near-dup: the set of docs FLAGGED as near-duplicates of an
  * earlier doc must equal the batch q22 pipeline's verdict on the same
  * corpus, independent of micro-batch splits. */
class StreamingNearDupSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  private val P = graft.operators.DedupCorpus.P
  private val A = graft.operators.DedupCorpus.A
  private val B = graft.operators.DedupCorpus.B

  test("streaming flagged set == batch LSH candidates, across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // twinned corpus, arrival order = doc_id (originals first, then twins)
    val corpus = graft.operators.DedupCorpus.corpus(dir)(spark)
      .orderBy("doc_id").collect()
      .map(r => Doc(r.getLong(0), r.getString(1), r.getLong(0)))
    val input = MemoryStream[Doc]
    val q = StreamingNearDup.candidates(input.toDS(), A.zip(B), P, rowsPerBand = 4)
      .writeStream.format("memory").queryName("neardup").outputMode("append").start()
    try {
      // split mid-corpus: anchors from batch 1 must persist into batch 2
      val (first, second) = corpus.splitAt(corpus.length / 2)
      input.addData(first.toIndexedSeq: _*); q.processAllAvailable()
      input.addData(second.toIndexedSeq: _*); q.processAllAvailable()
      val streamed = spark.table("neardup").as[Candidate].collect()
      // streaming flags a doc when an earlier doc shares a band; ts order ==
      // doc_id order here, so batch-flagged = the pair's HIGHER id
      val streamFlagged = streamed.map(_.doc_id).toSet
      val batchPairs = TextOps.lshCandidatePairs(
        TextOps.minhashSignatures(
          graft.operators.DedupCorpus.corpus(dir)(spark), "doc_id", "text", A.zip(B), P),
        "doc_id", nPerms = A.size, rowsPerBand = 4)
        .as[(Long, Long)].collect()
      val batchFlagged = batchPairs.map(_._2).toSet
      assert(streamFlagged == batchFlagged,
        s"stream-only=${(streamFlagged -- batchFlagged).take(5)} batch-only=${(batchFlagged -- streamFlagged).take(5)}")
      // anchors are always earlier than the docs they flag
      streamed.foreach(c => assert(c.anchor_doc < c.doc_id))
      // the fixture's twins guarantee a non-trivial result
      assert(streamFlagged.nonEmpty)
    } finally q.stop()
  }
}
