package graft.streaming

import org.apache.spark.sql.{Dataset, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming NEAR-dup detection — the streaming twin of the batch LSH
  * pipeline (q21 signatures → q22 band-bucket candidates): documents flow
  * in, each gets its minhash signature as a pure projection (the
  * [[graft.functions.MinHashSig]] kernel — no shuffle), band keys explode,
  * and per-band state remembers the FIRST document seen; every later
  * arrival in the same bucket is emitted as a candidate near-duplicate of
  * that anchor.
  *
  * Batch-parity shape: the batch q22 emits the full CLIQUE of same-band
  * pairs; the stream emits the STAR (anchor, later) — exactly the pairs a
  * dedup sink needs to drop later copies, and the set of *flagged* docs
  * (those with at least one earlier bucket-mate) is identical to batch.
  * State per band key is one long, forever — production deployments bound
  * the key domain with an event-time timeout (the `ttl` hook below);
  * NoTimeout keeps the spec deterministic.
  */
object StreamingNearDup {

  case class Doc(doc_id: Long, text: String, ts_us: Long)
  /** A later document (`doc_id`) landing in an anchor's band bucket. */
  case class Candidate(band_key: String, anchor_doc: Long, doc_id: Long)

  /** Band-key rows for one micro-batch of docs: (band_key, doc_id, ts_us).
    * Same key construction as [[graft.operators.TextOps.lshCandidatePairs]]:
    * band index folded into the key with `rowsPerBand` consecutive minhash
    * values. */
  def bandKeys(docs: Dataset[Doc], perms: Seq[(Long, Long)], p: Long,
      rowsPerBand: Int): DataFrame = {
    require(perms.size % rowsPerBand == 0, "perms must divide into bands")
    val nBands = perms.size / rowsPerBand
    val sig = graft.functions.TextHashExprs.minhashSig(
      split(col("text"), lit(" ")), perms, p)
    val withSig = docs.toDF().withColumn("__sig", sig).filter(col("__sig").isNotNull)
    val keys = (0 until nBands).map { b =>
      val parts = lit(s"$b") +:
        (b * rowsPerBand until (b + 1) * rowsPerBand).map(j =>
          element_at(col("__sig"), j + 1))
      concat_ws("_", parts: _*)
    }
    withSig.select(col("doc_id"), col("ts_us"), explode(array(keys: _*)).as("band_key"))
  }

  def candidates(docs: Dataset[Doc], perms: Seq[(Long, Long)],
      p: Long = 2147483647L, rowsPerBand: Int = 4): Dataset[Candidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    bandKeys(docs, perms, p, rowsPerBand)
      .as[(Long, Long, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(anchorGroup)
  }

  private def anchorGroup(
      bandKey: String,
      rows: Iterator[(Long, Long, String)],
      state: GroupState[Long]): Iterator[Candidate] = {
    // within a micro-batch, process in (ts_us, doc_id) order so the anchor
    // is deterministic regardless of partitioning
    val sorted = rows.toSeq.sortBy(r => (r._2, r._1))
    var anchor = state.getOption.getOrElse(-1L)
    val out = Vector.newBuilder[Candidate]
    for ((docId, _, _) <- sorted) {
      if (anchor < 0) { anchor = docId; state.update(anchor) }
      else if (docId != anchor) out += Candidate(bandKey, anchor, docId)
    }
    out.result().iterator
  }
}
