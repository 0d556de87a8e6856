package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming training-sequence packing — the streaming twin of batch q82:
  * documents arrive per language in doc_id order and are packed first-fit
  * into token-budget sequences; a sequence is emitted the moment the next
  * document would overflow it (close-before-overflow, exactly the batch
  * discipline).
  *
  * State per language is ONE open bin (seq counter, doc count, token sum) —
  * O(languages), constant per key, no watermark needed. Because packing is
  * order-defined, parity with batch q82 holds when documents arrive in
  * (lang, doc_id) order (the spec's setup); out-of-order arrival packs in
  * arrival order — the standard online semantics, same as the batch run
  * over a differently-sorted corpus. The final open bin per language stays
  * in state until the stream closes (emit it with a terminal flush batch,
  * or on timeout in a production pipeline).
  */
object StreamingPacker {

  case class Doc(lang: String, doc_id: Long, tok: Long)
  case class OpenBin(seq: Long, nDocs: Long, nTokens: Long)
  case class PackedSeq(lang: String, seq_id: Long, n_docs: Long, n_tokens: Long)

  val Budget = 256L

  def pack(docs: Dataset[Doc]): Dataset[PackedSeq] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .groupByKey(_.lang)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (lang: String, batch: Iterator[Doc], state: GroupState[OpenBin]) =>
          var bin = state.getOption.getOrElse(OpenBin(1L, 0L, 0L))
          val out = Vector.newBuilder[PackedSeq]
          // within a micro-batch, pack in doc_id order (batch-twin parity)
          for (d <- batch.toSeq.sortBy(_.doc_id)) {
            if (bin.nDocs > 0 && bin.nTokens + d.tok > Budget) {
              out += PackedSeq(lang, bin.seq, bin.nDocs, bin.nTokens)
              bin = OpenBin(bin.seq + 1, 0L, 0L)
            }
            bin = OpenBin(bin.seq, bin.nDocs + 1, bin.nTokens + d.tok)
          }
          state.update(bin)
          out.result().iterator
      }
  }
}
