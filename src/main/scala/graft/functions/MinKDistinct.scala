package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded DISTINCT min-k as a typed UDAF — the KMV (k-minimum-values)
  * distinct sketch's state. Each partition reduces to at most k sorted
  * distinct hash values BEFORE the exchange, and merging two sketches is
  * min-k of the union — the mergeability that lets a 100 TB distinct-count
  * run as a pure partial aggregation with k longs of state per group,
  * instead of a full distinct shuffle.
  *
  * Because the hash is deterministic (md5-derived), the sketch content —
  * and therefore the KMV estimate — is independent of partitioning and
  * arrival order, which is what makes an APPROXIMATE sketch exactly
  * reproducible by a SQL oracle (q90).
  */
object MinKDistinct {

  case class Buf(items: Seq[Long])

  class MinK(k: Int) extends Aggregator[Long, Buf, Seq[Long]] {
    require(k > 0, "k must be positive")

    private def insert(items: Seq[Long], x: Long): Seq[Long] = {
      if (items.contains(x)) items
      else {
        val merged = (items :+ x).sorted
        if (merged.length > k) merged.take(k) else merged
      }
    }

    override def zero: Buf = Buf(Nil)
    override def reduce(b: Buf, x: Long): Buf =
      // hot path: a full sketch ignores anything >= its current maximum
      if (b.items.length == k && x >= b.items.last) b else Buf(insert(b.items, x))
    override def merge(b1: Buf, b2: Buf): Buf =
      Buf(b2.items.foldLeft(b1.items)((acc, x) =>
        if (acc.length == k && x >= acc.last) acc else insert(acc, x)))
    override def finish(r: Buf): Seq[Long] = r.items
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
