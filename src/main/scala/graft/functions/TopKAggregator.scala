package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed UDAF (SURVEY §2.11's `Aggregator` surface).
  *
  * Top-k-per-group via `row_number().over(Window)` SHUFFLES AND SORTS every
  * row of every group; this aggregator keeps a k-bounded buffer, so the
  * partial (map-side) aggregate already reduces each partition to k rows per
  * group before the exchange — the shape that survives groups with millions
  * of rows. Ranking: value desc, tiebreak asc (deterministic, matches the
  * engine's window-based q9).
  */
object TopKAggregator {

  case class In(value: Double, tiebreak: Long)
  case class Buf(items: Seq[In])

  /** items in rank order (value desc, tiebreak asc), length <= k. */
  private def insert(items: Seq[In], x: In, k: Int): Seq[In] = {
    val merged = (items :+ x).sortBy(i => (-i.value, i.tiebreak))
    if (merged.length > k) merged.take(k) else merged
  }

  class TopK(k: Int) extends Aggregator[In, Buf, Seq[In]] {
    require(k > 0, "k must be positive")
    override def zero: Buf = Buf(Nil)
    override def reduce(b: Buf, a: In): Buf =
      // skip insertion when x can't displace the current k-th (hot path)
      if (b.items.length == k && {
        val last = b.items.last
        a.value < last.value || (a.value == last.value && a.tiebreak > last.tiebreak)
      }) b
      else Buf(insert(b.items, a, k))
    override def merge(b1: Buf, b2: Buf): Buf =
      Buf(b2.items.foldLeft(b1.items)((acc, x) => insert(acc, x, k)))
    override def finish(r: Buf): Seq[In] = r.items
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[In]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[In]]()
  }
}
