package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC upsert — the streaming twin of batch q76 /
  * [[graft.operators.CdcOps.latestWins]]: a change log flows in as a
  * stream; state per key is the current latest-wins winner, and every
  * micro-batch emits the keys whose state changed (an Update-mode
  * changelog of the merged table).
  *
  * State per key is exactly the batch row the merge would keep: (version,
  * op, price) — O(1) per key forever, which is the same state a MERGE sink
  * maintains. Same-version ties prefer the delete, mirroring the batch
  * tie-break. A late change with a LOWER version than the state is ignored
  * (latest-wins is order-insensitive — the reason batch replay and the
  * stream agree regardless of micro-batch boundaries).
  *
  * Deletes stay in state as tombstones (op = "D") so a later lower-version
  * upsert cannot resurrect the row — the standard changelog-compaction
  * semantics; a production sink would age tombstones out with a timeout.
  */
object StreamingUpsert {

  case class Change(k: Long, version: Long, op: String, price: Double)
  /** Emitted record: the key's current merged state (alive = not deleted). */
  case class Upserted(k: Long, version: Long, alive: Boolean, price: Double)

  def upsert(changes: Dataset[Change]): Dataset[Upserted] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(mergeGroup)
  }

  /** Batch-replay reference: fold a full log through the same transition
    * as the stream, one change at a time (spec uses this for parity). */
  def replay(log: Seq[Change]): Map[Long, Upserted] =
    log.groupBy(_.k).map { case (k, cs) =>
      val w = cs.foldLeft(Option.empty[Change])((st, c) => Some(better(st, c)))
      k -> toUpserted(w.get)
    }

  private def better(st: Option[Change], c: Change): Change = st match {
    case None => c
    case Some(s) =>
      // higher version wins; same version: delete beats upsert
      if (c.version > s.version) c
      else if (c.version == s.version && c.op == "D" && s.op != "D") c
      else s
  }

  private def toUpserted(c: Change): Upserted =
    Upserted(c.k, c.version, c.op != "D", if (c.op == "D") 0.0 else c.price)

  private def mergeGroup(
      k: Long,
      changes: Iterator[Change],
      state: GroupState[Change]): Iterator[Upserted] = {
    val before = state.getOption
    val after = changes.foldLeft(before)((st, c) => Some(better(st, c)))
    after match {
      case Some(w) if before.contains(w) => Iterator.empty // no change, emit nothing
      case Some(w) => state.update(w); Iterator.single(toUpserted(w))
      case None => Iterator.empty
    }
  }
}
