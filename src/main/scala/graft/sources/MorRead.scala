package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Merge-on-read delete application — the Iceberg v2 read-path semantics
  * (public spec, "Row-level deletes"): a data row survives a snapshot iff
  * no delete file visible to it marks it deleted, where visibility is
  * sequence-number-based and DIFFERS by delete kind:
  *
  *   - POSITION deletes target a concrete (file_path, pos) and apply to
  *     data sequence numbers <= the delete's sequence number (a position
  *     delete written in the same commit as the data file CAN delete
  *     from it);
  *   - EQUALITY deletes target a key tuple and apply STRICTLY BELOW the
  *     delete's sequence number (an equality delete never deletes rows
  *     committed with it — that asymmetry is the spec's, not ours).
  *
  * Both applications are LEFT ANTI joins with the sequence predicate in
  * the join condition — delete files are tiny relative to data (they are
  * the tombstones, not the corpus), so both anti joins broadcast; the
  * data side streams through map-side with no shuffle. MorReadSpec pins
  * the two boundary asymmetries (seq ==) on a hand-built fixture.
  */
object MorRead {

  /** @param data      data rows carrying `file_path`, `pos`, `data_seq`,
    *                   plus payload columns
    * @param posDeletes (file_path, pos, seq) tombstones
    * @param eqDeletes  (seq + the key columns named in `eqKeys`)
    * @return surviving data rows, original schema */
  def applyDeletes(
      data: DataFrame,
      posDeletes: DataFrame,
      eqDeletes: DataFrame,
      eqKeys: Seq[String]): DataFrame = {
    val afterPos = data.join(
      broadcast(posDeletes.select(col("file_path").as("pd_file"),
        col("pos").as("pd_pos"), col("seq").as("pd_seq"))),
      col("file_path") === col("pd_file") && col("pos") === col("pd_pos")
        && col("data_seq") <= col("pd_seq"),
      "left_anti")
    if (eqKeys.isEmpty) afterPos // no equality-delete key spec: pos-only read
    else {
      val ed = eqDeletes.select(
        (col("seq").as("ed_seq") +: eqKeys.map(k => col(k).as(s"ed_$k"))): _*)
      afterPos.join(
        broadcast(ed),
        // null-SAFE equality: Iceberg equality-delete matching treats
        // null as equal to null (a NULL-keyed tombstone deletes NULL rows)
        eqKeys.map(k => col(k) <=> col(s"ed_$k"))
          .reduce(_ && _) && col("data_seq") < col("ed_seq"),
        "left_anti")
    }
  }
}
