package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.MorRead

/** Iceberg v2 merge-on-read visibility rules, pinned at the boundaries:
  * position deletes apply at data_seq <= delete_seq (same-commit deletion
  * WORKS), equality deletes apply at data_seq < delete_seq (same-commit
  * rows SURVIVE). */
class MorReadSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def fixture() = {
    import spark.implicits._
    // (file_path, pos, data_seq, id, v)
    val data = Seq(
      ("f1", 0L, 1L, 10L, "a"),
      ("f1", 1L, 1L, 11L, "b"),
      ("f2", 0L, 2L, 12L, "c"),
      ("f2", 1L, 2L, 10L, "a2"), // same key as id=10, newer commit
      ("f3", 0L, 3L, 13L, "d")
    ).toDF("file_path", "pos", "data_seq", "id", "v")
    // position tombstones: one exact hit at EQUAL seq (must delete),
    // one at OLDER delete seq than the data (must NOT delete)
    val posDel = Seq(
      ("f1", 0L, 1L), // seq == data_seq -> deletes (f1,0)
      ("f3", 0L, 2L)  // delete seq 2 < data_seq 3 -> survives
    ).toDF("file_path", "pos", "seq")
    // equality tombstones on id: seq 2 deletes id=10 rows with seq < 2
    // (the seq-1 original dies, the seq-2 rewrite SURVIVES — the spec's
    // same-commit asymmetry), and seq 3 deletes id=11 (seq 1)
    val eqDel = Seq((10L, 2L), (11L, 3L)).toDF("id", "seq")
    (data, posDel, eqDel)
  }

  test("position deletes apply at <=, equality deletes at <; survivors exact") {
    val (data, posDel, eqDel) = fixture()
    val out = MorRead.applyDeletes(data, posDel, eqDel, Seq("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getString(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out == Seq(
      ("f2", 0L, 12L, "c"),   // untouched
      ("f2", 1L, 10L, "a2"),  // eq-delete seq 2 does NOT kill seq-2 row
      ("f3", 0L, 13L, "d")))  // pos delete with older seq does not apply
    // and the casualties are exactly (f1,0) [pos, seq ==] and (f1,1) [eq 11]
  }

  test("NULL-keyed equality tombstone deletes NULL-keyed rows (null-safe match)") {
    import spark.implicits._
    val data = Seq(
      ("f1", 0L, 1L, Option(7L), "x"),
      ("f1", 1L, 1L, Option.empty[Long], "nullkey")
    ).toDF("file_path", "pos", "data_seq", "id", "v")
    val noPos = Seq.empty[(String, Long, Long)].toDF("file_path", "pos", "seq")
    val eqDel = Seq((Option.empty[Long], 2L)).toDF("id", "seq")
    val out = MorRead.applyDeletes(data, noPos, eqDel, Seq("id"))
      .collect().map(_.getString(4)).toSeq
    assert(out == Seq("x"), "the NULL-keyed row must be deleted, the 7-keyed kept")
  }

  test("empty eqKeys -> position-only read, no crash") {
    import spark.implicits._
    val (data, posDel, _) = fixture()
    val emptyEq = Seq.empty[(Long, Long)].toDF("id", "seq")
    val out = MorRead.applyDeletes(data, posDel, emptyEq, Seq.empty)
    assert(out.count() == 4L) // only the (f1,0) position casualty
  }

  test("no deletes -> identity (empty tombstones fold to a plain scan)") {
    import spark.implicits._
    val (data, _, _) = fixture()
    val emptyPos = Seq.empty[(String, Long, Long)].toDF("file_path", "pos", "seq")
    val emptyEq = Seq.empty[(Long, Long)].toDF("id", "seq")
    val out = MorRead.applyDeletes(data, emptyPos, emptyEq, Seq("id"))
    assert(out.count() == 5L)
    // PropagateEmptyRelation elides both anti joins entirely — the
    // no-tombstone read costs exactly a scan
    assert(!out.queryExecution.executedPlan.toString.contains("Join"))
  }

  test("with tombstones: both applications are broadcast anti joins, no shuffle") {
    val (data, posDel, eqDel) = fixture()
    val plan = MorRead.applyDeletes(data, posDel, eqDel, Seq("id"))
      .queryExecution.executedPlan.toString
    assert("LeftAnti".r.findAllIn(plan).size == 2, s"expected 2 anti joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"delete application must broadcast:\n$plan")
  }
}
