package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.metrics.Fanout

/** SURVEY §3.2 at catalog width: diagnosing 1,000 tables is ONE plan whose
  * shuffle structure is IDENTICAL to diagnosing 10 — table is a grouping
  * key, not a scheduling unit (the reference's per-table thread pool
  * becomes a no-op dimension here). */
class FanoutSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def exchanges(n: Int): Int = {
    val plan = Fanout.run(spark, n).queryExecution.executedPlan.toString
    "(?m)^.*Exchange".r.findAllIn(plan).size
  }

  test("shuffle count is independent of table count (10 vs 1000 vs 10000 tables)") {
    val e10 = exchanges(10)
    val e1000 = exchanges(1000)
    val e10000 = exchanges(10000)
    assert(e10 == e1000, s"plan shape changed with table count: $e10 vs $e1000")
    assert(e10 == e10000, s"plan shape changed at 10k tables: $e10 vs $e10000")
  }

  test("10000 tables produce 10000 metric rows from one job") {
    // an order of magnitude past the flagship width: 640k generated file
    // entries, same two exchanges, still one job
    assert(Fanout.run(spark, 10000).count() == 10000L)
  }

  test("1000 tables produce 1000 metric rows from one job, values sane") {
    val wide = Fanout.run(spark, 1000).cache()
    try {
      assert(wide.count() == 1000L)
      val w = wide.filter(_.table == "tbl_00042").collect().head
      // 64 files, 16 partitions, 2% deletes: shape invariants of the corpus
      assert(w.fileCountBefore == 64L)
      assert(w.totalPartitions == 16L)
      assert(w.avgFileSize > 0.0 && w.totalTableSize > 0L)
      assert(w.fileCountAfter < w.fileCountBefore) // compaction finds work
    } finally wide.unpersist(blocking = false)
  }
}
