package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: the gates the round harness relies on.
  * Catching a violation here is a failed test; catching it in the driver
  * is a silently weaker round. */
class ContractSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("every oracle key names a query; every query has an oracle") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"orphan oracles: ${o -- q}")
    assert((q -- o).isEmpty,
      s"queries without oracles: ${q -- o} (zero exemptions — q35 went " +
        "fully deterministic in round 6)")
  }

  test("query names are unique across files (no later-map shadowing)") {
    import graft.operators._
    val maps = Seq(Queries.all, TextQueries.all, Queries2.all, Queries3.all,
      Queries4.all, Queries5.all, Queries6.all, Queries7.all, Queries8.all,
      Queries9.all, Queries10.all, Queries11.all, Queries12.all, Queries13.all,
      Queries14.all, Queries15.all, Queries16.all, Queries17.all,
      Queries18.all)
    val names = maps.flatMap(_.keys)
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"query registered twice (one shadows the other): $dupes")
    assert(names.size == SparkEntry.queries.size)
  }

  test("entry (driver smoke check) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("no oracle contains control characters that would break the JSON dump") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.exists(c => c < ' ' && c != '\n'),
        s"$k: oracle contains a control char other than newline")
    }
  }
}
