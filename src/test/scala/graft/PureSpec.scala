package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Pure
import graft.model.EngineConfig

/** Format + cost + bin-pack goldens ported from the reference's test intent
  * (`tests/test_table_metric.py`, `tests/test_metric_calculator.py`) — values
  * re-derived, not copied. */
class PureSpec extends AnyFunSuite {

  /** Seeded pseudo-property check: `n` random size lists. */
  private def forAllSizeLists(n: Int, maxLen: Int, maxSize: Long)(f: List[Long] => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    (1 to n).foreach { _ =>
      val len = rnd.nextInt(maxLen + 1)
      f(List.fill(len)(math.abs(rnd.nextLong()) % (maxSize + 1)))
    }
  }

  test("formatDuration goldens") {
    assert(Pure.formatDuration(5500) == "5.5s")
    assert(Pure.formatDuration(9) == "<0.01s")
    assert(Pure.formatDuration(3600000) == "1h 0m 0s")
    assert(Pure.formatDuration(125000) == "2m 5s")
    assert(Pure.formatDuration(0) == "0s")
    assert(Pure.formatDuration(10) == "0.01s")
    assert(Pure.formatDuration(1810) == "1.81s")
    assert(Pure.formatDuration(180) == "0.18s")
    assert(Pure.formatDuration(59999) == "60s") // 59.999 -> "60.00" -> "60s"
    assert(Pure.formatDuration(3661000) == "1h 1m 1s")
    assert(Pure.formatDuration(7325000) == "2h 2m 5s")
  }

  test("formatSize goldens") {
    assert(Pure.formatSize(1234) == "1.21 KB")
    assert(Pure.formatSize(1099511627776.0) == "1.00 TB")
    assert(Pure.formatSize(0) == "0.00 B")
    assert(Pure.formatSize(1023) == "1023.00 B")
    assert(Pure.formatSize(1024) == "1.00 KB")
    assert(Pure.formatSize(1048576) == "1.00 MB")
    assert(Pure.formatSize(5l * 1024 * 1024 * 1024) == "5.00 GB")
    assert(Pure.formatSize(1024.0 * 1024 * 1024 * 1024 * 1024 * 1024) == "1024.00 PB")
  }

  test("improvement edge lattice") {
    assert(Pure.improvement(0, Some(0)) == Some(0.0))
    assert(Pure.improvement(0, Some(5)) == Some(Double.PositiveInfinity))
    assert(Pure.improvement(100, None).isEmpty)
    assert(Pure.improvement(100, Some(50)) == Some(50.0))
    assert(Pure.improvement(100, Some(150)) == Some(-50.0))
    assert(Pure.formatImprovement(0, Some(0), displayImprovement = true, isDuration = false) == "0.00%")
    assert(Pure.formatImprovement(100, None, displayImprovement = true, isDuration = false) == "")
    assert(Pure.formatImprovement(100, Some(50), displayImprovement = false, isDuration = false) == "")
    // duration noise floor: both < 10 ms -> 0.00% regardless of real ratio
    assert(Pure.formatImprovement(9, Some(1), displayImprovement = true, isDuration = true) == "0.00%")
    assert(Pure.formatImprovement(900, Some(9), displayImprovement = true, isDuration = true) == "99.00%")
    assert(Pure.formatImprovement(1810, Some(180), displayImprovement = true, isDuration = true) == "90.06%")
  }

  test("readFileCost") {
    val mib = 1024L * 1024
    assert(Pure.readFileCost(0) == 2)
    assert(Pure.readFileCost(32 * mib - 1) == 2)
    assert(Pure.readFileCost(32 * mib) == 3)
    assert(Pure.readFileCost(100 * mib) == 5) // 100//32=3, +2
  }

  test("bin-packer golden semantics: overshoot, not capacity") {
    val cap = 100L
    // running total must STRICTLY exceed cap before a close happens
    assert(Pure.buildPartitionGroups(Seq(60, 50), cap) == Vector(Vector(50, 60)))
    // 50+60=110 > 100, so third file opens a new group
    assert(Pure.buildPartitionGroups(Seq(60, 50, 10), cap) == Vector(Vector(10, 50, 60)))
    assert(Pure.buildPartitionGroups(Seq(60, 60, 50), cap) == Vector(Vector(50, 60), Vector(60)))
    // single file over the cap still joins the (empty) current group
    assert(Pure.buildPartitionGroups(Seq(1000), cap) == Vector(Vector(1000)))
    assert(Pure.buildPartitionGroups(Seq(1000, 1), cap) == Vector(Vector(1, 1000)))
    // exactly-at-cap does NOT close (strict >)
    assert(Pure.buildPartitionGroups(Seq(100, 5), cap) == Vector(Vector(5, 100)))
    assert(Pure.buildPartitionGroups(Nil, cap) == Vector())
  }

  test("packStats matches buildPartitionGroups") {
    val cfg = EngineConfig(fetchSize = 10, maxGroupBytes = 100, msPerScan = 1)
    forAllSizeLists(500, 40, 500L) { sizes =>
      val groups = Pure.buildPartitionGroups(sizes, cfg.maxGroupBytes)
      val (n, cost) = Pure.packStats(sizes.sorted.iterator, cfg)
      assert(n == groups.length)
      assert(cost == groups.map(g => Pure.readFileCost(g.sum, cfg.fetchSize)).sum * cfg.msPerScan)
    }
  }

  test("bin-packer properties") {
    val cap = 750L * 1024 * 1024
    forAllSizeLists(300, 60, 2000L * 1024 * 1024) { sizes =>
      val groups = Pure.buildPartitionGroups(sizes, cap)
      // partition of input
      assert(groups.flatten.sorted == sizes.sorted)
      // every NON-final group total strictly exceeds the cap (overshoot close)
      groups.dropRight(1).foreach(g => assert(g.sum > cap))
      // groups are each sorted ascending (input sorted, scanned in order)
      groups.foreach(g => assert(g == g.sorted))
      assert(groups.length <= math.max(sizes.length, 1))
    }
  }

  test("glob matching") {
    assert(Pure.globMatch("*", "anything"))
    assert(Pure.globMatch("tbl_*", "tbl_a"))
    assert(!Pure.globMatch("tbl_*", "xtbl_a"))
    assert(Pure.globMatch("t?l", "tbl"))
    assert(Pure.globMatch("t[ab]l", "tal"))
    assert(!Pure.globMatch("t[!ab]l", "tal"))
    assert(Pure.globMatch("a.b", "a.b"))
    assert(!Pure.globMatch("a.b", "aXb"))
    // fnmatch edge: ']' as first class member is a literal
    assert(Pure.globMatch("t[]a]l", "t]l"))
    assert(Pure.globMatch("t[]a]l", "tal"))
    assert(!Pure.globMatch("t[]a]l", "tbl"))
    assert(Pure.globMatch("t[!]a]l", "tbl"))
    assert(!Pure.globMatch("t[!]a]l", "t]l"))
    // leading '^' in a non-negated class is a literal per fnmatch
    assert(Pure.globMatch("[^a]", "^"))
    assert(Pure.globMatch("[^a]", "a"))
    assert(!Pure.globMatch("[^a]", "b"))
    // '&&' must not become Java regex class intersection
    assert(Pure.globMatch("[a&b]", "&"))
    assert(Pure.globMatch("[a&b]", "a"))
  }
}
