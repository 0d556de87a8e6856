package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{PartitionTransforms => PT}

/** The public Iceberg spec's partition transforms, pinned two ways:
  * the spec's own Appendix-B test vectors against the scalar forms, and
  * ScalaCheck parity between the scalar forms and the codegen'd Column
  * forms (the native [[graft.sources.IcebergHashLong]] kernel + the
  * arithmetic day/truncate columns) — so the distributed derivation can
  * never drift from the spec values the fixture writers use. */
class PartitionTransformsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  // ---- Appendix B "32-bit Hash Requirements" published vectors ----

  test("murmur3 spec vectors: int/long 34, string 'iceberg', date 17486") {
    // ints hash as 8-byte longs, so int 34 and long 34 agree (spec table)
    assert(PT.hashLong(34L) == 2017239379)
    assert(PT.hashString("iceberg") == 1210000089)
    // the spec's date example: 2017-11-16 = 17486 days from epoch
    assert(PT.hashLong(17486L) == -653330422)
  }

  test("day transform: spec timestamp example + floor semantics pre-1970") {
    // 2017-11-16T22:31:08 UTC in micros lands on day 17486
    assert(PT.dayFromMicros(1510871468000000L) == 17486)
    assert(PT.dayFromMicros(0L) == 0)
    // floor division: one micro before the epoch is the PREVIOUS day
    assert(PT.dayFromMicros(-1L) == -1)
  }

  test("truncate: integers floor toward -inf, strings count code points") {
    assert(PT.truncateLong(1L, 10L) == 0L)
    assert(PT.truncateLong(-1L, 10L) == -10L) // spec: truncate[10](-1) = -10
    assert(PT.truncateLong(2147483647L, 100L) == 2147483600L)
    assert(PT.truncateString("iceberg", 3) == "ice")
    assert(PT.truncateString("ab", 5) == "ab")
    // a surrogate pair is ONE code point (spec requirement): U+1F600
    val emoji = new String(Character.toChars(0x1F600))
    assert(PT.truncateString("a" + emoji + "b", 2) == "a" + emoji)
  }

  test("bucket: non-negative ordinal in [0, N) via the masked hash") {
    assert(PT.bucketLong(34L, 16) == ((2017239379 & Int.MaxValue) % 16))
    assert(PT.bucketString("iceberg", 16) == ((1210000089 & Int.MaxValue) % 16))
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val v = rnd.nextLong(); val n = 1 + rnd.nextInt(64)
      val b = PT.bucketLong(v, n)
      assert(b >= 0 && b < n, s"bucket($v, $n) = $b")
    }
  }

  test("hour/month/year: spec example ordinals + floor semantics pre-1970") {
    // 2017-11-16T22:31:08 UTC: hour = 17486*24 + 22, month = 574, year = 47
    val us = 1510871468000000L
    assert(PT.hourFromMicros(us) == 17486 * 24 + 22)
    assert(PT.monthFromMicros(us) == (2017 - 1970) * 12 + 10)
    assert(PT.yearFromMicros(us) == 47)
    assert(PT.hourFromMicros(0L) == 0 && PT.monthFromMicros(0L) == 0 &&
      PT.yearFromMicros(0L) == 0)
    // floor: one micro before the epoch is the previous hour/month/year
    assert(PT.hourFromMicros(-1L) == -1)
    assert(PT.monthFromMicros(-1L) == -1)
    assert(PT.yearFromMicros(-1L) == -1)
  }

  // ---- Column forms == scalar forms (codegen parity) ----

  test("hashLongCol (native kernel) matches the scalar on arbitrary longs") {
    import spark.implicits._
    val vs = Seq(34L, 17486L, 0L, -1L, Long.MaxValue, Long.MinValue, 42L,
      -9876543210L, 1510871468000000L) ++
      (1 to 50).map(i => i * 2654435761L - 77L * i * i)
    val got = vs.toDF("v").select(col("v"), PT.hashLongCol(col("v")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vs.foreach(v => assert(got(v) == PT.hashLong(v), s"hash($v)"))
  }

  test("bucketLongCol / truncateLongCol / dayCol match scalars") {
    import spark.implicits._
    val vs = Seq(0L, 1L, -1L, 149L, 1499L, 2147483647L, -2147483648L, 34L)
    val rows = vs.toDF("v").select(col("v"),
        PT.bucketLongCol(col("v"), 8).as("b"),
        PT.truncateLongCol(col("v"), 100L).as("t"))
      .collect()
    rows.foreach { r =>
      val v = r.getLong(0)
      assert(r.getInt(1) == PT.bucketLong(v, 8), s"bucket($v)")
      assert(r.getLong(2) == PT.truncateLong(v, 100L), s"truncate($v)")
    }
    // dayCol over timestamps == dayFromMicros over their micros (UTC)
    val micros = Seq(0L, 1510871468000000L, 86399999999L, 86400000000L,
      1704067200000000L, -1L)
    val days = micros.toDF("us")
      .select(col("us"), PT.dayCol(timestamp_micros(col("us"))).as("d"))
      .collect()
    days.foreach { r =>
      assert(r.getInt(1) == PT.dayFromMicros(r.getLong(0)), s"day(${r.getLong(0)})")
    }
  }

  test("hourCol / monthCol / yearCol match scalars over timestamps (UTC)") {
    import spark.implicits._
    val micros = Seq(0L, 1510871468000000L, 86399999999L, 86400000000L,
      1704067200000000L, 2678400000000L /* 1970-02-01 */, 31535999999999L,
      31536000000000L /* 1971-01-01 */, -1L)
    val rows = micros.toDF("us")
      .select(col("us"),
        PT.hourCol(timestamp_micros(col("us"))).as("h"),
        PT.monthCol(timestamp_micros(col("us"))).as("m"),
        PT.yearCol(timestamp_micros(col("us"))).as("y"))
      .collect()
    rows.foreach { r =>
      val us = r.getLong(0)
      assert(r.getInt(1) == PT.hourFromMicros(us), s"hour($us)")
      assert(r.getInt(2) == PT.monthFromMicros(us), s"month($us)")
      assert(r.getInt(3) == PT.yearFromMicros(us), s"year($us)")
    }
  }
}
