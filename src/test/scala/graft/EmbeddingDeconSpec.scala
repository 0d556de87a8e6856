package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.EmbeddingDecon

/** The embedding-decontamination scorer's two physical arms — plan
  * LITERALS under the benchmark-size ceiling, BROADCAST join past it —
  * must agree row-for-row (same dot expression, same doubles, max is
  * pure selection), and the dispatch boundary must sit exactly at
  * [[EmbeddingDecon.MaxLiteralBenchmark]]. */
class EmbeddingDeconSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def corpus(n: Int, dim: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (0 until n).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextGaussian()))).toDF("vec_id", "v")
  }

  private def bench(n: Int, dim: Int): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    (0 until n).map { _ =>
      val b = Array.fill(dim)(rnd.nextGaussian())
      val nrm = math.sqrt(b.map(x => x * x).sum)
      b.map(_ / nrm)
    }
  }

  test("dispatch boundary: literal at the ceiling, broadcast one past it") {
    assert(EmbeddingDecon.armFor(1) == "literal")
    assert(EmbeddingDecon.armFor(EmbeddingDecon.MaxLiteralBenchmark)
      == "literal")
    assert(EmbeddingDecon.armFor(EmbeddingDecon.MaxLiteralBenchmark + 1)
      == "broadcast")
  }

  test("literal arm == broadcast arm, row for row (IEEE-exact)") {
    val c = corpus(500, 16).cache()
    val b = bench(12, 16)
    def scoresOf(arm: String): Seq[(Long, Double)] =
      EmbeddingDecon.maxCosine(c, "vec_id", "v", b, forceArm = Some(arm))
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
        .sortBy(_._1).toSeq
    val lit = scoresOf("literal")
    val bc = scoresOf("broadcast")
    assert(lit.length == 500 && bc.length == 500)
    assert(lit == bc, // exact equality, not tolerance — the arm contract
      s"arms disagree: ${lit.zip(bc).filter(p => p._1 != p._2).take(3)}")
  }

  test("duplicate corpus ids: both arms emit one row PER CORPUS ROW") {
    import spark.implicits._
    val b = bench(4, 8)
    val v1 = Seq.fill(8)(0.5); val v2 = Seq.fill(8)(-0.25)
    val c = Seq((7L, v1), (7L, v2), (9L, v1)).toDF("vec_id", "v")
    Seq("literal", "broadcast").foreach { arm =>
      val rows = EmbeddingDecon
        .maxCosine(c, "vec_id", "v", b, forceArm = Some(arm))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(rows.length == 3, s"$arm collapsed duplicate ids: $rows")
      assert(rows.count(_._1 == 7L) == 2, s"$arm: $rows")
    }
  }

  test("broadcast arm handles a benchmark past the literal ceiling") {
    val c = corpus(50, 8)
    val big = bench(EmbeddingDecon.MaxLiteralBenchmark + 10, 8)
    // production dispatch (no forceArm) must route to broadcast and score
    val out = EmbeddingDecon.maxCosine(c, "vec_id", "v", big)
    assert(out.count() == 50)
    assert(out.agg(min(col("maxcos"))).head.getDouble(0) >= -1.0001)
    assert(out.agg(max(col("maxcos"))).head.getDouble(0) <= 1.0001)
    // the plan really is a broadcast join, not a giant literal fold
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("Join"), plan.take(400))
  }

  test("the literal arm is a ZERO-SHUFFLE projection (the 100 TB sweep contract)") {
    val c = corpus(100, 8)
    val out = EmbeddingDecon.maxCosine(c, "vec_id", "v", bench(10, 8),
      forceArm = Some("literal"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"literal arm must not shuffle:\n${plan.take(600)}")
    assert(!plan.contains("Join"),
      s"literal arm must not join:\n${plan.take(600)}")
  }

  test("planted exact duplicates score maxcos = 1 under both arms") {
    import spark.implicits._
    val b = bench(3, 8)
    val dup = b.head // already normalized: cosine with itself = 1
    val c = Seq((100L, dup.toSeq), (200L, dup.map(_ * 5.0).toSeq))
      .toDF("vec_id", "v") // scaled copy too: cosine is scale-invariant
    Seq("literal", "broadcast").foreach { arm =>
      val got = EmbeddingDecon
        .maxCosine(c, "vec_id", "v", b, forceArm = Some(arm))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      assert(got(100L) == 1.0 && got(200L) == 1.0, s"$arm: $got")
    }
  }
}
