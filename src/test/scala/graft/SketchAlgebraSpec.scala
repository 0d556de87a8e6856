package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SketchOps

/** Theta-sketch algebra invariants (the q164/StreamingKmv shared core),
  * checked over seeded random set pairs at several k:
  *   - the pre-division count identity n_union = n_inter + n_anotb +
  *     n_bnota (the oracle-visible gate);
  *   - theta = min of the two sketch thetas (2^28 when unsaturated);
  *   - EXACTNESS when both sketches are unsaturated: the "estimates"
  *     are the true set cardinalities — the property that makes the
  *     algebra degrade gracefully to exact set ops on small domains.
  */
class SketchAlgebraSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def algebraRow(a: Seq[Long], b: Seq[Long], k: Int) = {
    import spark.implicits._
    val df = Seq((a.distinct.sorted.take(k), b.distinct.sorted.take(k)))
      .toDF("am", "bm")
    SketchOps.kmvAlgebra(df, k)
      .select("theta", "n_union", "n_inter", "n_anotb", "n_bnota",
        "est_union", "est_inter", "est_anotb").head()
  }

  test("count identity and theta hold on random set pairs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 20; k <- Seq(4, 16, 64)) {
      val a = Seq.fill(rnd.nextInt(200))(rnd.nextLong(268435456L))
      val b = Seq.fill(rnd.nextInt(200))(rnd.nextLong(268435456L))
      val r = algebraRow(a, b, k)
      val (theta, nu, ni, nab, nba) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nu == ni + nab + nba, s"identity broke: trial $trial k $k")
      val thA = if (a.distinct.size < k) 268435456L else a.distinct.sorted.take(k).last
      val thB = if (b.distinct.size < k) 268435456L else b.distinct.sorted.take(k).last
      assert(theta == math.min(thA, thB), s"theta: trial $trial k $k")
    }
  }

  test("unsaturated sketches make the algebra EXACT") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 10) {
      val k = 64
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextLong(268435456L)).distinct
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextLong(268435456L)).distinct
      val r = algebraRow(a, b, k)
      val (sa, sb) = (a.toSet, b.toSet)
      assert(r.getLong(1) == (sa ++ sb).size, "n_union exact")
      assert(r.getLong(2) == (sa & sb).size, "n_inter exact")
      // theta = 2^28 -> |{h < theta}| * 2^28 div theta = the count itself
      assert(r.getLong(5) == (sa ++ sb).size, "est_union exact when unsaturated")
      assert(r.getLong(6) == (sa & sb).size, "est_inter exact when unsaturated")
      assert(r.getLong(7) == (sa -- sb).size, "est_anotb exact when unsaturated")
    }
  }
}
