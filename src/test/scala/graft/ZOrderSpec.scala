package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.MortonCode
import graft.sources.ZOrderLayout

/** Z-order layout: the morton expression's bit contract, and the measurable
  * effect — a 2-D clustered layout lets min/max file stats skip most files
  * for range predicates on EITHER column, where insertion order skips
  * (nearly) none. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("morton code interleaves bits (known values, monotone tiles)") {
    assert(MortonCode.interleave(0, 0, 16) == 0L)
    assert(MortonCode.interleave(1, 0, 16) == 1L)
    assert(MortonCode.interleave(0, 1, 16) == 2L)
    assert(MortonCode.interleave(3, 5, 16) == 39L) // x=11, y=101 -> 100111
    // expression path == scala path
    import spark.implicits._
    val got = Seq((3L, 5L), (255L, 0L), (0L, 255L))
      .toDF("x", "y")
      .select(MortonCode.morton(col("x"), col("y"), 16).as("z"))
      .as[Long].collect().toSeq
    assert(got == Seq(39L, MortonCode.interleave(255, 0, 16), MortonCode.interleave(0, 255, 16)))
  }

  test("z-ordered layout prunes files on BOTH dimensions; row order preserved as a set") {
    import spark.implicits._
    val naiveDir = TestTmp.dir("graft_naive")
    val zDir = TestTmp.dir("graft_z")
    // 2-D uniform data, insertion order random in both dims
    val df = spark.range(40000)
      .select(col("id"),
        pmod(hash(col("id")), lit(1000)).cast("long").as("x"),
        pmod(hash(col("id") + 7), lit(1000)).cast("long").as("y"))
    df.repartition(16).write.mode("overwrite").parquet(naiveDir)
    ZOrderLayout.write(df, "x", "y", zDir, nFiles = 16)
    // content preserved
    assert(spark.read.parquet(zDir).count() == 40000)
    assert(spark.read.parquet(zDir).agg(sum(col("x")), sum(col("y"))).head() ==
      df.agg(sum(col("x")), sum(col("y"))).head())
    // a 10%-range predicate on either column: naive layout scans ~all
    // files, z-order scans a minority
    for (c <- Seq("x", "y")) {
      val naive = ZOrderLayout.scanFraction(spark, naiveDir, c, 100, 199)
      val z = ZOrderLayout.scanFraction(spark, zDir, c, 100, 199)
      assert(naive > 0.9, s"$c naive=$naive")
      assert(z <= 0.5, s"$c z=$z")
      assert(z < naive)
    }
  }
}
