package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.JoinOps

/** Result-equivalence guarantees for the skew/range join operators. */
class JoinOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("saltedJoin == plain join on a skewed key") {
    import spark.implicits._
    // skew: 80% of rows share key 1
    val left = spark.createDataset((1 to 5000).map(i =>
      (if (i % 5 == 0) i.toLong % 7 else 1L, i.toLong))).toDF("k", "rowid")
    val right = spark.createDataset((0L to 7L).map(k => (k, s"v$k"))).toDF("k", "payload")
    val plain = left.join(right, Seq("k")).select("k", "rowid", "payload")
      .collect().map(_.toString).sorted
    val salted = JoinOps.saltedJoin(left, right, "k", col("rowid"))
      .select("k", "rowid", "payload").collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedCountSum == plain groupBy aggregate") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val plain = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100))).sortBy(_._1)
    val salted = JoinOps.saltedCountSum(li, "l_returnflag", "l_quantity", col("l_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100))).sortBy(_._1)
    assert(salted.toSeq == plain.toSeq)
  }

  test("rangeJoin == theta join") {
    import spark.implicits._
    val points = spark.createDataset((0L until 1000L).map(p => Tuple1(p * 7 % 500))).toDF("p")
    val intervals = spark.createDataset(Seq(
      (0L, 100L, "low"), (90L, 250L, "mid"), (400L, 500L, "high"))).toDF("lo", "hi", "name")
    val theta = points.join(intervals, col("p") >= col("lo") && col("p") < col("hi"))
      .select("p", "name").collect().map(_.toString).sorted
    val bucketed = JoinOps.rangeJoin(points, "p", intervals, "lo", "hi", bucket = 64)
      .select("p", "name").collect().map(_.toString).sorted
    assert(bucketed.toSeq == theta.toSeq)
    // and it planned as an equi-join, not a cartesian/BNLJ
    val plan = JoinOps.rangeJoin(points, "p", intervals, "lo", "hi", bucket = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }
}
