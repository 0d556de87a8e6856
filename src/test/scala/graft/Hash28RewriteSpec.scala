package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** The PortableHash28Rewrite peephole: fires on the exact conv∘substring∘md5
  * idiom, is value-identical to it, and leaves other md5 uses alone. */
class Hash28RewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def refHash28(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(7), 16)
  }

  test("rule fires: portableHash28 plans as the native hash28 expression") {
    graft.plans.PortableHash28Rewrite.ensure(spark)
    // parquet-backed input so constant folding can't collapse the plan
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(TextOps.portableHash28(col("text")).as("h"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("hash28"), s"expected the rewrite to fire:\n$opt")
    assert(!opt.contains("md5("), s"relational idiom should be gone:\n$opt")
  }

  test("value parity with the relational idiom, driver-side reference") {
    import spark.implicits._
    graft.plans.PortableHash28Rewrite.ensure(spark)
    val samples = Seq("", "a", "hello world", "πλάτων", "x" * 1000)
    val got = samples.toDF("s")
      .select(col("s"), TextOps.portableHash28(col("s")).as("h"))
      .as[(String, Long)].collect().toMap
    samples.foreach(s => assert(got(s) == refHash28(s), s"mismatch for '$s'"))
  }

  test("other md5 shapes untouched") {
    import spark.implicits._
    graft.plans.PortableHash28Rewrite.ensure(spark)
    // different substring length — must NOT rewrite
    val df = Seq("alpha").toDF("s")
      .select(expr("CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT)").as("h8"),
        expr("md5(s)").as("m"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("hash28"), s"must not fire on other shapes:\n$opt")
    val (h8, m) = df.as[(Long, String)].collect().head
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest("alpha".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(m == hex && h8 == java.lang.Long.parseLong(hex.take(8), 16))
  }
}
