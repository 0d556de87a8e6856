package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextHashExprs
import graft.operators.TextOps

/** Parity tests: the native per-row signature kernels must reproduce the
  * relational (explode → portable hash → aggregate) formulations they
  * replaced, bit for bit — those formulations are what the DuckDB oracles
  * still compute. */
class TextHashExprsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  private val perms = Seq((1000003L, 12345L), (1999993L, 54321L),
    (999331L, 7777L), (1112111L, 424242L))
  private val P = 2147483647L

  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
    .select(col("doc_id"), col("text")).filter(col("doc_id") < 50)

  test("MinHashSig matches the relational explode+groupBy formulation") {
    import spark.implicits._
    val relational = docs
      .select(col("doc_id"), explode(TextOps.shingles(col("text"))).as("sh"))
      .withColumn("h", TextOps.portableHash28(col("sh")))
      .groupBy(col("doc_id"))
      .agg(perms.zipWithIndex.map { case ((a, b), j) =>
        min((col("h") * a + b) % P).as(s"mh$j") }.head,
        perms.zipWithIndex.tail.map { case ((a, b), j) =>
          min((col("h") * a + b) % P).as(s"mh$j") }: _*)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (id, a, b, c, d) => id -> Seq(a, b, c, d) }.toMap
    val native = docs
      .select(col("doc_id"),
        TextHashExprs.minhashSig(split(col("text"), " "), perms, P).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native == relational)
  }

  test("MinHashSig is null below the shingle threshold") {
    import spark.implicits._
    val df = Seq((1L, "a b"), (2L, "a b c")).toDF("id", "text")
    val got = df.select(col("id"),
      TextHashExprs.minhashSig(split(col("text"), " "), perms, P).as("sig"))
      .as[(Long, Option[Seq[Long]])].collect().toMap
    assert(got(1L).isEmpty)
    assert(got(2L).nonEmpty)
  }

  test("SimHashSig matches the relational bit-count formulation") {
    import spark.implicits._
    val relational = {
      val toks = docs.select(col("doc_id"), explode(split(col("text"), lit(" "))).as("tok"))
        .withColumn("h", TextOps.portableHash28(col("tok")))
      val bitSums = (0 until 16).map(i =>
        sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i"))
      val shCol = (0 until 16)
        .map(i => when(col(s"b$i") >= 0, lit(1L << i)).otherwise(lit(0L)))
        .reduce(_ + _)
      toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
        .select(col("doc_id"), shCol.cast("long").as("simhash"))
        .as[(Long, Long)].collect().toMap
    }
    val native = docs.select(col("doc_id"),
      TextHashExprs.simhash(split(col("text"), lit(" ")), 16).as("simhash"))
      .as[(Long, Long)].collect().toMap
    assert(native == relational)
  }

  test("WinnowFingerprints matches the window-function formulation") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val relational = {
      val hashed = docs
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), posexplode(TextOps.shingleSequence(col("toks"))).as(Seq("idx", "sh")))
        .select(col("doc_id"), col("idx"), TextOps.portableHash28(col("sh")).as("h"))
      val byDoc = Window.partitionBy(col("doc_id"))
      val frame = byDoc.orderBy(col("idx")).rowsBetween(Window.currentRow, 3)
      hashed
        .withColumn("wmin", min(col("h")).over(frame))
        .withColumn("n", count(lit(1)).over(byDoc))
        .filter(col("idx") <= col("n") - 4)
        .select(col("doc_id"), col("wmin")).distinct()
        .as[(Long, Long)].collect().toSet
    }
    val native = docs
      .select(col("doc_id"),
        explode(TextHashExprs.winnowFingerprints(split(col("text"), " "))).as("wmin"))
      .as[(Long, Long)].collect().toSet
    assert(native == relational)
  }

  test("null tokens null-propagate (no NPE) across all three kernels") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT minhash_sig(array('a', CAST(NULL AS STRING), 'b', 'c')) AS mh,
        |       simhash_sig(array('a', CAST(NULL AS STRING))) AS sh,
        |       winnow_fingerprints(array('a', NULL, 'b', 'c', 'd', 'e', 'f')) AS wf,
        |       simhash_sig(CAST(NULL AS ARRAY<STRING>)) AS shnull
        |""".stripMargin).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("WinnowFingerprints: short docs yield no fingerprints") {
    import spark.implicits._
    // 5 tokens -> 3 shingles < window of 4 -> empty; 6 tokens -> exactly one
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e f")).toDF("id", "text")
    val got = df.select(col("id"),
      TextHashExprs.winnowFingerprints(split(col("text"), " ")).as("w"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got(1L).isEmpty)
    assert(got(2L).size == 1)
  }
  test("NfcNormalize: decomposed folds to precomposed; ASCII fast path; null-safe") {
    import spark.implicits._
    graft.functions.NfcNormalize.register(spark)
    val df = Seq(
      (Option("cafe\u0301 ja\u0300"), Option("caf\u00e9 j\u00e0")),
      (Option("plain ascii stays itself"), Option("plain ascii stays itself")),
      (Option.empty[String], Option.empty[String]))
      .toDF("a", "b")
    val out = df.selectExpr(
      "nfc_normalize(a) AS na", "nfc_normalize(b) AS nb").collect()
    assert(out(0).getString(0) == "caf\u00e9 j\u00e0" &&
      out(0).getString(0) == out(0).getString(1))
    assert(out(1).getString(0) == "plain ascii stays itself")
    assert(out(2).isNullAt(0) && out(2).isNullAt(1))
    // interpreted eval agrees with the codegen'd path above
    import org.apache.spark.unsafe.types.UTF8String
    assert(graft.functions.NfcNormalize
      .normalize(UTF8String.fromString("cafe\u0301")).toString == "caf\u00e9")
    // fast path returns the SAME object for pure ASCII (no copy)
    val ascii = UTF8String.fromString("abc def")
    assert(graft.functions.NfcNormalize.normalize(ascii) eq ascii)
  }

}
