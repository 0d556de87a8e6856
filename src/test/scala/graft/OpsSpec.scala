package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{AnnOps, TextOps}

/** Library-API tests for TextOps/AnnOps — the operators behind the query
  * surface, driven the way a consumer would. */
class OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")

  test("tokenCount matches occurrence arithmetic") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "one"), (3L, "x  y")).toDF("id", "text")
    val got = df.select(col("id"), TextOps.tokenCount(col("text")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 3L)) // double space counts twice
  }

  test("shingles produce distinct n-grams, empty under n tokens") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, "a b"), (3L, "x y z x y z")).toDF("id", "text")
    val got = df.select(col("id"), TextOps.shingles(col("text")).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L).toSet == Set("a b c", "b c d"))
    assert(got(2L).isEmpty)
    assert(got(3L).toSet == Set("x y z", "y z x", "z x y")) // distinct
  }

  test("minhash + LSH finds planted near-dup twins") {
    import spark.implicits._
    // deterministic subset (limit without orderBy is not)
    val base = docs.select(col("doc_id"), col("text")).filter(col("doc_id") < 100)
    val twins = base.select((col("doc_id") + 5000).as("doc_id"),
      expr("substring(text, instr(text, ' ') + 1)").as("text"))
    val corpus = base.union(twins)
    val perms = Seq((1000003L, 12345L), (1999993L, 54321L), (999331L, 7777L), (1112111L, 424242L),
      (1300021L, 98765L), (1500007L, 13579L), (1700021L, 24680L), (1900037L, 111111L))
    val sigs = TextOps.minhashSignatures(corpus, "doc_id", "text", perms)
    val pairs = TextOps.lshCandidatePairs(sigs, "doc_id", nPerms = 8, rowsPerBand = 4)
      .as[(Long, Long)].collect().toSet
    // most twins (J ~ (n-3)/n) must be found; on 100 docs expect near-total recall
    val twinPairs = (0 until 100).map(i => (i.toLong, (i + 5000).toLong))
      .filter(p => pairs.exists(_ == p)).size
    assert(twinPairs >= 90, s"LSH recall too low: $twinPairs/100")
  }

  test("simhash: near-dup texts land within small hamming distance") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "quick brown fox jumps over the lazy dog again and again"), // 1 token dropped
      (3L, "completely different words entirely unrelated content here now")).toDF("id", "text")
    // 24 bits: the portable token hash is 28-bit, so bits beyond 28 carry
    // no signal; 16 bits is too coarse to separate tiny docs reliably
    val sh = TextOps.simhash(df, "id", "text", bits = 24).as[(Long, Long)].collect().toMap
    val d12 = java.lang.Long.bitCount(sh(1L) ^ sh(2L))
    val d13 = java.lang.Long.bitCount(sh(1L) ^ sh(3L))
    assert(d12 < d13, s"expected near-dup closer: d12=$d12 d13=$d13")
    assert(d12 <= 4)
  }

  test("sign-LSH near-dup equals the planted twin set with exact verify") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").limit(200)
      .select(col("vec_id"), col("embedding"))
    val twins = emb.select((col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"), v => v + lit(0.0001f)).as("embedding"))
    val c = emb.union(twins)
    val found = AnnOps.signLshNearDuplicates(c, "vec_id", "embedding", minCos = 0.999)
      .as[(Long, Long, Double)].collect()
    val twinPairs = found.count { case (a, b, _) => b == a + 100000 }
    assert(twinPairs >= 198, s"twin recall: $twinPairs/200")
    found.foreach { case (_, _, cos) => assert(cos >= 0.999) }
  }

  test("brute-force top-k: self-similarity excluded, ranks deterministic") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val topk = AnnOps.bruteForceTopK(emb, "vec_id", "embedding", col("vec_id") < 5, k = 3)
      .as[(Long, Long, Double, Long)].collect()
    assert(topk.length == 15)
    topk.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._4).sorted.toSeq == Seq(1L, 2L, 3L))
      // descending cosine within each probe group
      val byRank = g.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (x, y) => x >= y })
    }
    assert(topk.forall { case (q, n, _, _) => q != n })
  }

  test("IVF top-k: recall against brute force with nprobe sweep") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), col("label"))
    val exact = AnnOps.bruteForceTopK(emb, "vec_id", "embedding", col("vec_id") < 20, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(nprobe: Int): Double = {
      val ivf = AnnOps.ivfTopK(emb, "vec_id", "embedding", "label",
        col("vec_id") < 20, k = 5, nprobe = nprobe)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (ivf & exact).size.toDouble / exact.size
    }
    val r3 = recall(3)
    val r10 = recall(10) // all lists => must equal brute force exactly
    assert(r10 == 1.0, s"nprobe=all recall $r10")
    assert(r3 >= 0.3, s"nprobe=3 recall $r3") // partial scan, partial recall
    assert(r3 <= r10)
  }

  test("hamming distance column") {
    import spark.implicits._
    val df = Seq((0xFFL, 0x0FL)).toDF("a", "b")
    val d = df.select(TextOps.hammingDistance(col("a"), col("b"))).as[Int].collect()(0)
    assert(d == 4)
  }
}
