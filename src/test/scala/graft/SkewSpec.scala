package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Queries5

/** Adversarial skew fixtures for the two cluster-local pair generators.
  * The scale arguments in q105/q79's comments ("bucket sizes follow rare
  * shingles' df", "salting fans each cluster onto S blocks") are asserted
  * here against corpora BUILT to break them: one shingle / one semantic
  * cluster holding 30% of all docs. The bound under test is per-bucket
  * row count — the direct proxy for task memory: a bucket that stays
  * O(corpus/blocks) fits one task at any corpus size; a bucket that
  * tracks the hot key's 30% does not. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val nDocs = 200
  private val hotShare = 60 // 30%

  /** 200 docs of unique 3-gram shingles; docs 0..59 all end in the SAME
    * hot phrase, so the shingle "hot1 hot2 hot3" has df = 30%. */
  private lazy val skewDir: String = {
    val d = new java.io.File("target/tmp-skew")
    if (!new java.io.File(d, "documents.parquet").exists()) {
      d.mkdirs()
      import spark.implicits._
      val docs = (0 until nDocs).map { i =>
        val uniq = (0 until 12).map(j => s"w${i}_$j").mkString(" ")
        val text = if (i < hotShare) s"$uniq hot1 hot2 hot3" else uniq
        (i.toLong, text, "en", "synthetic", text.length.toLong)
      }
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .repartition(4)
        .write.mode("overwrite").parquet(s"${d.getPath}/documents.parquet")

      // embeddings: vectors 0..59 in one tight cluster (30%), the rest
      // spread across distinct far-apart directions
      val dims = 16
      val vecs = (0 until nDocs).map { i =>
        val base =
          if (i < hotShare) Array.tabulate(dims)(k => 0.9f + 0.0001f * (i % 7) * (k % 3))
          else Array.tabulate(dims)(k =>
            if (k == (i % dims)) 1.0f else -0.5f + 0.1f * ((i + k) % 5))
        (i.toLong, base.toSeq, i % 3)
      }
      vecs.toDF("vec_id", "embedding", "label")
        .repartition(4)
        .write.mode("overwrite").parquet(s"${d.getPath}/embeddings.parquet")
    }
    d.getPath
  }

  test("q105: a 30%-df shingle never enters any prefix; buckets stay O(1)") {
    implicit val sp = spark
    // the query completes on the adversarial corpus...
    val out = SparkEntry.queries("q105_set_similarity_join")(spark, skewDir)
    assert(out.count() == 0L) // unique docs: hot suffix alone can't reach J>=0.8
    // ...and the REASON holds: rebuild the prefix relation exactly as the
    // query does and assert the candidate-join bucket bound
    val dt = graft.operators.Rel.t(skewDir, "documents")
      .select(col("doc_id"),
        explode(graft.functions.TextHashExprs.shingleHashes(
          split(col("text"), " "), 3)).as("h"))
    val df = dt.groupBy(col("h")).agg(count(lit(1)).as("dfc"))
    val hotDf = df.agg(max(col("dfc"))).head.getLong(0)
    assert(hotDf >= hotShare, s"fixture broken: max shingle df $hotDf")
    val prefix = dt.join(broadcast(df), "h")
      .groupBy(col("doc_id"))
      .agg(expr("transform(sort_array(collect_list(struct(dfc, h))), x -> x.h)").as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("plen", expr("CAST(n - (n * 4 + 4) DIV 5 + 1 AS INT)"))
      .select(col("doc_id"), explode(slice(col("toks"), lit(1), col("plen"))).as("h"))
    val maxBucket = prefix.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).head.getLong(0)
    // rarest-first prefixes: the 30% shingle is ranked LAST in every doc,
    // so no prefix bucket ever approaches df(hot) = 60
    assert(maxBucket <= 5L,
      s"prefix bucket grew with the hot shingle: $maxBucket (df(hot)=$hotDf)")
  }

  test("q79: a 30% cluster fans onto SemBlocks tasks; per-task rows bounded") {
    implicit val sp = spark
    // completes, and the hot cluster's near-identical members are found
    val out = SparkEntry.queries("q79_semdedup")(spark, skewDir)
    assert(out.count() > 0L)
    // the salted task-key histogram: rebuild the assignment exactly as the
    // query does (twinned corpus), then bound rows per (cid, blk)
    val base = graft.operators.Rel.t(skewDir, "embeddings").select(col("vec_id"),
      expr(s"transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * ${Queries5.KQ}) AS BIGINT))")
        .as("qarr"))
    val vecs = base.union(base.select((col("vec_id") + 100000).as("vec_id"),
      expr("transform(qarr, q -> q + 1)").as("qarr")))
    val qd = vecs.select(col("vec_id"), posexplode(col("qarr")).as(Seq("pos0", "qv")))
      .select(col("vec_id"), (col("pos0") + 1).as("pos"), col("qv"))
    val asg = Queries5.kmFinalAssign(qd).select(col("vec_id"), col("cid"))
    val hist = asg
      .withColumn("blk", (col("vec_id") % Queries5.SemBlocks).cast("int"))
      .groupBy(col("cid"), col("blk")).agg(count(lit(1)).as("c"))
      .cache()
    try {
      val biggestCluster = hist.groupBy(col("cid")).agg(sum(col("c")).as("n"))
        .agg(max(col("n"))).head.getLong(0)
      assert(biggestCluster >= 2L * hotShare, // twinned: 30% cluster doubled
        s"fixture broken: max cluster $biggestCluster")
      val maxTask = hist.agg(max(col("c"))).head.getLong(0)
      // sequential ids spread uniformly mod S: no task key exceeds its
      // cluster's fair 1/S share by more than rounding
      assert(maxTask <= biggestCluster / Queries5.SemBlocks + 2,
        s"salting failed: task bucket $maxTask for a $biggestCluster-row cluster")
    } finally hist.unpersist(blocking = false)
  }
}
