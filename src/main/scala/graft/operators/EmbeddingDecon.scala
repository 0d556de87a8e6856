package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic (embedding-space) benchmark-decontamination scoring — the
  * shared engine behind q269: each corpus row's MAX COSINE against a
  * benchmark set of pre-normalized vectors. Two physical arms with
  * IDENTICAL results (EmbeddingDeconSpec pins row-for-row equality):
  *
  *  - LITERAL (benchmark <= [[MaxLiteralBenchmark]] vectors): the
  *    benchmark folds into the plan as array literals and the sweep is
  *    ONE zero-shuffle higher-order-aggregate projection — no join, no
  *    exchange, the cheapest possible 100 TB corpus pass. Plan size
  *    grows with the benchmark, which is why the arm is CEILINGED
  *    instead of assumed ("metadata-sized by construction" was the old
  *    unguarded claim).
  *  - BROADCAST (past the ceiling): the benchmark ships once per
  *    executor as a broadcast relation, the corpus CROSS-joins it
  *    (corpus-rows x benchmark-vectors cosine evaluations — the same
  *    arithmetic the literal arm folds), and a per-id max aggregates.
  *    Scales to real benchmark-suite sizes; at larger-still benchmarks
  *    the q212 ANN-index route replaces the exhaustive sweep.
  *
  * Both arms compute round(max_b dot(v, b) / ||v||, 4) with the SAME
  * codegen'd dot expression on the SAME doubles, and max is a pure
  * selection (no accumulation arithmetic) — so the arms agree
  * IEEE-exactly, which is what lets the dispatch be a pure size
  * heuristic rather than a semantics choice.
  */
object EmbeddingDecon {

  /** Literal-arm ceiling, in benchmark VECTORS: 256 x 64 doubles ≈
    * 128 KB of plan literals — comfortably plan-metadata sized; past it
    * the benchmark stops being "tiny" and rides a broadcast instead. */
  val MaxLiteralBenchmark = 256

  def armFor(benchmarkVectors: Int): String =
    if (benchmarkVectors <= MaxLiteralBenchmark) "literal" else "broadcast"

  private def dot(a: Column, b: Column): Column =
    graft.functions.DoubleArrayDot.doubleDot(a, b)

  /** (idCol, maxcos) per corpus row: the max cosine of `vecCol` (raw,
    * un-normalized `array<double>`) against `bench` (PRE-NORMALIZED
    * vectors), rounded to 4 places. `forceArm` pins an arm for tests;
    * production dispatch is by [[armFor]]. */
  def maxCosine(corpus: DataFrame, idCol: String, vecCol: String,
      bench: Seq[Array[Double]], forceArm: Option[String] = None)
      : DataFrame = {
    require(bench.nonEmpty, "EmbeddingDecon: empty benchmark set")
    val arm = forceArm.getOrElse(armFor(bench.length))
    val nrm = sqrt(dot(col(vecCol), col(vecCol)))
    arm match {
      case "literal" =>
        val benchLit = array(bench.map(b => array(b.map(lit(_)): _*)): _*)
        corpus.select(col(idCol),
          round(aggregate(benchLit, lit(-1.0d),
            (acc, b) => greatest(acc, dot(col(vecCol), b) / nrm)), 4)
            .as("maxcos"))
      case "broadcast" =>
        val spark = corpus.sparkSession
        import spark.implicits._
        val benchDf = bench.map(_.toSeq).toDF("b")
        // group on a synthetic per-row key, not idCol: the literal arm
        // emits one row per CORPUS ROW, and the arms must agree even
        // when ids repeat (or are null) — the dispatch is a size
        // heuristic, never a semantics change
        corpus.select(col(idCol), col(vecCol), nrm.as("__nrm"))
          .withColumn("__rid", monotonically_increasing_id())
          .crossJoin(broadcast(benchDf))
          .groupBy(col("__rid"))
          .agg(first(col(idCol)).as(idCol),
            round(max(dot(col(vecCol), col("b")) / col("__nrm")), 4)
              .as("maxcos"))
          .select(col(idCol), col("maxcos"))
      case other => sys.error(s"EmbeddingDecon: unknown arm '$other'")
    }
  }
}
