package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration for the engine's custom functions, so
  * `spark.sql(...)` users get the same surface as the DataFrame API:
  *
  *   - poly_hash(str) -> bigint       (native codegen'd expression)
  *   - long_dot/double_dot(arr, arr)  (native dot products)
  *   - minhash_sig(tokens) -> array<bigint>   (8-perm signature)
  *   - simhash_sig(tokens) -> bigint          (16-bit simhash)
  *   - winnow_fingerprints(tokens) -> array<bigint>
  *   - format_size(bytes) -> str      ("1.21 KB")
  *   - format_duration(ms) -> str     ("1h 0m 0s" / "<0.01s")
  *   - read_file_cost(bytes) -> bigint (cost model: size // 32MiB + 2)
  *
  * Formatters are plain UDFs: they run at the rendering edge on tiny
  * result sets, never in a hot scan path (PolyHash64 is native precisely
  * because fingerprinting IS hot-path).
  */
object GraftFunctions {
  /** Arity-checked builder: wrong argument counts surface as a clear
    * AnalysisException-style message, not IndexOutOfBoundsException. */
  def arity(name: String, n: Int)(
      build: Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression =
    exprs => {
      if (exprs.length != n)
        throw new IllegalArgumentException(s"$name requires $n argument(s), got ${exprs.length}")
      build(exprs)
    }

  /** Default minhash permutation constants for the SQL surface (the
    * DataFrame API takes explicit perms; SQL users get the engine's
    * standard 8). */
  private val DefaultA = Array(1000003L, 1999993L, 999331L, 1112111L, 1300021L, 1500007L, 1700021L, 1900037L)
  private val DefaultB = Array(12345L, 54321L, 7777L, 424242L, 98765L, 13579L, 24680L, 111111L)
  private val DefaultP = 2147483647L

  /** minhash_sig with the engine's standard permutations — shared by
    * [[registerAll]] and [[graft.GraftExtensions]] so both SQL surfaces
    * stay identical. */
  def defaultMinHashSig(child: org.apache.spark.sql.catalyst.expressions.Expression): MinHashSig =
    MinHashSig(child, 3, DefaultA, DefaultB, DefaultP)

  def registerAll(spark: SparkSession): Unit = {
    PolyHash64.register(spark)
    NfcNormalize.register(spark)
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "long_dot", arity("long_dot", 2)(exprs => LongArrayDot(exprs(0), exprs(1))), "scala_udf")
    reg.createOrReplaceTempFunction(
      "double_dot", arity("double_dot", 2)(exprs => DoubleArrayDot(exprs(0), exprs(1))), "scala_udf")
    reg.createOrReplaceTempFunction(
      "minhash_sig", arity("minhash_sig", 1)(exprs =>
        defaultMinHashSig(exprs.head)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "simhash_sig", arity("simhash_sig", 1)(exprs => SimHashSig(exprs.head, 16)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "winnow_fingerprints", arity("winnow_fingerprints", 1)(exprs =>
        WinnowFingerprints(exprs.head, 3, 4)), "scala_udf")
    // WKB helpers for GEOMETRY/GEOGRAPHY lake columns
    reg.createOrReplaceTempFunction(
      "st_point", arity("st_point", 2)(exprs =>
        StPointExpr(exprs(0), exprs(1))), "scala_udf")
    Seq(("st_xmin", 0), ("st_ymin", 1), ("st_xmax", 2), ("st_ymax", 3))
      .foreach { case (n, k) =>
        reg.createOrReplaceTempFunction(
          n, arity(n, 1)(exprs => StBboxEdgeExpr(exprs.head, k, n)),
          "scala_udf")
      }
    spark.udf.register("format_size", (b: Double) => Pure.formatSize(b))
    spark.udf.register("format_duration", (ms: Double) => Pure.formatDuration(ms))
    spark.udf.register("read_file_cost", (b: Long) => Pure.readFileCost(b))
  }
}
