package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration for the engine's custom functions, so
  * `spark.sql(...)` users get the same surface as the DataFrame API:
  *
  *   - poly_hash(str) -> bigint       (native codegen'd expression)
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

  def registerAll(spark: SparkSession): Unit = {
    PolyHash64.register(spark)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "long_dot", arity("long_dot", 2)(exprs => LongArrayDot(exprs(0), exprs(1))), "scala_udf")
    spark.udf.register("format_size", (b: Double) => Pure.formatSize(b))
    spark.udf.register("format_duration", (ms: Double) => Pure.formatDuration(ms))
    spark.udf.register("read_file_cost", (b: Long) => Pure.readFileCost(b))
  }
}
