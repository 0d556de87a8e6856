package graft.sources

import org.apache.spark.sql.SparkSession

/** Pure-SQL entry point: register every `<name>.parquet` under a data root
  * as a temp view (events gets its nanos-derived `ts_us`/`tsx` columns) and
  * install the engine's SQL functions — after this, the whole surface is
  * reachable from `spark.sql(...)` alone. */
object SqlEnv {

  /** Returns the registered view names (sorted). */
  def register(spark: SparkSession, dir: String): Seq[String] = {
    graft.functions.GraftFunctions.registerAll(spark)
    val root = new java.io.File(dir)
    val tables = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName.stripSuffix(".parquet") -> f.getAbsolutePath)
      .sortBy(_._1).toSeq
    tables.map { case (name, path) =>
      if (name == "events") {
        // the ONE canonical events derivation (nanos→ts_us/tsx) lives in
        // Rel — SQL views must not drift from the oracle-gated relation
        implicit val sp: SparkSession = spark
        graft.operators.Rel.events(new java.io.File(path).getParent)
          .createOrReplaceTempView(name)
      } else {
        spark.read.parquet(path).createOrReplaceTempView(name)
      }
      name
    }
  }
}
