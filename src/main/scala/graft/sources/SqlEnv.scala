package graft.sources

import org.apache.spark.sql.SparkSession

/** Pure-SQL entry point: register every `<name>.parquet` under a data root
  * as a temp view (events gets its nanos-derived `ts_us`/`tsx` columns) and
  * install the engine's SQL functions — after this, the whole surface is
  * reachable from `spark.sql(...)` alone. */
object SqlEnv {

  /** Returns the registered view names (sorted). Tables are discovered with
    * the Hadoop FileSystem API ([[TableDiscovery]]) so non-local roots
    * (hdfs://, s3a://) work, and a missing root fails loudly. */
  def register(spark: SparkSession, dir: String): Seq[String] = {
    graft.functions.GraftFunctions.registerAll(spark)
    val tables = TableDiscovery.list(spark.sparkContext.hadoopConfiguration, dir)
    tables.map { case (name, path) =>
      if (name == "events") {
        // the ONE canonical events derivation (nanos→ts_us/tsx) lives in
        // Rel — SQL views must not drift from the oracle-gated relation
        implicit val sp: SparkSession = spark
        graft.operators.Rel.events(new org.apache.hadoop.fs.Path(path).getParent.toString)
          .createOrReplaceTempView(name)
      } else {
        spark.read.parquet(path).createOrReplaceTempView(name)
      }
      name
    }
  }
}
