package graft

import org.apache.spark.sql.SparkSession
import graft.metrics.MetricsCalculator
import graft.model.FileEntry
import graft.render.Renderer
import graft.sources.FileEntrySource
import graft.functions.Pure

/** Local-diagnostics CLI (reference `cli.py:146-157,185-192` re-expressed):
  * scans file entries for every table matching a glob under a data root,
  * computes the 9-metric before/after report in ONE union-all Spark job
  * (all tables fan into a single plan — the at-scale design, vs the
  * reference's 10-thread driver pool), and renders per-table panels.
  *
  * Usage:
  *   graft.Cli list <dataRoot> [glob]
  *   graft.Cli diag <dataRoot> [glob]
  *
  * A "table" here is each `<name>.parquet` file/dir under dataRoot (the
  * environment has no Iceberg catalog; with one, the source swaps for the
  * `db.tbl.files` metadata relation — see FileEntrySource docs).
  */
object Cli {
  def main(args: Array[String]): Unit = {
    val usage = "usage: graft.Cli (list|diag) <dataRoot> [glob]"
    if (args.length < 2) { System.err.println(usage); sys.exit(2) }
    val cmd = args(0)
    val root = args(1)
    val glob = if (args.length > 2) args(2) else "*"

    val rootFile = new java.io.File(root)
    if (!rootFile.isDirectory) { System.err.println(s"error: no such data root: $root"); sys.exit(1) }
    val tables = rootFile.listFiles().toSeq
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => f.getName.stripSuffix(".parquet") -> f.getAbsolutePath)
      .filter { case (n, _) => Pure.globMatch(glob, n) }
      .sortBy(_._1)

    cmd match {
      case "list" =>
        println(Renderer.renderList(tables.map(_._1), s"Tables in $root matching '$glob'"))
        if (tables.isEmpty) System.err.println("warning: no tables matched")

      case "diag" =>
        if (tables.isEmpty) { System.err.println(s"error: no tables match '$glob' under $root"); sys.exit(1) }
        val spark = SparkSession.builder()
          .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
          .appName("graft-cli")
          .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        import spark.implicits._
        try {
          // union-all multi-table plan: one Dataset[FileEntry] for ALL tables
          val files = tables
            .map { case (name, path) => FileEntrySource.fromDirectory(spark, path, name) }
            .reduce(_ union _)
          val manifests = tables.map { case (name, _) => (name, 1L) }.toDS
          val wide = MetricsCalculator.computeMetricsWide(files, manifests).collect()
            .sortBy(_.table)
          wide.foreach { w =>
            println(Renderer.renderTable(w.table, w.toRows, Renderer.LocalMode))
            println()
          }
        } finally spark.stop()

      case other =>
        System.err.println(s"error: unknown command '$other'\n$usage"); sys.exit(2)
    }
  }
}
