package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.util.SerializableConfiguration

/** Orphan-file detection — the maintenance sibling of the diag report (the
  * reference's `remove_orphan_files` analogue): files that exist under a
  * table's directory but are NOT referenced by its manifest are leaked
  * storage (failed writes, aborted compactions) and deletion candidates.
  *
  * Scale shape: the table root's immediate children are listed once on the
  * driver (one RPC), then each child directory is listed RECURSIVELY in its
  * own task — a lake with thousands of partitions fans out across the
  * cluster instead of serializing one driver-side walk. The comparison is a
  * left-anti join on the normalized path (see [[normalize]]: listing paths
  * carry scheme/authority and percent-encoding, manifest paths may be
  * relative to the table root — comparing unnormalized strings silently
  * matches nothing, which here would flag the WHOLE live table).
  *
  * Hidden paths follow [[FileEntrySource.listDataFiles]] — the single
  * listing rule shared with the manifest source and the compactor — so a
  * file under a `_temporary` or `.hive-staging` tree at ANY depth is invisible
  * to both sides of the anti-join and can never be flagged (deleting an
  * in-flight writer's staging files corrupts the write).
  */
object OrphanFiles {

  /** Normalized absolute path: scheme/authority and percent-encoding
    * stripped; relative paths (Delta-style manifests store paths relative
    * to the table root) resolved against `root` first. */
  def normalize(root: String)(p: String): String = {
    val path = new Path(p)
    val abs = if (path.isAbsolute || path.toUri.getScheme != null) path else new Path(root, p)
    abs.toUri.getPath
  }

  /** All data files under `root` (recursive, hidden paths skipped per the
    * shared listing rule), normalized — the "what storage holds" side. */
  def listActual(spark: SparkSession, root: String): Dataset[String] = {
    import spark.implicits._
    val conf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val base = new Path(root)
    val fs = base.getFileSystem(conf.value)
    val resolved = fs.getFileStatus(base).getPath
    val children = fs.listStatus(resolved)
      .filterNot(st => st.getPath.getName.startsWith("_") || st.getPath.getName.startsWith("."))
    val topFiles = children.filter(_.isFile).map(st => st.getPath.toUri.getPath).toSeq
    val dirs = children.filter(_.isDirectory).map(_.getPath.toString).toSeq
    val fanout = spark.createDataset(dirs).flatMap { d =>
      val p = new Path(d)
      val dfs = p.getFileSystem(conf.value)
      FileEntrySource.listDataFiles(dfs, p).map(_._1.toUri.getPath)
    }
    fanout.union(spark.createDataset(topFiles))
  }

  /** Files under `root` absent from `referenced` (manifest paths — any
    * scheme, encoding, or root-relative form; normalized before the
    * anti-join). */
  def find(spark: SparkSession, root: String, referenced: Dataset[String]): Dataset[String] = {
    import spark.implicits._
    val norm = normalize(root) _
    val ref = referenced.map(norm).toDF("path")
    listActual(spark, root).toDF("path")
      .join(ref, Seq("path"), "left_anti")
      .as[String]
  }
}
