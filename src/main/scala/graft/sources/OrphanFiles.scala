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
  * left-anti join on the normalized URI path (see
  * `Path(...).toUri.getPath`: listing paths carry scheme/authority and
  * percent-encoding, manifest paths often don't — joining unnormalized
  * strings silently matches nothing).
  *
  * Hidden files/dirs (`_`/`.` prefixes — Spark metadata, checksums) are
  * never orphans, matching the listing rule in [[FileEntrySource]].
  */
object OrphanFiles {

  /** Normalized path form both sides of the comparison are mapped to. */
  def normalize(p: String): String = new Path(p).toUri.getPath

  /** All data files under `root` (recursive, hidden files skipped),
    * normalized — the "what storage actually holds" side. */
  def listActual(spark: SparkSession, root: String): Dataset[String] = {
    import spark.implicits._
    val conf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val base = new Path(root)
    val fs = base.getFileSystem(conf.value)
    val children = fs.listStatus(fs.getFileStatus(base).getPath)
      .filterNot(st => st.getPath.getName.startsWith("_") || st.getPath.getName.startsWith("."))
    val topFiles = children.filter(_.isFile).map(st => normalize(st.getPath.toString)).toSeq
    val dirs = children.filter(_.isDirectory).map(_.getPath.toString).toSeq
    val fanout = spark.createDataset(dirs).flatMap { d =>
      val p = new Path(d)
      val dfs = p.getFileSystem(conf.value)
      val it = dfs.listFiles(p, true)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
          out += normalize(st.getPath.toString)
      }
      out.toSeq
    }
    fanout.union(spark.createDataset(topFiles))
  }

  /** Files under `root` absent from `referenced` (manifest paths, any
    * scheme/encoding — normalized before the anti-join). */
  def find(spark: SparkSession, root: String, referenced: Dataset[String]): Dataset[String] = {
    import spark.implicits._
    val ref = referenced.map(normalize(_)).toDF("path")
    listActual(spark, root).toDF("path")
      .join(ref, Seq("path"), "left_anti")
      .as[String]
  }
}
