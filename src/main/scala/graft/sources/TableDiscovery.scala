package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Table discovery over a data root: each `<name>.parquet` child (file or
  * directory) is a table. Listed via the Hadoop FileSystem API — the same
  * resolution Compactor/FileEntrySource use — so non-local roots
  * (hdfs://, s3a://) list correctly; a java.io.File listing would silently
  * return an empty table set for any non-local URI. */
object TableDiscovery {

  /** (tableName, fullPath) pairs sorted by name.
    * @throws java.io.FileNotFoundException when the root does not exist
    *         (loud, rather than an empty view list) */
  def list(conf: Configuration, root: String): Seq[(String, String)] = {
    val p = new Path(root)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p))
      throw new java.io.FileNotFoundException(s"no such data root: $root")
    fs.listStatus(p).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(st => st.getPath.getName.stripSuffix(".parquet") -> st.getPath.toString)
      .sortBy(_._1)
  }
}
