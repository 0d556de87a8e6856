package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** EXECUTED metadata maintenance over real on-disk v2 layouts — the
  * operational side of q127's expire_snapshots dry run, on the same
  * format [[IcebergLayoutWriter]] writes and [[IcebergManifestSource]]
  * reads. Two operations Iceberg tables need continuously:
  *
  *   - [[expireSnapshots]]: drop history older than the last N
  *     snapshots, rewrite the metadata JSON, and DELETE the
  *     now-unreferenced manifest lists + manifests (data files
  *     referenced by surviving snapshots are never touched — reachability
  *     is computed from the survivors, not assumed);
  *   - [[rewriteManifests]]: merge a snapshot's many small manifests
  *     into one consolidated manifest per content kind (the metadata
  *     twin of data-file compaction: planning cost is proportional to
  *     manifest count, and a streaming writer leaves thousands).
  *
  * Both run driver-side over metadata-sized inputs (manifest lists are
  * KBs; entry rewrite streams through the lazy Avro iterator) — at
  * 100 TB the DATA never moves, which is exactly why metadata-only
  * maintenance is the cheap lever. LakeLayoutMaintenanceSpec drives both
  * against written fixture layouts and proves reachability is preserved
  * bit-exactly (pre/post FileEntry relations match per surviving
  * snapshot).
  */
object LayoutMaintenance {

  private def metaDir(tableDir: String) = new java.io.File(tableDir, "metadata")

  /** Snapshot ids listed in the current metadata JSON, oldest first. */
  def snapshotIds(spark: SparkSession, tableDir: String): Seq[Long] = {
    val md = spark.read.option("multiLine", "true")
      .json(currentMetadataFile(spark, tableDir).getPath)
    md.schema("snapshots").dataType match {
      case org.apache.spark.sql.types.ArrayType(
          st: org.apache.spark.sql.types.StructType, _)
          if st.fieldNames.contains("snapshot-id") =>
        md.select(explode(col("snapshots")).as("s"))
          .select(col("s.`snapshot-id`")).collect().map(_.getLong(0)).sorted.toSeq
      case _ => Nil
    }
  }

  private def currentMetadataFile(spark: SparkSession,
      tableDir: String): java.io.File = {
    val m = metaDir(tableDir)
    val hint = new java.io.File(m, "version-hint.text")
    if (hint.isFile) {
      val h = new String(java.nio.file.Files.readAllBytes(hint.toPath), "UTF-8").trim
      val byNum = new java.io.File(m, s"v$h.metadata.json")
      if (h.nonEmpty && h.forall(_.isDigit) && byNum.isFile) byNum
      else new java.io.File(m, h)
    } else {
      m.listFiles().filter(_.getName.endsWith(".metadata.json"))
        .maxBy { f =>
          "^v(\\d+)\\.metadata\\.json$".r.findFirstMatchIn(f.getName)
            .map(_.group(1).toLong).getOrElse(-1L)
        }
    }
  }

  private case class Snap(id: Long, listPath: String)

  private def snapshots(spark: SparkSession, tableDir: String): Seq[Snap] = {
    val md = spark.read.option("multiLine", "true")
      .json(currentMetadataFile(spark, tableDir).getPath)
    md.select(explode(col("snapshots")).as("s"))
      .select(col("s.`snapshot-id`"), col("s.`manifest-list`"))
      .collect().map(r => Snap(r.getLong(0), r.getString(1)))
      .sortBy(_.id).toSeq
  }

  /** Bump the metadata version: write v<next>.metadata.json with the
    * given snapshots (current = last) and update version-hint.text. */
  private def writeMetadataVersion(spark: SparkSession, tableDir: String,
      keep: Seq[Snap]): Unit = {
    val m = metaDir(tableDir)
    val cur = currentMetadataFile(spark, tableDir)
    val curV = "^v(\\d+)\\.metadata\\.json$".r.findFirstMatchIn(cur.getName)
      .map(_.group(1).toLong).getOrElse(0L)
    val snapJson = keep.map { s =>
      s"""    {"snapshot-id": ${s.id}, "manifest-list": "${s.listPath}"}"""
    }.mkString(",\n")
    val json =
      s"""{
         |  "format-version": 2,
         |  "current-snapshot-id": ${keep.last.id},
         |  "snapshots": [
         |$snapJson
         |  ]
         |}""".stripMargin
    java.nio.file.Files.write(
      new java.io.File(m, s"v${curV + 1}.metadata.json").toPath,
      json.getBytes("UTF-8"))
    java.nio.file.Files.write(new java.io.File(m, "version-hint.text").toPath,
      (curV + 1).toString.getBytes("UTF-8"))
  }

  /** Manifest paths referenced by a snapshot's manifest list. */
  private def manifestsOf(spark: SparkSession, s: Snap): Seq[String] =
    IcebergManifestSource.manifestPaths(
      spark.sparkContext.hadoopConfiguration, s.listPath)

  /** Expire all but the last `keepLast` snapshots: metadata version bump
    * + physical deletion of unreferenced manifest lists and manifests.
    * Returns (kept ids, deleted file count). Reachability-safe: a
    * manifest referenced by ANY surviving snapshot survives, even if an
    * expired snapshot also referenced it. */
  def expireSnapshots(spark: SparkSession, tableDir: String,
      keepLast: Int): (Seq[Long], Int) = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val all = snapshots(spark, tableDir)
    val (expire, keep) = all.splitAt(math.max(all.size - keepLast, 0))
    if (expire.isEmpty) return (keep.map(_.id), 0)
    val reachable = keep.flatMap(manifestsOf(spark, _)).toSet
    val doomedManifests = expire.flatMap(manifestsOf(spark, _)).toSet -- reachable
    writeMetadataVersion(spark, tableDir, keep)
    val doomed = expire.map(_.listPath) ++ doomedManifests
    var deleted = 0
    doomed.foreach { p =>
      if (new java.io.File(p).delete()) deleted += 1
    }
    (keep.map(_.id), deleted)
  }

  /** Consolidate the CURRENT snapshot's manifests into one manifest per
    * content kind (data / deletes), writing a new manifest list and a
    * new metadata version; the old small manifests of that snapshot are
    * deleted unless an older snapshot still references them. Entries are
    * copied as RAW Avro records — partitions, record_count, bounds, and
    * sequence numbers survive byte-equivalently (only status=2 DELETED
    * entries are dropped, which the reader discards anyway), so the
    * reader sees the SAME relation from fewer files. All source
    * manifests must share one entry schema (single-writer tables do).
    * Returns (manifests before, after). */
  def rewriteManifests(spark: SparkSession, tableDir: String): (Int, Int) = {
    import org.apache.avro.file.{DataFileReader, DataFileWriter}
    import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
    import org.apache.avro.mapred.FsInput
    val all = snapshots(spark, tableDir)
    require(all.nonEmpty, s"no snapshots under $tableDir")
    val cur = all.last
    val conf = spark.sparkContext.hadoopConfiguration
    val before = manifestsOf(spark, cur)
    if (before.size <= 2) return (before.size, before.size)
    val m = metaDir(tableDir)
    // lazily-created writer per content kind, schema from the first record
    val outs = scala.collection.mutable.Map.empty[Int, (java.io.File, DataFileWriter[GenericRecord])]
    def writerFor(content: Int, schema: org.apache.avro.Schema) =
      outs.getOrElseUpdate(content, {
        val f = new java.io.File(m, s"manifest-${cur.id}-rw$content.avro")
        f.delete()
        val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, f)
        (f, w)
      })
    try {
      before.foreach { p =>
        val reader = DataFileReader.openReader(
          new FsInput(new org.apache.hadoop.fs.Path(p), conf),
          new GenericDatumReader[GenericRecord]())
        try {
          val schema = reader.getSchema
          while (reader.hasNext) {
            val e = reader.next()
            if (e.get("status").asInstanceOf[Int] != 2) {
              val df = e.get("data_file").asInstanceOf[GenericRecord]
              val content =
                if (df.getSchema.getField("content") == null) 0
                else Option(df.get("content")).fold(0)(_.asInstanceOf[Int])
              val (_, w) = writerFor(if (content == 0) 0 else 1, schema)
              w.append(e)
            }
          }
        } finally reader.close()
      }
    } finally outs.values.foreach(_._2.close())
    val newList = new java.io.File(m, s"snap-${cur.id}-rw-manifest-list.avro")
    IcebergLayoutWriter.writeManifestList(newList,
      outs.toSeq.sortBy(_._1).map { case (c, (f, _)) => (f, c) }, cur.id)
    val stillReferenced = all.dropRight(1).flatMap(manifestsOf(spark, _)).toSet
    writeMetadataVersion(spark, tableDir,
      all.dropRight(1) :+ Snap(cur.id, newList.getAbsolutePath))
    new java.io.File(cur.listPath).delete()
    (before.toSet -- stillReferenced).foreach(p => new java.io.File(p).delete())
    val after = manifestsOf(spark, Snap(cur.id, newList.getAbsolutePath))
    (before.size, after.size)
  }
}
