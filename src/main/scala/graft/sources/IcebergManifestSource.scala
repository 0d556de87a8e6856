package graft.sources

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.FileEntry

/** REAL Iceberg manifest (Avro) reading — S5 without an Iceberg runtime.
  *
  * The reference loads a snapshot's manifests and collects every live
  * entry's data_file with no partition/metrics filtering
  * (`/root/reference/icebergdiag/diagnostics/manager.py:154-186`, via
  * pyiceberg `_open_manifest` whose `fetch_manifest_entry(io,
  * discard_deleted=True)` drops only status=2 DELETED entries), and the
  * manifest count is the snapshot's manifest-list length. This mirror
  * reads the same two Avro surfaces with the core Avro library (on
  * Spark's classpath — no spark-avro module needed):
  *
  *   - the snapshot's MANIFEST LIST (one small Avro file, driver-side:
  *     it is a list of manifest paths, KBs);
  *   - each MANIFEST file DISTRIBUTED — one task per manifest via an RDD
  *     of paths. Manifest reading is the one per-partition imperative
  *     step in this engine (Spark has no built-in reader for the format);
  *     at 100 TB a table has thousands of manifests and this scan
  *     parallelizes across executors exactly like Iceberg's own planning.
  *
  * Schema handling matches the spec duality: v2 manifests carry
  * `data_file.content` (0=data, 1=position deletes, 2=equality deletes);
  * v1 manifests have no `content` field — every file is a DataFile
  * (content 0). `partition` is a record whose canonical string form is
  * JSON in partition-spec field order with null fields omitted — the
  * same shape `IcebergFilesSource.fromMetadataTable` gets from
  * `to_json(partition)`.
  */
object IcebergManifestSource {

  /** Full table-directory resolution (the reference's `load_table` →
    * `scan.snapshot()` chain, `manager.py:149-176`): find the current
    * metadata JSON under `<tableDir>/metadata/` (version-hint.text when
    * present, else the highest `*.metadata.json`), resolve
    * current-snapshot-id to its snapshot's manifest list, and read it.
    * A table with NO current snapshot returns (empty, 0) — the S6
    * empty-snapshot short-circuit on the real format, which the metrics
    * pipeline folds into the manifest-seeded all-zero row. The metadata
    * JSON is parsed by Spark's own JSON reader (one driver-side file). */
  def fromTableDir(spark: SparkSession, tableDir: String,
      table: String): (Dataset[FileEntry], Long) = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val meta = new Path(tableDir, "metadata")
    val fs = meta.getFileSystem(conf)
    val hint = new Path(meta, "version-hint.text")
    val metadataFile =
      if (fs.exists(hint)) {
        val in = fs.open(hint)
        val v = try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
        new Path(meta, s"v$v.metadata.json")
      } else {
        val cands = fs.listStatus(meta).map(_.getPath)
          .filter(_.getName.endsWith(".metadata.json"))
        require(cands.nonEmpty, s"no *.metadata.json under $meta")
        // NUMERIC version order: lexicographic maxBy would rank v9 above
        // v10; non-vN names (metastore UUID styles) sort by name below any
        // parsed version
        def version(p: Path): (Long, String) = {
          val m = "^v(\\d+)\\.metadata\\.json$".r.findFirstMatchIn(p.getName)
          (m.map(_.group(1).toLong).getOrElse(-1L), p.getName)
        }
        cands.maxBy(version)
      }
    val md = spark.read.option("multiLine", "true").json(metadataFile.toString)
    // schema-defensive: an empty `snapshots: []` infers as array<string>,
    // and a snapshot-less table may omit current-snapshot-id entirely
    val fields = md.schema.fieldNames.toSet
    val curId: Option[Long] =
      if (!fields.contains("current-snapshot-id")) None
      else Option(md.select(col("`current-snapshot-id`")).head())
        .filterNot(_.isNullAt(0)).map(_.getLong(0)).filter(_ != -1L)
    val listPath: Option[String] = curId.flatMap { id =>
      md.schema("snapshots").dataType match {
        case org.apache.spark.sql.types.ArrayType(
            st: org.apache.spark.sql.types.StructType, _)
            if st.fieldNames.contains("snapshot-id")
              && st.fieldNames.contains("manifest-list") =>
          md.select(explode(col("snapshots")).as("s"))
            .filter(col("s.`snapshot-id`") === id)
            .select(col("s.`manifest-list`"))
            .collect().headOption.map(_.getString(0))
        case _ => None
      }
    }
    listPath match {
      case Some(p) => fromManifestList(spark, p, table)
      case None => (spark.emptyDataset[FileEntry], 0L)
    }
  }

  /** Entries of every manifest in `manifestListPath`'s list, plus the
    * manifest count — the exact pair the reference feeds
    * `compute_metrics(files, len(manifests))`. */
  def fromManifestList(spark: SparkSession, manifestListPath: String,
      table: String): (Dataset[FileEntry], Long) = {
    val paths = manifestPaths(spark.sparkContext.hadoopConfiguration, manifestListPath)
    (fromManifests(spark, paths, table), paths.size.toLong)
  }

  /** Manifest paths from a manifest-list Avro file (driver-side — the
    * list is one row per manifest). */
  def manifestPaths(conf: Configuration, manifestListPath: String): Seq[String] =
    readAvro(conf, manifestListPath) { rec =>
      Iterator.single(rec.get("manifest_path").toString)
    }

  /** Distributed manifest scan: one task per manifest file. The SESSION's
    * Hadoop configuration ships to tasks as a SerializableConfiguration
    * (the OrphanFiles pattern) — a fresh executor-side Configuration
    * would drop every spark.hadoop.* setting (s3a credentials, endpoints)
    * and break exactly the remote filesystems manifests live on. */
  def fromManifests(spark: SparkSession, manifestPaths: Seq[String],
      table: String): Dataset[FileEntry] = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val n = math.max(1, math.min(manifestPaths.size, spark.sparkContext.defaultParallelism))
    spark.sparkContext.parallelize(manifestPaths, n)
      .flatMap(p => readManifestEntries(p, conf.value))
      .toDF("content", "partitionKey", "sizeBytes")
      .select(lit(table).as("table"), col("content"), col("partitionKey"),
        col("sizeBytes"))
      .as[FileEntry]
  }

  /** Live entries of one manifest as (content, partitionJson, sizeBytes).
    * Runs inside tasks with the session conf shipped by the caller. */
  private[sources] def readManifestEntries(path: String,
      conf: Configuration): Iterator[(Int, String, Long)] =
    readAvro(conf, path) { entry =>
      val status = entry.get("status").asInstanceOf[Int]
      if (status == 2) Iterator.empty // DELETED — discard_deleted=True
      else {
        val df = entry.get("data_file").asInstanceOf[GenericRecord]
        val content =
          if (df.getSchema.getField("content") == null) 0 // v1: all DataFiles
          else Option(df.get("content")).fold(0)(_.asInstanceOf[Int])
        val size = df.get("file_size_in_bytes").asInstanceOf[Long]
        val pk = Option(df.get("partition"))
          .map(p => partitionJson(p.asInstanceOf[GenericRecord]))
          .getOrElse("{}")
        Iterator.single((content, pk, size))
      }
    }.iterator

  /** Canonical partition key: JSON in record-field order, null fields
    * omitted — `to_json(struct)` semantics, so manifest-read entries and
    * metadata-table entries group identically. Strings are escaped
    * minimally (backslash, quote — partition values are path-safe
    * scalars). */
  private[graft] def partitionJson(rec: GenericRecord): String = {
    val fields = rec.getSchema.getFields
    val sb = new StringBuilder("{")
    var first = true
    val it = fields.iterator()
    while (it.hasNext) {
      val f = it.next()
      val v = rec.get(f.name())
      if (v != null) {
        if (!first) sb.append(',')
        first = false
        sb.append('"').append(f.name()).append("\":")
        v match {
          case n: java.lang.Number => sb.append(n.toString)
          case b: java.lang.Boolean => sb.append(b.toString)
          case s =>
            sb.append('"')
              .append(s.toString.replace("\\", "\\\\").replace("\"", "\\\""))
              .append('"')
        }
      }
    }
    sb.append('}').toString
  }

  /** Fold every record of an Avro container file through `f`. */
  private def readAvro[T](conf: Configuration, path: String)(
      f: GenericRecord => Iterator[T]): Seq[T] = {
    val in = new FsInput(new Path(path), conf)
    val reader = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[T]
      while (reader.hasNext) out ++= f(reader.next())
      out.toSeq
    } finally reader.close()
  }
}
