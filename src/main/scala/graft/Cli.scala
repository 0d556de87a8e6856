package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
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
  *   graft.Cli stream <dataRoot>     — run the streaming sessionizer over
  *                                     the events table as a file stream
  *   graft.Cli compact <dataRoot> [outRoot] — EXECUTE the 750 MiB bin-pack
  *                                     the diag report simulates, one
  *                                     distributed rewrite per table
  *   graft.Cli media <dataRoot>      — multimodal decode pipeline summary
  *   graft.Cli release <dataRoot>    — training-corpus release pipeline
  *                                     (decontaminate → PII → quality gates)
  *   graft.Cli remote <responseJson> — parse a remote-diagnostics response
  *                                     document and render its report
  *                                     (parsing only; nothing is posted)
  *   graft.Cli query <sfDir> <name|glob> [nRows] — run any catalog query
  *                                     (QUERIES.md) against a testdata dir,
  *                                     e.g. `query /root/testdata/sf0.001 q6*`
  *   graft.Cli expire <tableDir> <keepLast> — EXECUTE snapshot expiration
  *                                     on a real v2 layout (metadata bump +
  *                                     reachability-safe manifest cleanup)
  *   graft.Cli rwmanifests <tableDir> — consolidate the current snapshot's
  *                                     manifests (same relation, fewer files)
  *   graft.Cli rollback <tableDir> <snapshotId> — move the current pointer
  *                                     (and main) to a past snapshot; nothing
  *                                     deleted, instantly reversible
  *   graft.Cli manifest <tableDir>[@snap|@ref] — diagnose a real layout;
  *                                     @ pins a snapshot id or named ref
  *                                     (time travel)
  *   graft.Cli meta <tableDir> <table> — metadata tables incl. manifests/position_deletes/all_files: partitions |
  *                                     files | snapshots | refs | history
  *   graft.Cli rewrite <tableDir> [keys] — EXECUTE rewrite_data_files:
  *                                     MOR state rewritten fresh,
  *                                     tombstones dropped
  *   graft.Cli deletewhere <tableDir> [--keys=a,b] <pred...> — predicate
  *                                     DELETE via position tombstones
  *   graft.Cli footprint <dataRoot> [glob] — per-column storage audit
  *                                     from parquet footers only
  *
  * A "table" here is each `<name>.parquet` file/dir under dataRoot (the
  * environment has no Iceberg catalog; with one, the source swaps for the
  * `db.tbl.files` metadata relation — see FileEntrySource docs).
  */
object Cli {
  private def session(): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-cli")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val usage = "usage: graft.Cli (list|diag|stream|media|release) <dataRoot> [glob] | graft.Cli compact <dataRoot> [outRoot] | graft.Cli remote <responseJson|url> [tables...] | graft.Cli manifest <tableDir[@snapshotId|@ref]|manifestListAvro> [table] | graft.Cli changelog <tableDir> <fromSnap|ref> <toSnap|ref> | graft.Cli meta <tableDir> (partitions|files|snapshots|refs|history|manifests|position_deletes|all_files|data_files|delete_files|all_manifests|metadata_log_entries) | graft.Cli footprint <dataRoot> [glob] | graft.Cli rewrite <tableDir> [eqKeysCsv] | graft.Cli deletewhere|deletewheredv <tableDir> [--keys=a,b] <sqlPredicate...> | graft.Cli compactcommit <tableDir> [maxGroupBytes] | graft.Cli expire <tableDir> <keepLast> | graft.Cli rollback <tableDir> <snapshotId> | graft.Cli rwmanifests <tableDir> | graft.Cli rwposdeletes <tableDir> | graft.Cli converteqdeletes <tableDir> | graft.Cli pstats <tableDir> [auto|full] | graft.Cli cherrypick <tableDir> <snapshotId> | graft.Cli fanout <nTables> | graft.Cli sql <dataRoot> <statement> | graft.Cli catsql <warehouseDir> <statement> | graft.Cli query <dataRoot> <name|glob> [nRows]"
    if (args.length < 2) { System.err.println(usage); sys.exit(2) }
    val cmd = args(0)
    val root = args(1)
    val glob = if (args.length > 2) args(2) else "*"

    if (cmd == "compactcommit") {
      // EXECUTE the compaction preview as a new snapshot (metadata commit)
      val spark = session()
      try {
        val cap = if (args.length > 2) args(2).toLong
          else graft.model.EngineConfig.default.maxGroupBytes
        val (snap, before, after) =
          graft.sources.LayoutMaintenance.commitCompaction(spark, root, cap)
        if (before == after)
          println(s"already packed at $cap B: $before data files (snapshot $snap unchanged)")
        else println(s"committed snapshot $snap: $before data files -> $after")
      } finally spark.stop()
      return
    }

    if (cmd == "converteqdeletes" || cmd == "pstats") {
      // eq→pos tombstone conversion / partition-statistics maintenance
      val spark = session()
      try {
        if (cmd == "converteqdeletes") {
          val (snap, before, pairs) = graft.sources.LayoutMaintenance
            .convertEqualityDeletes(spark, root)
          if (before == 0) println("no equality-delete files: nothing to do")
          else println(s"committed snapshot $snap: $before equality-delete " +
            s"files -> $pairs position pairs")
        } else {
          val mode = if (args.length > 2) args(2) else "auto"
          val (path, snap, n, arm) = graft.sources.LayoutMaintenance
            .computePartitionStatsMode(spark, root, mode)
          println(s"partition stats for snapshot $snap: $n partitions " +
            s"($arm) -> $path")
        }
      } finally spark.stop()
      return
    }

    if (cmd == "rwposdeletes" || cmd == "cherrypick") {
      // delete-file compaction / WAP publish onto a moved head
      val spark = session()
      try {
        if (cmd == "rwposdeletes") {
          val (snap, before, after, pairs) = graft.sources.LayoutMaintenance
            .rewritePositionDeletes(spark, root)
          if (before == 0) println("no position-delete files: nothing to do")
          else println(s"committed snapshot $snap: $before position-delete " +
            s"files -> $after ($pairs live pairs kept)")
        } else {
          if (args.length < 3) { System.err.println(usage); sys.exit(2) }
          val snap = graft.sources.LayoutMaintenance
            .cherryPick(spark, root, args(2).toLong)
          println(s"cherry-picked snapshot ${args(2)} onto head: new snapshot $snap")
        }
      } finally spark.stop()
      return
    }

    if (cmd == "expire" || cmd == "rwmanifests" || cmd == "rollback") {
      // EXECUTED metadata maintenance on a real table layout
      val spark = session()
      try {
        if (cmd == "expire") {
          if (args.length < 3) { System.err.println(usage); sys.exit(2) }
          val (kept, deleted) = graft.sources.LayoutMaintenance
            .expireSnapshots(spark, root, args(2).toInt)
          println(s"kept snapshots: ${kept.mkString(", ")}; deleted $deleted metadata files")
        } else if (cmd == "rollback") {
          if (args.length < 3) { System.err.println(usage); sys.exit(2) }
          val prev = graft.sources.LayoutMaintenance
            .rollback(spark, root, args(2).toLong)
          println(s"current snapshot: ${prev.map(_.toString).getOrElse("(none)")} -> ${args(2)}")
        } else {
          val (before, after) = graft.sources.LayoutMaintenance
            .rewriteManifests(spark, root)
          println(s"manifests: $before -> $after")
        }
      } finally spark.stop()
      return
    }

    if (cmd == "rewrite" || cmd == "deletewhere" || cmd == "deletewheredv") {
      // executed data-path maintenance: rewrite_data_files (MOR state
      // rewritten fresh, tombstones dropped) and predicate DELETE via
      // position tombstones
      val spark = session()
      try {
        if (cmd == "rewrite") {
          val eqKeys = if (args.length > 2) args(2).split(',').toSeq.filter(_.nonEmpty) else Nil
          val (snap, n, before, after) = graft.sources.LayoutMaintenance
            .rewriteDataFiles(spark, root, eqKeys)
          println(s"committed snapshot $snap: $before data files -> $after, $n rows rewritten, tombstones dropped")
        } else {
          // sbt passes each word separately — everything after the table
          // (and an optional leading --keys=a,b) is the predicate
          if (args.length < 3) { System.err.println(usage); sys.exit(2) }
          val (eqKeys, predParts) =
            if (args(2).startsWith("--keys="))
              (args(2).stripPrefix("--keys=").split(',').toSeq.filter(_.nonEmpty),
                args.drop(3))
            else (Nil, args.drop(2))
          if (predParts.isEmpty) { System.err.println(usage); sys.exit(2) }
          val (snap, n) =
            if (cmd == "deletewheredv")
              graft.sources.LayoutMaintenance.commitDeleteWhereDv(
                spark, root, expr(predParts.mkString(" ")), eqKeys)
            else graft.sources.LayoutMaintenance.commitDeleteWhere(
              spark, root, expr(predParts.mkString(" ")), eqKeys)
          val how = if (cmd == "deletewheredv") "a Puffin deletion vector"
            else "position tombstones"
          println(s"committed snapshot $snap: $n rows deleted via $how")
        }
      } finally spark.stop()
      return
    }

    if (cmd == "footprint") {
      // per-column storage audit from parquet footers (KBs read per file)
      val spark = session()
      try {
        graft.sources.ParquetFooterAudit.auditRoot(spark, root, glob)
          .orderBy(col("table"), col("compressed_bytes").desc)
          .show(500, truncate = false)
      } finally spark.stop()
      return
    }

    if (cmd == "meta") {
      // metadata-tables inspection (q185 surface): partitions | files |
      // snapshots | refs | history over a written v2 layout
      if (args.length < 3) { System.err.println(usage); sys.exit(2) }
      val spark = session()
      try {
        import graft.sources.MetadataTables
        // the parent table's data schema (first-file inference /
        // descriptor) feeds readable_metrics on files/entries — a
        // data-less layout serves the relations without it. Lazy: only
        // the kinds that use it pay the connector load.
        lazy val dataSchema: Option[org.apache.spark.sql.types.StructType] =
          try Some(spark.read.format("graft-iceberg").load(root).schema)
          catch { case scala.util.control.NonFatal(_) => None }
        val df = args(2) match {
          case "partitions" => MetadataTables.partitions(spark, root)
            .orderBy(col("partition"))
          case "files" => MetadataTables.files(spark, root,
              dataSchema = dataSchema)
            .orderBy(col("content"), col("file_path"))
          case "snapshots" => MetadataTables.snapshots(spark, root)
            .orderBy(col("ordinal"))
          case "refs" => MetadataTables.refs(spark, root).orderBy(col("name"))
          case "history" => MetadataTables.history(spark, root)
            .orderBy(col("ordinal"))
          case "manifests" => MetadataTables.manifests(spark, root)
            .orderBy(col("path"))
          case "position_deletes" => MetadataTables.positionDeletes(spark, root)
            .orderBy(col("file_path"), col("pos"))
          case "all_files" => MetadataTables.allFiles(spark, root)
            .orderBy(col("content"), col("file_path"))
          case "data_files" => MetadataTables.dataFiles(spark, root,
              dataSchema = dataSchema)
            .orderBy(col("file_path"))
          case "delete_files" => MetadataTables.deleteFiles(spark, root,
              dataSchema = dataSchema)
            .orderBy(col("file_path"))
          case "all_manifests" => MetadataTables.allManifests(spark, root)
            .orderBy(col("reference_snapshot_id"), col("path"))
          case "metadata_log_entries" =>
            MetadataTables.metadataLogEntries(spark, root)
              .orderBy(col("version"))
          case "entries" => MetadataTables.entries(spark, root,
              dataSchema = dataSchema)
            .orderBy(col("status"), col("file_path"))
          case "all_entries" => MetadataTables.allEntries(spark, root)
            .orderBy(col("snapshot_id"), col("status"), col("file_path"))
          case "all_data_files" => MetadataTables.allDataFiles(spark, root)
            .orderBy(col("file_path"))
          case "all_delete_files" => MetadataTables.allDeleteFiles(spark, root)
            .orderBy(col("file_path"))
          case "all_partitions" => MetadataTables.allPartitions(spark, root)
            .orderBy(col("partition"))
          case other =>
            System.err.println(
              s"error: unknown metadata table '$other' (partitions|files|" +
                "snapshots|refs|history|manifests|position_deletes|" +
                "all_files|data_files|delete_files|all_manifests|" +
                "metadata_log_entries|entries|all_entries|all_data_files|" +
                "all_delete_files|all_partitions)")
            sys.exit(2)
        }
        df.show(100, truncate = false)
      } finally spark.stop()
      return
    }

    if (cmd == "changelog") {
      // incremental snapshot changelog straight from manifest metadata
      // (q169 semantics): endpoints are snapshot ids or ref names
      if (args.length < 4) { System.err.println(usage); sys.exit(2) }
      val spark = session()
      try {
        def endpoint(a: String): Long =
          if (a.nonEmpty && a.forall(_.isDigit)) a.toLong
          else graft.sources.IcebergManifestSource.refSnapshotId(spark, root, a)
            .getOrElse {
              System.err.println(s"error: no such ref or snapshot: $a")
              sys.exit(1)
            }
        val (from, to) = (endpoint(args(2)), endpoint(args(3)))
        val ids = graft.sources.LayoutMaintenance.snapshotIds(spark, root)
        Seq(from, to).filterNot(ids.contains).foreach { id =>
          System.err.println(s"error: no such snapshot: $id (history: ${ids.mkString(", ")})")
          sys.exit(1)
        }
        val rows = graft.sources.IcebergManifestSource
          .changesBetween(spark, root, "t", from, to)
          .orderBy(col("change"), col("file_path"))
          .collect()
        println(s"changes $from -> $to: ${rows.length} files")
        rows.foreach { r =>
          println(f"  ${r.getAs[String]("change")}%-8s c${r.getAs[Int]("content")} " +
            f"${r.getAs[Long]("record_count")}%8d rows ${r.getAs[Long]("size_bytes")}%12d B  " +
            r.getAs[String]("file_path"))
        }
      } finally spark.stop()
      return
    }

    if (cmd == "query") {
      // run any catalog query (QUERIES.md) by name or glob against a sf dir;
      // the glob is REQUIRED here — falling back to '*' would silently run
      // every catalog query
      if (args.length < 3) { System.err.println(usage); sys.exit(2) }
      val n = if (args.length > 3) {
        args(3).toIntOption.getOrElse {
          System.err.println(s"error: nRows must be an integer, got '${args(3)}'")
          sys.exit(2)
        }
      } else 20
      val names = SparkEntry.queries.keys.toSeq.sorted
        .filter(Pure.globMatch(glob, _))
      if (names.isEmpty) {
        System.err.println(s"error: no query matches '$glob'; see QUERIES.md")
        sys.exit(1)
      }
      val spark = session()
      try names.foreach { name =>
        println(s"== $name ==")
        SparkEntry.queries(name)(spark, root).show(n, truncate = false)
      } finally spark.stop()
      return
    }

    if (cmd == "remote") {
      // a file path renders a saved response document; an http(s) URL
      // drives the full transport loop (tables listed after the URL)
      val isUrl = root.startsWith("http://") || root.startsWith("https://")
      val f = new java.io.File(root)
      if (!isUrl && !f.isFile) { System.err.println(s"error: no such response file: $root"); sys.exit(1) }
      val spark = session()
      import spark.implicits._
      try {
        val (rows, errors) =
          if (isUrl)
            graft.sources.RemoteRequester.requestMetrics(spark, root, args.drop(2).toSeq)
          else {
            val doc = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
            graft.sources.RemoteMetrics.parse(spark.createDataset(Seq(doc)))
          }
        rows.collect().groupBy(_.table).toSeq.sortBy(_._1).foreach { case (tbl, rs) =>
          println(Renderer.renderTable(tbl, rs.toSeq, Renderer.RemoteMode)); println()
        }
        val errs = errors.collect()
        if (errs.nonEmpty) {
          System.err.println("errors:")
          errs.foreach { case (t, e) => System.err.println(s"  $t: $e") }
        }
      } finally spark.stop()
      return
    }

    if (cmd == "sql") {
      // ad-hoc SQL over the corpus: every <name>.parquet becomes a temp
      // view (events with its canonical ts derivation) and the native
      // graft functions are registered — the whole engine from one string
      if (args.length < 3) { System.err.println(usage); sys.exit(2) }
      val stmt = args.drop(2).mkString(" ")
      val spark = session()
      try {
        val views = graft.sources.SqlEnv.register(spark, root)
        System.err.println(s"views: ${views.mkString(", ")}")
        spark.sql(stmt).show(50, truncate = false)
      } finally spark.stop()
      return
    }

    if (cmd == "catsql") {
      // identifier-addressed SQL over a layout-table WAREHOUSE: register
      // the graft TableCatalog as `wh` and run the statement — the full
      // DML/DDL surface (CREATE/INSERT/UPDATE/MERGE/DELETE/OVERWRITE,
      // time travel, metadata tables) from one string.
      //   Cli catsql <warehouseDir> SELECT * FROM wh.db.t.snapshots
      if (args.length < 3) { System.err.println(usage); sys.exit(2) }
      val stmt = args.drop(2).mkString(" ")
      val spark = session()
      try {
        spark.conf.set("spark.sql.catalog.wh",
          classOf[graft.sources.v2.GraftCatalog].getName)
        spark.conf.set("spark.sql.catalog.wh.warehouse", root)
        spark.sql(stmt).show(50, truncate = false)
      } finally spark.stop()
      return
    }

    if (cmd == "fanout") {
      // whole-catalog diagnosis at width: N synthesized tables, ONE job
      val n = args(1).toIntOption.getOrElse {
        System.err.println(s"error: fanout takes a table count, got '${args(1)}'")
        sys.exit(2)
      }
      val spark = session()
      try {
        val t0 = System.nanoTime()
        val wide = MetricsCalculator.computeMetricsWide(
          graft.metrics.Fanout.syntheticEntries(spark, n),
          graft.metrics.Fanout.manifestCounts(spark, n)).cache()
        val rows = wide.count()
        val secs = (System.nanoTime() - t0) / 1e9
        wide.orderBy(col("table")).limit(2).collect().foreach { w =>
          println(Renderer.renderTable(w.table, w.toRows, Renderer.LocalMode)); println()
        }
        println(f"diagnosed $rows tables in one job in $secs%.2f s " +
          s"(shuffle count independent of table count; showing 2 of $rows panels)")
      } finally spark.stop()
      return
    }

    if (cmd == "manifest") {
      // diagnose straight from an Iceberg snapshot's manifest list (Avro) —
      // the reference's actual input surface, no Iceberg runtime needed.
      // Trailing `@<snapshotId>` or `@<refName>` on a table dir pins a
      // past snapshot / named ref (time travel through the same resolver
      // q154 gates).
      val table = if (args.length > 2) args(2) else "table"
      val spark = session()
      try {
        import spark.implicits._
        // a directory with metadata/ is a full Iceberg table layout;
        // anything else is a manifest-list Avro file. Hadoop FS detection
        // (not java.io.File) so hdfs:///s3a:// table dirs route correctly
        // '@' is legal inside paths — the suffix is a pin ONLY when the
        // full path does not exist but the prefix before the last '@'
        // does (so `tbl@2` pins, while a real dir literally named
        // `data@v2` resolves as itself)
        def hfsExists(p: String): Boolean =
          try {
            val hp = new org.apache.hadoop.fs.Path(p)
            hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
          } catch { case _: Exception => false }
        val (rootDir, pin) = root.lastIndexOf('@') match {
          case i if i > 0 && !hfsExists(root) && hfsExists(root.substring(0, i)) =>
            (root.substring(0, i), Some(root.substring(i + 1)))
          case _ => (root, None)
        }
        val root2 = if (pin.isDefined) rootDir else root
        val rootPath = new org.apache.hadoop.fs.Path(root2)
        val rootFs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val metaPath = new org.apache.hadoop.fs.Path(rootPath, "metadata")
        val isTableDir =
          try rootFs.exists(metaPath) && rootFs.getFileStatus(metaPath).isDirectory
          catch { case _: Exception => false }
        val snapId: Option[Long] = pin.flatMap { p =>
          if (!isTableDir) {
            System.err.println(s"error: @$p pinning needs a table directory, not a manifest list")
            sys.exit(1)
          }
          if (p.nonEmpty && p.forall(_.isDigit)) {
            // a numeric pin gets the same existence gate a ref name does —
            // `tbl@999` must error, not print an empty diagnosis
            val id = p.toLong
            val ids = graft.sources.LayoutMaintenance.snapshotIds(spark, root2)
            if (!ids.contains(id)) {
              System.err.println(
                s"error: no such snapshot: $p (history: ${ids.mkString(", ")})")
              sys.exit(1)
            }
            Some(id)
          }
          else graft.sources.IcebergManifestSource.refSnapshotId(spark, root2, p)
            .orElse {
              System.err.println(s"error: no such ref or snapshot: $p")
              sys.exit(1); None
            }
        }
        val (files, n) =
          try {
            if (isTableDir)
              graft.sources.IcebergManifestSource.fromTableDir(spark, root2, table, snapId)
            else
              graft.sources.IcebergManifestSource.fromManifestList(spark, root2, table)
          } catch {
            case e: java.io.FileNotFoundException =>
              System.err.println(s"error: no such manifest list: ${e.getMessage}")
              sys.exit(1)
            case e: org.apache.avro.InvalidAvroMagicException =>
              System.err.println(s"error: not an Avro file: $root2")
              sys.exit(1)
          }
        // seed the manifest count explicitly: an EMPTY snapshot must still
        // render the all-zero 9-metric row (reference compute_metrics([], n))
        val rows = MetricsCalculator
          .computeMetricsWide(files, Seq((table, n)).toDS())
          .collect().toSeq.flatMap(_.toRows)
        println(Renderer.renderTable(table, rows, Renderer.LocalMode))
        println(Renderer.countMessage(n.toInt, "manifest"))
      } finally spark.stop()
      return
    }

    // Hadoop FileSystem discovery (not java.io.File): hdfs:// and s3a://
    // roots list identically to local paths, and a missing root is loud
    val allTables =
      try graft.sources.TableDiscovery.list(new org.apache.hadoop.conf.Configuration(), root)
      catch { case e: java.io.FileNotFoundException =>
        System.err.println(s"error: ${e.getMessage}"); sys.exit(1); Seq.empty }
    val tables = allTables.filter { case (n, _) => Pure.globMatch(glob, n) }

    cmd match {
      case "list" =>
        println(Renderer.renderList(tables.map(_._1), s"Tables in $root matching '$glob'"))
        println(Renderer.countMessage(tables.size, "table"))
        if (tables.isEmpty) System.err.println("warning: no tables matched")

      case "diag" =>
        if (tables.isEmpty) { System.err.println(s"error: no tables match '$glob' under $root"); sys.exit(1) }
        val spark = session()
        import spark.implicits._
        try {
          // union-all multi-table plan: one Dataset[FileEntry] for ALL
          // tables. Above 16 tables the LISTING itself goes distributed
          // too (one task per table dir) — the driver loop of FS listings
          // is the serial bottleneck at catalog width, not the metrics job
          val files =
            if (tables.size > 16) FileEntrySource.fromDirectories(spark, tables)
            else tables
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

      case "stream" =>
        val spark = session()
        import spark.implicits._
        try {
          // file-source streaming read of the events table,
          // gap-sessionized with event-time state + watermark timeout
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          val schema = spark.read.parquet(s"$root/events.parquet").schema
          val tsUs = graft.operators.Rel.tsUsSql(schema("ts").dataType)
          val stream = spark.readStream.schema(schema).parquet(s"$root/events*.parquet")
            .selectExpr("user_id", "event_id", s"$tsUs AS ts_us", "value")
            .as[graft.streaming.Sessionizer.Event]
          val sessions = graft.streaming.Sessionizer.sessionize(stream, gapUs = 30L * 60 * 1000000)
          val q = sessions.writeStream.format("memory").queryName("sessions")
            .outputMode("append").start()
          q.processAllAvailable()
          q.stop()
          val n = spark.table("sessions").count()
          val perUser = spark.table("sessions").groupBy(col("user_id"))
            .count().orderBy(col("count").desc, col("user_id")).limit(5).collect()
          println(s"closed sessions: $n")
          perUser.foreach(r => println(s"  user ${r.get(0)}: ${r.get(1)} sessions"))
          // stream-stream interval join: purchases x signups within 24h
          val evStream = spark.readStream.schema(schema).parquet(s"$root/events*.parquet")
          def side(t: String) = evStream.filter(col("event_type") === t)
            .selectExpr("user_id", "event_id", s"$tsUs AS ts_us", "value")
            .as[graft.streaming.Sessionizer.Event]
          val joined = graft.streaming.Sessionizer.purchasesWithRecentSignups(
            side("purchase"), side("signup"), intervalUs = 24L * 3600 * 1000000)
          val q2 = joined.writeStream.format("memory").queryName("ssjoin")
            .outputMode("append").start()
          q2.processAllAvailable()
          q2.stop()
          println(s"purchase-signup pairs within 24h: ${spark.table("ssjoin").count()}")
        } finally spark.stop()

      case "compact" =>
        // executable compaction of every table into <outRoot>/<table>
        // (third arg = output root; data roots may be read-only)
        val outRoot = if (args.length > 2) args(2)
          else java.nio.file.Files.createTempDirectory("graft_compacted").toString
        if (allTables.isEmpty) { System.err.println(s"error: no tables under $root"); sys.exit(1) }
        val spark = session()
        // nanos timestamps (events) read as long — value-preserving rewrite
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try {
          allTables.foreach { case (name, path) =>
            val r = graft.sources.Compactor.compact(spark, path, s"$outRoot/$name")
            println(f"$name%-12s ${r.filesBefore}%4d files -> ${r.filesAfter}%4d " +
              s"(${Pure.formatSize(r.bytesTotal.toDouble)}) at $outRoot/$name")
          }
        } finally spark.stop()

      case "release" =>
        // training-corpus release pipeline (q80): decontaminate → PII-scrub
        // → quality-gate → per-language report, one DAG
        val spark = session()
        try {
          val rows = graft.operators.Queries5.all("q80_corpus_release")(spark, root).collect()
          println("lang   docs    tokens  pii_docs  avg_ttr")
          rows.foreach(r => println(
            f"${r.getString(0)}%-6s ${r.getLong(1)}%5d ${r.getLong(2)}%9d ${r.getLong(3)}%9d  ${r.getDouble(4)}%.4f"))
          println(Renderer.countMessage(rows.map(_.getLong(1)).sum.toInt, "released doc"))
        } finally spark.stop()

      case "media" =>
        val spark = session()
        try {
          val feats = graft.multimodal.Multimodal.extractFeatures(
            graft.multimodal.Multimodal.syntheticMedia(spark, root))
          val summary = feats.groupBy(col("kind"))
            .agg(count(lit(1)).as("n"), avg(col("width")).as("avg_w"),
              avg(col("n_frames")).as("avg_frames"))
            .orderBy(col("kind")).collect()
          summary.foreach(r => println(
            f"${r.getString(0)}%-6s n=${r.getLong(1)} avg_width=${r.getDouble(2)}%.1f avg_frames=${r.getDouble(3)}%.1f"))
        } finally spark.stop()

      case other =>
        System.err.println(s"error: unknown command '$other'\n$usage"); sys.exit(2)
    }
  }
}
