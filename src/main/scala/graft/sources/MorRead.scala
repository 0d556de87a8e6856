package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read delete application — the Iceberg v2 read-path semantics
  * (public spec, "Row-level deletes"): a data row survives a snapshot iff
  * no delete file visible to it marks it deleted, where visibility is
  * sequence-number-based and DIFFERS by delete kind:
  *
  *   - POSITION deletes target a concrete (file_path, pos) and apply to
  *     data sequence numbers <= the delete's sequence number (a position
  *     delete written in the same commit as the data file CAN delete
  *     from it);
  *   - EQUALITY deletes target a key tuple and apply STRICTLY BELOW the
  *     delete's sequence number (an equality delete never deletes rows
  *     committed with it — that asymmetry is the spec's, not ours).
  *
  * Both applications are LEFT ANTI joins with the sequence predicate in
  * the join condition. Delete relations are USUALLY tiny relative to
  * data (they are the tombstones, not the corpus), so the hint gates on
  * the optimizer's size estimate rather than forcing a broadcast: a
  * delete set that outgrows the broadcast budget would OOM the driver if
  * hinted unconditionally, and an unhinted join still lets AQE convert
  * to broadcast at runtime from exact sizes. MorReadSpec pins the two
  * boundary asymmetries (seq ==) on a hand-built fixture; the same spec
  * drives [[readTable]] over a REAL on-disk v2 layout.
  */
object MorRead {

  /** Broadcast only when the optimizer's size estimate fits the session's
    * autoBroadcastJoinThreshold (disabled threshold = never hint). */
  private def maybeBroadcast(df: DataFrame): DataFrame = {
    val thr = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    if (thr > 0 &&
        df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(thr)) broadcast(df)
    else df
  }

  /** Position-delete anti join: kills (file_path, pos) rows whose
    * data_seq <= the tombstone's seq. */
  def applyPosDeletes(data: DataFrame, posDeletes: DataFrame): DataFrame =
    data.join(
      maybeBroadcast(posDeletes.select(col("file_path").as("pd_file"),
        col("pos").as("pd_pos"), col("seq").as("pd_seq"))),
      col("file_path") === col("pd_file") && col("pos") === col("pd_pos")
        && col("data_seq") <= col("pd_seq"),
      "left_anti")

  /** Equality-delete anti join: kills rows matching the key tuple with
    * data_seq STRICTLY below the tombstone's seq. Null-SAFE equality:
    * Iceberg equality-delete matching treats null as equal to null (a
    * NULL-keyed tombstone deletes NULL rows). */
  def applyEqDeletes(data: DataFrame, eqDeletes: DataFrame,
      eqKeys: Seq[String]): DataFrame = {
    val ed = eqDeletes.select(
      (col("seq").as("ed_seq") +: eqKeys.map(k => col(k).as(s"ed_$k"))): _*)
    data.join(
      maybeBroadcast(ed),
      eqKeys.map(k => col(k) <=> col(s"ed_$k"))
        .reduce(_ && _) && col("data_seq") < col("ed_seq"),
      "left_anti")
  }

  /** @param data      data rows carrying `file_path`, `pos`, `data_seq`,
    *                   plus payload columns
    * @param posDeletes (file_path, pos, seq) tombstones
    * @param eqDeletes  (seq + the key columns named in `eqKeys`)
    * @return surviving data rows, original schema */
  def applyDeletes(
      data: DataFrame,
      posDeletes: DataFrame,
      eqDeletes: DataFrame,
      eqKeys: Seq[String]): DataFrame = {
    val afterPos = applyPosDeletes(data, posDeletes)
    if (eqKeys.isEmpty) afterPos // no equality-delete key spec: pos-only read
    else applyEqDeletes(afterPos, eqDeletes, eqKeys)
  }

  /** END-TO-END merge-on-read over a real v2 table directory: resolve
    * the current snapshot through [[IcebergManifestSource]], split the
    * manifest entries by content (0=data, 1=position deletes, 2=equality
    * deletes) with their sequence numbers, read the parquet data AND
    * delete files themselves, and apply both delete kinds. One call:
    * `readTable(spark, dir, eqKeys)` → surviving payload rows.
    *
    * Positions come from the parquet reader's own `_metadata.row_index`
    * (the row's ordinal within its file — exactly the spec's `pos`) and
    * file identity from `_metadata.file_path`, normalized against the
    * manifest/tombstone paths (`file:` scheme variants collapse to a
    * bare absolute path). Per-file sequence numbers attach via a
    * broadcast join against the metadata-sized (path, seq) relation —
    * the fact scan itself never shuffles.
    */
  def readTable(spark: SparkSession, tableDir: String,
      eqKeys: Seq[String] = Nil,
      renames: Map[String, Seq[String]] = Map.empty,
      dataSchema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame =
    readTableLineage(spark, tableDir, eqKeys, renames, dataSchema)
      .drop("file_path", "pos", "data_seq")

  /** [[readTable]] keeping the row lineage columns (`file_path`, `pos`,
    * `data_seq`) — the input a position-delete WRITER needs: a predicate
    * over this relation yields exactly the (file, pos) tombstones that
    * delete those rows ([[LayoutMaintenance.commitDeleteWhere]]). */
  /** @param renames (current column name -> its FORMER names, most
    *   recent first) for tables that went through ALTER TABLE RENAME
    *   COLUMN: data files written before the rename carry the old
    *   physical name, so the scan reads with schema merging and folds
    *   each name generation into the current column (a file holds
    *   exactly one generation, so the fold is a coalesce). Empty map =
    *   the untouched fast path. */
  /** @param dataSchema the table's DECLARED data schema (no lineage /
    *   metadata columns) when known — catalog tables pass it. With a
    *   declared schema the parquet read binds by name against it and
    *   Spark's reader WIDENS narrow physical types per value (the
    *   int->long / float->double ALTER COLUMN promotions), and rename
    *   aliases read as extra typed columns instead of a schema-merge
    *   pass. Without it, inference (+ mergeSchema when renames exist)
    *   as before. */
  def readTableLineage(spark: SparkSession, tableDir: String,
      eqKeys: Seq[String] = Nil,
      renames: Map[String, Seq[String]] = Map.empty,
      dataSchema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    import spark.implicits._
    def norm(p: String): String = p.replaceFirst("^file:/+", "/")
    // declared-schema read: current columns at their DECLARED (possibly
    // widened) types, plus one column per recorded FORMER name typed
    // like its current column — a file binds whichever generation it
    // physically has, the others null-fill, and foldAliases collapses
    val readSchema: Option[org.apache.spark.sql.types.StructType] =
      dataSchema.map { s =>
        val aliasCols = renames.toSeq.flatMap { case (cur, olds) =>
          s.fields.find(_.name == cur).toSeq.flatMap(f =>
            olds.filterNot(s.fieldNames.contains)
              .map(a => f.copy(name = a)))
        }
        org.apache.spark.sql.types.StructType(s.fields ++ aliasCols)
      }
    def foldAliases(df: DataFrame): DataFrame =
      renames.foldLeft(df) { case (d, (cur, olds)) =>
        val have = d.columns.toSet
        val gens = (cur +: olds).filter(have)
        val away = olds.filter(have)
        if (gens.isEmpty || (gens == Seq(cur))) d
        else d.withColumn(cur,
            if (gens.size == 1) col(gens.head)
            else coalesce(gens.map(col): _*))
          .drop(away.filterNot(_ == cur): _*)
      }
    val normCol = (c: org.apache.spark.sql.Column) =>
      regexp_replace(c, "^file:/+", "/")
    val entries = IcebergManifestSource
      .statsFromTableDir(spark, tableDir, "t", Nil)
      .select(col("file_path"), col("content"), col("sequence_number"),
        col("file_format"))
      .collect() // metadata-sized: one row per FILE
      .map(r => (norm(r.getString(0)), r.getInt(1), r.getLong(2), r.getString(3)))
    val dataFiles = entries.filter(_._2 == 0)
    if (dataFiles.isEmpty) return spark.emptyDataFrame
    val posFiles = entries.filter(_._2 == 1)
    val eqFiles = entries.filter(_._2 == 2)
    val orcPaths = dataFiles.filter(_._4 == "ORC").map(_._1).toSet
    // eq keys from METADATA when the caller names none (spec
    // `equality_ids` resolved against the data schema); legacy layouts
    // without ids keep the out-of-band contract: empty keys skip eq
    // application, as before
    val resolvedEqKeys: Seq[String] =
      if (eqKeys.nonEmpty || eqFiles.isEmpty) eqKeys
      else metadataEqKeys(spark, tableDir)

    def withSeq(paths: Array[(String, Int, Long, String)], seqName: String,
        orc: Boolean = false, declared: Boolean = false): DataFrame = {
      val seqDf = paths.map { case (p, _, s, _) => (p, s) }.toSeq.toDF("__fp", seqName)
      val raw =
        if (orc) spark.read.orc(paths.map(_._1).toIndexedSeq: _*)
        else readSchema match {
          case Some(s) if declared => spark.read.schema(s)
            .parquet(paths.map(_._1).toIndexedSeq: _*)
          case _ if renames.isEmpty =>
            spark.read.parquet(paths.map(_._1).toIndexedSeq: _*)
          // renamed tables without a declared schema: merge the name
          // generations into one schema, then fold below
          case _ => spark.read.option("mergeSchema", "true")
            .parquet(paths.map(_._1).toIndexedSeq: _*)
        }
      foldAliases(raw)
        .withColumn("__own", normCol(col("_metadata.file_path")))
        .join(broadcast(seqDf), col("__own") === col("__fp"))
        .drop("__own", "__fp")
    }

    // Mixed-format data: parquet files carry their row ordinal
    // (`_metadata.row_index` — the spec's `pos`); ORC files have no
    // row-index metadata column in this Spark, so their rows read with a
    // NULL pos. That is sound ONLY while no position tombstone targets an
    // ORC file (a null pos never equi-matches a tombstone), which the
    // guard below enforces from the tombstones' own contents — equality
    // deletes are key-matched and apply to both formats unchanged.
    val (orcData, parqData) = dataFiles.partition(e => orcPaths.contains(e._1))
    val parq =
      if (parqData.isEmpty) None
      else Some(withSeq(parqData, "data_seq", declared = true)
        .withColumn("file_path", normCol(col("_metadata.file_path")))
        .withColumn("pos", col("_metadata.row_index")))
    val orc =
      if (orcData.isEmpty) None
      else Some(withSeq(orcData, "data_seq", orc = true)
        .withColumn("file_path", normCol(col("_metadata.file_path")))
        .withColumn("pos", lit(null).cast("long")))
    val data = (parq, orc) match {
      case (Some(p), Some(o)) => p.unionByName(o)
      case (Some(p), None) => p
      case (None, Some(o)) => o
      case (None, None) => return spark.emptyDataFrame
    }
    // DELETION VECTORS (fileFormat=PUFFIN content=1 entries) decode
    // driver-side into the same (file_path, pos, seq) tombstone relation
    // as parquet pos-delete files — one blob per target, reject-sized by
    // the delete-commit contract — and apply identically downstream
    val (dvFiles, parqPosFiles) = posFiles.partition(_._4 == "PUFFIN")
    val dvTomb: Option[DataFrame] =
      if (dvFiles.isEmpty) None
      else Some(spark.createDataFrame(dvFiles.toSeq.flatMap {
        case (p, _, seq, _) =>
          DeletionVectors.read(new java.io.File(p)).flatMap {
            case (target, poss) => poss.map(pos => (norm(target), pos, seq))
          }
      }).toDF("file_path", "pos", "seq"))
    val afterPos =
      if (parqPosFiles.isEmpty && dvTomb.isEmpty) data
      else {
        val parqTomb: Option[DataFrame] =
          if (parqPosFiles.isEmpty) None
          else Some(withSeq(parqPosFiles, "seq")
            .select(normCol(col("file_path")).as("file_path"),
              col("pos"), col("seq")))
        val tomb = (parqTomb, dvTomb) match {
          case (Some(a), Some(b)) => a.unionByName(b)
          case (Some(a), None) => a
          case (None, Some(b)) => b
          case (None, None) => sys.error("unreachable: both empty")
        }
        if (orcData.nonEmpty) {
          // file-count-sized distinct, not row-sized
          val targeted = tomb.select(col("file_path")).distinct()
            .collect().map(_.getString(0)).toSet
          val hit = targeted.intersect(orcPaths)
          require(hit.isEmpty,
            s"readTable($tableDir): position tombstones target ORC data " +
              s"files ${hit.take(3).mkString(", ")} — ORC rows carry no " +
              "row ordinal, so position deletes cannot apply; rewrite the " +
              "file to parquet or use equality deletes")
        }
        applyPosDeletes(data, tomb)
      }
    if (eqFiles.isEmpty || resolvedEqKeys.isEmpty) afterPos
    else applyEqDeletes(afterPos, withSeq(eqFiles, "seq"), resolvedEqKeys)
  }

  /** The equality-delete KEY COLUMN NAMES a table's metadata declares:
    * every live eq-delete entry's spec `equality_ids` (all entries must
    * agree — per-file key sets would need per-file application, refused
    * as Nil), resolved positionally against a live data file's footer
    * schema (the dialect's field-id convention: field id N = Nth
    * column). Nil when the table carries no eq deletes, no ids (legacy
    * out-of-band layouts), or disagreeing id sets. */
  def metadataEqKeys(spark: SparkSession, tableDir: String): Seq[String] = {
    val raw = IcebergManifestSource
      .statsFromTableDir(spark, tableDir, "t", Nil)
      .select(col("file_path"), col("content"), col("equality_ids"))
      .collect()
    val idSets = raw.filter(_.getInt(1) == 2)
      .map(r => Option(r.getAs[scala.collection.Seq[Int]](2))
        .map(_.toSeq).getOrElse(Seq.empty))
      .filter(_.nonEmpty).map(_.toSeq).distinct
    val dataPath = raw.find(_.getInt(1) == 0).map(_.getString(0))
    (idSets, dataPath) match {
      case (Array(ids), Some(p)) =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p.replaceFirst("^file:/+", "/")),
          spark.sparkContext.hadoopConfiguration)
        val rr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        val fs = try rr.getFooter.getFileMetaData.getSchema finally rr.close()
        ids.flatMap { id =>
          if (id >= 1 && id <= fs.getFieldCount)
            Some(fs.getFields.get(id - 1).getName)
          else None
        }
      case _ => Nil
    }
  }
}
