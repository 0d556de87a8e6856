package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.hadoop.hive.ql.exec.vector._
import org.apache.orc.{OrcFile, TypeDescription}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Distributed ORC scan that surfaces each row's ORDINAL within its file
  * — the Iceberg spec's `pos` for position deletes (spec "Row-level
  * deletes": positions count rows in the data file, in file order).
  *
  * Spark's own ORC reader exposes no `_metadata.row_index` (only the
  * parquet format overrides `metadataSchemaFields` with a row-index
  * field in this Spark), so MOR reads over ORC data files could not
  * apply position tombstones. Iceberg's ORC readers solve this with the
  * ORC reader's OWN row accounting — `RecordReader.getRowNumber()`
  * returns the absolute ordinal of the next row, exact even when a read
  * starts mid-file — and this scan does the same, Spark-first:
  *
  *   - the DRIVER reads only file tails (metadata-sized): one task per
  *     STRIPE, carrying (path, stripeOffset, stripeLength), so a 100 TB
  *     table's ORC files parallelize at the same granularity Spark's
  *     split planning would give them, with no row-count prefix sums to
  *     coordinate — the ordinal comes from the reader, not the task;
  *   - each TASK opens its file, restricts the read to its stripe's
  *     byte range (`Reader.Options.range` reads exactly the stripes
  *     whose first byte falls inside), and streams vectorized batches,
  *     stamping `pos = getRowNumber() + i` per row.
  *
  * Used by [[MorRead]] only for ORC files that position tombstones /
  * deletion vectors actually target, and by the position-delete writers
  * for ORC files whose rows match the predicate — untargeted files keep
  * Spark's native (codegen'd, pushdown-capable) ORC scan with a null
  * pos. This reader carries no filter pushdown, so callers prefilter
  * the FILE SET, never route a whole table through it.
  */
object OrcPosRead {

  /** Spark type for an ORC column category: scalars plus STRUCTs of
    * scalars (the nested shape the connector's ORC writer emits —
    * typed metadata riding next to payloads). Deeper nesting is
    * refused: this dialect's writers never produce it. */
  private[sources] def sparkType(td: TypeDescription): DataType = {
    import TypeDescription.Category._
    td.getCategory match {
      case BOOLEAN => BooleanType
      case BYTE => ByteType
      case SHORT => ShortType
      case INT => IntegerType
      case LONG => LongType
      case FLOAT => FloatType
      case DOUBLE => DoubleType
      case STRING | VARCHAR | CHAR => StringType
      case BINARY => BinaryType
      case DATE => DateType
      case TIMESTAMP | TIMESTAMP_INSTANT => TimestampType
      case DECIMAL => DecimalType(td.getPrecision, td.getScale)
      case STRUCT =>
        import scala.jdk.CollectionConverters._
        StructType(td.getFieldNames.asScala.toSeq
          .zip(td.getChildren.asScala.toSeq).map { case (n, t) =>
            StructField(n, sparkType(t), nullable = true)
          })
      case LIST => ArrayType(sparkType(td.getChildren.get(0)))
      case MAP => MapType(sparkType(td.getChildren.get(0)),
        sparkType(td.getChildren.get(1)))
      case other => sys.error(
        s"OrcPosRead: unsupported ORC column category $other — " +
          "this layout writes scalar/struct/list/map ORC schemas")
    }
  }

  /** Type-specialized column extractor, built ONCE per column per task —
    * the per-VALUE work is one closure call, no per-value category
    * match or tuple allocation (the columnar-batch discipline at the
    * value-conversion layer). Handles the vector contract: `isRepeating`
    * collapses the whole batch to index 0, nulls are flagged only when
    * `noNulls` is unset. */
  private[sources] def extractorOf(
      td: TypeDescription): (ColumnVector, Int) => Any = {
    import TypeDescription.Category._
    val core: (ColumnVector, Int) => Any = td.getCategory match {
      case BOOLEAN => (v, i) => v.asInstanceOf[LongColumnVector].vector(i) != 0L
      case BYTE => (v, i) => v.asInstanceOf[LongColumnVector].vector(i).toByte
      case SHORT => (v, i) => v.asInstanceOf[LongColumnVector].vector(i).toShort
      case INT => (v, i) => v.asInstanceOf[LongColumnVector].vector(i).toInt
      case LONG => (v, i) => v.asInstanceOf[LongColumnVector].vector(i)
      case DATE => (v, i) => java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(
          v.asInstanceOf[LongColumnVector].vector(i)))
      case FLOAT => (v, i) =>
        v.asInstanceOf[DoubleColumnVector].vector(i).toFloat
      case DOUBLE => (v, i) => v.asInstanceOf[DoubleColumnVector].vector(i)
      case STRING | VARCHAR | CHAR => (v, i) => {
        val b = v.asInstanceOf[BytesColumnVector]
        new String(b.vector(i), b.start(i), b.length(i),
          java.nio.charset.StandardCharsets.UTF_8)
      }
      case BINARY => (v, i) => {
        val b = v.asInstanceOf[BytesColumnVector]
        java.util.Arrays.copyOfRange(b.vector(i), b.start(i),
          b.start(i) + b.length(i))
      }
      case TIMESTAMP | TIMESTAMP_INSTANT => (v, i) => {
        val t = v.asInstanceOf[TimestampColumnVector]
        // undo the TreeReader's negative-value correction, strip the
        // fraction millis, rebuild exactly (same math as the
        // connector's ORC extractor — pre-epoch values round-trip)
        val n = t.nanos(i)
        var ms = t.time(i)
        if (ms < 0 && n > 999999) ms += 1000L
        val ts = new java.sql.Timestamp(((ms - n / 1000000) / 1000L) * 1000L)
        ts.setNanos(n); ts
      }
      case DECIMAL => (v, i) =>
        v.asInstanceOf[DecimalColumnVector].vector(i)
          .getHiveDecimal.bigDecimalValue()
      case STRUCT =>
        // struct: leaf extractors built once, leaves convert into an
        // external Row (field vectors are full-size, same index) —
        // recursive, any depth
        import scala.jdk.CollectionConverters._
        val kids = td.getChildren.asScala.toArray.map(extractorOf)
        (v, i) => {
          val sv = v.asInstanceOf[StructColumnVector]
          val vals = new Array[Any](kids.length)
          var c = 0
          while (c < kids.length) { vals(c) = kids(c)(sv.fields(c), i); c += 1 }
          new org.apache.spark.sql.catalyst.expressions.GenericRow(vals)
        }
      case LIST =>
        // list: elements into an external Seq (the Row encoding of
        // ArrayType), child vector indexed at (offset + k) — recursive
        val elem = extractorOf(td.getChildren.get(0))
        (v, i) => {
          val lv = v.asInstanceOf[ListColumnVector]
          val off = lv.offsets(i).toInt
          val n = lv.lengths(i).toInt
          val vals = new Array[Any](n)
          var c = 0
          while (c < n) { vals(c) = elem(lv.child, off + c); c += 1 }
          vals.toSeq
        }
      case MAP =>
        // map: entries into an external scala Map (the Row encoding of
        // MapType), keys/values child vectors at (offset + k)
        val kEx = extractorOf(td.getChildren.get(0))
        val vEx = extractorOf(td.getChildren.get(1))
        (v, i) => {
          val mv = v.asInstanceOf[MapColumnVector]
          val off = mv.offsets(i).toInt
          val n = mv.lengths(i).toInt
          val b = scala.collection.mutable.LinkedHashMap.empty[Any, Any]
          var c = 0
          while (c < n) {
            b.put(kEx(mv.keys, off + c), vEx(mv.values, off + c)); c += 1
          }
          b.toMap
        }
      case cat => sys.error(s"OrcPosRead: unsupported category $cat")
    }
    (vec, row) => {
      val i = if (vec.isRepeating) 0 else row
      if (!vec.noNulls && vec.isNull(i)) null else core(vec, i)
    }
  }

  /** Read `paths` (absolute, scheme-normalized) with columns
    * `<file's data columns> + file_path(string) + pos(long)`. All files
    * must share one flat scalar schema (they come from one table's
    * manifest entries). Empty input → empty frame with no schema to
    * infer, so callers guard. */
  def readWithPos(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "OrcPosRead.readWithPos: empty file list")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // file tails only — schema agreement + stripe ranges. Past a handful
    // of files the tail reads go out as ONE small Spark job (each task
    // reads KB-sized footers): at thousands of ORC files a serial driver
    // loop is a planning-latency tail, the exact shape manifest planning
    // already distributes.
    def tailOf(p: String): (String, Seq[(Long, Long)], String) = {
      val r = OrcFile.createReader(new Path(p),
        OrcFile.readerOptions(conf.value))
      try {
        import scala.jdk.CollectionConverters._
        val stripes = r.getStripes.asScala.toSeq
          .map(s => (s.getOffset, s.getLength))
        (p, stripes, r.getSchema.toString)
      } finally r.close()
    }
    val perFile: Seq[(String, Seq[(Long, Long)], String)] =
      if (paths.size <= 8) paths.map(tailOf)
      else {
        val n = math.max(1, math.min(paths.size,
          spark.sparkContext.defaultParallelism))
        val byPath = spark.sparkContext.parallelize(paths, n)
          .map(p => tailOf(p)).collect().map(t => t._1 -> t).toMap
        paths.map(byPath) // preserve caller order
      }
    // schema GENERATIONS (files written before/after a rename or ADD
    // COLUMN differ): one read per generation, merged by name with
    // missing columns null-filled — the caller's alias fold collapses
    // renamed generations into the current column downstream
    val byGen = perFile.groupBy(_._3).toSeq.sortBy(_._1)
    if (byGen.size > 1)
      return byGen.map { case (_, files) =>
        readWithPos(spark, files.map(_._1))
      }.reduce(_.unionByName(_, allowMissingColumns = true))
    val schemaStr = perFile.head._3
    val td = TypeDescription.fromString(schemaStr)
    import scala.jdk.CollectionConverters._
    val fieldTds = td.getChildren.asScala.toSeq
    val names = td.getFieldNames.asScala.toSeq
    val sparkSchema = StructType(
      names.zip(fieldTds).map { case (n, t) =>
        StructField(n, sparkType(t), nullable = true) } ++
        Seq(StructField("file_path", StringType, nullable = false),
          StructField("pos", LongType, nullable = false)))
    val tasks: Seq[(String, Long, Long)] = perFile.flatMap {
      case (p, stripes, _) => stripes.map { case (off, len) => (p, off, len) }
    }
    val n = math.max(1, math.min(tasks.size,
      spark.sparkContext.defaultParallelism))
    val rows = spark.sparkContext.parallelize(tasks, n).flatMap {
      case (path, off, len) =>
        val reader = OrcFile.createReader(new Path(path),
          OrcFile.readerOptions(conf.value))
        val fileTd = reader.getSchema
        // one specialized extractor per column for the whole task —
        // per-value cost is a closure call, not a category match
        val extract = fileTd.getChildren.asScala.toArray.map(extractorOf)
        val nCols = extract.length
        val rr = reader.rows(reader.options.range(off, len))
        val batch = fileTd.createRowBatch()
        // a LIMIT-terminated or failed task abandons the iterator
        // mid-stream: close with the task, not just at exhaustion
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => { rr.close(); reader.close() }))
        new Iterator[Row] {
          private var base = 0L
          private var i = 0
          private var nRows = 0
          private var open = true
          private def fill(): Unit = {
            base = rr.getRowNumber // absolute ordinal of the batch head
            if (rr.nextBatch(batch)) { nRows = batch.size; i = 0 }
            else { nRows = 0; open = false } // task listener closes
          }
          fill()
          override def hasNext: Boolean = open && i < nRows
          override def next(): Row = {
            val vals = new Array[Any](nCols + 2)
            var c = 0
            while (c < nCols) {
              vals(c) = extract(c)(batch.cols(c), i); c += 1
            }
            vals(nCols) = path
            vals(nCols + 1) = base + i
            i += 1
            if (i >= nRows) fill()
            new org.apache.spark.sql.catalyst.expressions.GenericRow(vals)
          }
        }
    }
    spark.createDataFrame(rows, sparkSchema)
  }
}
