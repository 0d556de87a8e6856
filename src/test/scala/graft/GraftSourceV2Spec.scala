package graft

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.IcebergLayoutWriter
import graft.sources.IcebergLayoutWriter.ManifestEntrySpec

/** The graft-iceberg DataSourceV2: snapshot resolution, one partition
  * per data file, manifest-bound FILE SKIPPING visible as the partition
  * count, parquet-level column pruning, and row-level residual filters
  * — all against plain spark.read.parquet as ground truth. */
class GraftSourceV2Spec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  /** 8 price-bucket files with real bounds in the manifests. */
  private lazy val tbl: java.io.File = {
    import spark.implicits._
    val t = new java.io.File("target/tmp-dsv2")
    org.apache.commons.io.FileUtils.deleteQuietly(t)
    val dataDir = new java.io.File(t, "data"); dataDir.mkdirs()
    val base = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("okey"),
        floor(col("l_extendedprice")).cast("long").as("price"),
        col("l_returnflag").as("flag"))
    val entries = (0 until 8).map { b =>
      val df = new java.io.File(dataDir, s"b$b.parquet")
      val part = base.filter(
        least(floor(col("price") / lit(12000)).cast("int"), lit(7)) === b)
        .sort(col("okey"))
      val n = IcebergLayoutWriter.writeSingleParquet(part, df)
      val (lo, hi) = part.agg(min(col("price")), max(col("price")))
        .as[(Long, Long)].head()
      ManifestEntrySpec(status = 1, content = 0,
        filePath = df.getAbsolutePath, recordCount = n,
        sizeBytes = df.length(), sequenceNumber = 1L,
        lower = Map(1 -> IcebergLayoutWriter.boundLong(lo)),
        upper = Map(1 -> IcebergLayoutWriter.boundLong(hi)))
    }
    IcebergLayoutWriter.writeTable(t, entries)
    t
  }

  private def dsv2 = spark.read.format("graft-iceberg")
    .option("pushdown.fields", "price:1:long")
    .load(tbl.getPath)

  private def ground = {
    import org.apache.commons.io.FileUtils
    spark.read.parquet(FileUtils.listFiles(new java.io.File(tbl, "data"),
      Array("parquet"), false).toArray(Array.empty[java.io.File])
      .map(_.getAbsolutePath).toIndexedSeq: _*)
  }

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getString(2))

  test("full scan: one partition per file, rows equal plain parquet") {
    val got = dsv2.select("okey", "price", "flag")
    assert(got.rdd.getNumPartitions == 8)
    assert(got.collect().map(key).sorted.toSeq ==
      ground.select("okey", "price", "flag").collect().map(key).sorted.toSeq)
  }

  test("manifest-bound file skipping: partitions drop with the predicate") {
    val filtered = dsv2.filter(col("price") >= 60000L)
      .select("okey", "price", "flag")
    val parts = filtered.rdd.getNumPartitions
    assert(parts < 8 && parts > 0, s"no pruning happened: $parts partitions")
    assert(filtered.collect().map(key).sorted.toSeq ==
      ground.filter(col("price") >= 60000L)
        .select("okey", "price", "flag").collect().map(key).sorted.toSeq)
    // the Scan advertises the pushed filter
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("GraftIcebergScan") || plan.contains("BatchScan"),
      s"expected the DSv2 scan in the plan:\n$plan")
  }

  test("residual row-level filtering stays exact inside surviving files") {
    // a predicate no file excludes entirely: bounds keep every file,
    // rows must still be filtered exactly
    val filtered = dsv2.filter(col("price") % 2 === 0 && col("price") >= 0L)
    assert(filtered.rdd.getNumPartitions == 8)
    assert(filtered.count() ==
      ground.filter(col("price") % 2 === 0).count())
  }

  test("column pruning: projected read returns the right columns") {
    val got = dsv2.select("flag").collect().map(_.getString(0))
    val exp = ground.select("flag").collect().map(_.getString(0))
    assert(got.sorted.toSeq == exp.sorted.toSeq)
  }

  test("write path: first append creates the table, second appends a snapshot") {
    import spark.implicits._
    val t = new java.io.File("target/tmp-dsv2-write")
    org.apache.commons.io.FileUtils.deleteQuietly(t)
    val a = Seq((1L, 10L, "A"), (2L, 20L, "B")).toDF("okey", "price", "flag")
    a.write.format("graft-iceberg")
      .option("write.schema", "okey LONG, price LONG, flag STRING")
      .mode("append").save(t.getPath)
    val b = Seq((3L, 30L, "C")).toDF("okey", "price", "flag")
    b.write.format("graft-iceberg").mode("append").save(t.getPath)
    // read back through the connector's own read path
    val got = spark.read.format("graft-iceberg").load(t.getPath)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, 10L, "A"), (2L, 20L, "B"), (3L, 30L, "C")))
    // two commits, history intact, snapshot 1 still time-travels
    assert(graft.sources.LayoutMaintenance
      .snapshotIds(spark, t.getPath) == Seq(1L, 2L))
    assert(spark.read.format("graft-iceberg").option("snapshot-id", "1")
      .load(t.getPath).count() == 2L)
    // the written table composes with the maintenance surface
    val (snap, n, before, after) = graft.sources.LayoutMaintenance
      .rewriteDataFiles(spark, t.getPath, Nil, sortCols = Seq("okey"))
    assert(snap == 3L && n == 3L && before >= 2 && after == 1)
  }

  test("write path: empty dataframe commits nothing") {
    import spark.implicits._
    val t = new java.io.File("target/tmp-dsv2-write2")
    org.apache.commons.io.FileUtils.deleteQuietly(t)
    Seq((1L, "x")).toDF("k", "v").write.format("graft-iceberg")
      .option("write.schema", "k LONG, v STRING").mode("append").save(t.getPath)
    Seq.empty[(Long, String)].toDF("k", "v").write.format("graft-iceberg")
      .mode("append").save(t.getPath)
    assert(graft.sources.LayoutMaintenance
      .snapshotIds(spark, t.getPath) == Seq(1L), "empty append must not commit")
    assert(spark.read.format("graft-iceberg").load(t.getPath).count() == 1L)
  }

  test("streaming read tails snapshot appends with checkpointed restart (offset = snapshot id)") {
    import spark.implicits._
    val t = new java.io.File("target/tmp-dsv2-stream")
    val ckpt = new java.io.File("target/tmp-dsv2-stream-ckpt")
    org.apache.commons.io.FileUtils.deleteQuietly(t)
    org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
    // every append happens while the query is STOPPED — each start
    // drains exactly what accumulated, and the restart from checkpoint
    // proves offsets resume without replay (exactly-once at the
    // snapshot grain, deterministically: no live trigger race)
    // a fresh collector per run (foreachBatch supports checkpoint
    // recovery, unlike the memory sink): what each drain returns is
    // exactly the batches THAT run processed — the exactly-once evidence
    def drain(): Seq[(Long, String)] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
      val q = spark.readStream.format("graft-iceberg").load(t.getPath)
        .writeStream
        .option("checkpointLocation", ckpt.getPath)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => got.add((r.getLong(0), r.getString(1))))
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      got.asScala.toSeq.sortBy(_._1)
    }
    Seq((1L, "a")).toDF("k", "v").write.format("graft-iceberg")
      .option("write.schema", "k LONG, v STRING").mode("append").save(t.getPath)
    assert(drain() == Seq((1L, "a")))
    Seq((2L, "b"), (3L, "c")).toDF("k", "v").write.format("graft-iceberg")
      .mode("append").save(t.getPath)
    Seq((4L, "d")).toDF("k", "v").write.format("graft-iceberg")
      .mode("append").save(t.getPath)
    // two commits accumulated -> the resumed stream sees both, and does
    // NOT replay snapshot 1
    assert(drain() == Seq((2L, "b"), (3L, "c"), (4L, "d")))
    // nothing new: an idle restart processes nothing
    assert(drain().isEmpty)
  }

  test("maxFilesPerTrigger rate-limits the drain to one commit per micro-batch") {
    import spark.implicits._
    val t = new java.io.File("target/tmp-dsv2-ratelimit")
    val ckpt = new java.io.File("target/tmp-dsv2-ratelimit-ckpt")
    org.apache.commons.io.FileUtils.deleteQuietly(t)
    org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
    Seq((1L, "a")).toDF("k", "v").write.format("graft-iceberg")
      .option("write.schema", "k LONG, v STRING").mode("append").save(t.getPath)
    Seq((2L, "b")).toDF("k", "v").write.format("graft-iceberg")
      .mode("append").save(t.getPath)
    Seq((3L, "c")).toDF("k", "v").write.format("graft-iceberg")
      .mode("append").save(t.getPath)
    // three single-file commits accumulated; a 1-file budget must split
    // the drain into three NON-EMPTY micro-batches (admission control
    // walks one snapshot per trigger), not one catch-all batch
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    val q = spark.readStream.format("graft-iceberg")
      .option("maxFilesPerTrigger", "1").load(t.getPath)
      .writeStream
      .option("checkpointLocation", ckpt.getPath)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val ks = batch.select("k").collect().map(_.getLong(0)).toSeq.sorted
        if (ks.nonEmpty) batches.add(ks)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(batches.asScala.toSeq == Seq(Seq(1L), Seq(2L), Seq(3L)))
  }

  test("Trigger.AvailableNow drains to the prepared head and terminates") {
    import spark.implicits._
    val t = new java.io.File("target/tmp-dsv2-availnow")
    val ckpt = new java.io.File("target/tmp-dsv2-availnow-ckpt")
    org.apache.commons.io.FileUtils.deleteQuietly(t)
    org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
    Seq((1L, "a")).toDF("k", "v").write.format("graft-iceberg")
      .option("write.schema", "k LONG, v STRING").mode("append").save(t.getPath)
    Seq((2L, "b")).toDF("k", "v").write.format("graft-iceberg")
      .mode("append").save(t.getPath)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graft-iceberg")
      .option("maxFilesPerTrigger", "1").load(t.getPath)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ckpt.getPath)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("k").collect().foreach(r => got.add(r.getLong(0)))
      }
      .start()
    // AvailableNow stops ITSELF once the prepared head is drained
    assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
    assert(got.asScala.toSeq.sorted == Seq(1L, 2L))
  }

  test("write.target-file-size-bytes rolls task files near the target") {
    import spark.implicits._
    val t = new java.io.File("target/tmp-dsv2-roll")
    org.apache.commons.io.FileUtils.deleteQuietly(t)
    // one input partition would normally mean ONE data file; a 64 KB
    // target must roll it into several, each near the target
    spark.range(0, 300000).select(col("id").as("k"),
        (col("id") * 7).as("v")).coalesce(1)
      .write.format("graft-iceberg")
      .option("write.schema", "k LONG, v LONG")
      .option("write.target-file-size-bytes", "65536")
      .mode("append").save(t.getPath)
    val files = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, t.getPath, "t", Nil)
      .filter(col("content") === 0)
      .select("file_path", "sizeBytes", "record_count")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(files.length > 2,
      s"expected the single task to roll into several files: ${files.length}")
    // rolled files stay within sane bounds of the target (parquet
    // buffering makes the check coarse, not exact)
    files.dropRight(1).foreach { case (p, sz, _) =>
      assert(sz < 4L * 65536, s"file $p blew past the target: $sz B") }
    assert(files.map(_._3).sum == 300000L, "no rows lost across rolls")
    // and the table reads back whole
    assert(spark.read.format("graft-iceberg").load(t.getPath).count() == 300000L)
  }

  test("TABLESAMPLE pushes into the scan: deterministic, no Sample operator") {
    val df = dsv2 // the shared 8-file fixture table
    val total = df.count()
    val s1 = df.sample(withReplacement = false, 0.3, seed = 42)
    val rows1 = s1.select("okey").collect().map(_.getLong(0)).toSet
    // pushed: the Sample operator is GONE from the executed plan —
    // the scan's readers did the work
    val sampleOps = s1.queryExecution.executedPlan.collectWithSubqueries {
      case s: org.apache.spark.sql.execution.SampleExec => s }
    assert(sampleOps.isEmpty, "sample must push into the graft scan")
    // deterministic: same seed, same rows — across a fresh plan
    val rows2 = dsv2.sample(withReplacement = false, 0.3, seed = 42)
      .select("okey").collect().map(_.getLong(0)).toSet
    assert(rows1 == rows2, "pushed sampling must be repeatable")
    // fraction lands in a sane band
    assert(rows1.size > (total * 0.1).toInt && rows1.size < (total * 0.55).toInt,
      s"sample fraction off: ${rows1.size} of $total")
    // a filter ABOVE the pushed sample sees exactly the sampled rows
    // (sampling keys on row ordinals, so predicates cannot change which
    // rows are kept — they only filter the kept set)
    val sampledThenFiltered = dsv2.sample(withReplacement = false, 0.3, seed = 42)
      .filter(col("price") < 100000L)
      .select("okey").collect().map(_.getLong(0)).toSet
    assert(sampledThenFiltered.subsetOf(rows1),
      "filtering a pushed sample must yield a subset of the sample")
    // with-replacement has no per-row pushdown: Spark keeps its own
    // Sample operator and results stay correct
    val wr = dsv2.sample(withReplacement = true, 0.3, seed = 42)
    val wrOps = wr.queryExecution.executedPlan.collectWithSubqueries {
      case s: org.apache.spark.sql.execution.SampleExec => s }
    assert(wrOps.nonEmpty, "with-replacement must NOT push")
  }

  test("empty result when the predicate excludes every file") {
    val none = dsv2.filter(col("price") > 10000000L)
    assert(none.rdd.getNumPartitions == 0)
    assert(none.count() == 0L)
  }

  test("streaming tails only the PUBLISHED head: a WAP-staged snapshot stays invisible until fast-forward") {
    import spark.implicits._
    val t = new java.io.File("target/tmp-dsv2-stream-wap")
    val ckpt = new java.io.File("target/tmp-dsv2-stream-wap-ckpt")
    org.apache.commons.io.FileUtils.deleteQuietly(t)
    org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
    def drain(): Seq[(Long, String)] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
      val q = spark.readStream.format("graft-iceberg").load(t.getPath)
        .writeStream
        .option("checkpointLocation", ckpt.getPath)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => got.add((r.getLong(0), r.getString(1))))
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      got.asScala.toSeq.sortBy(_._1)
    }
    Seq((1L, "a")).toDF("k", "v").write.format("graft-iceberg")
      .option("write.schema", "k LONG, v STRING").mode("append").save(t.getPath)
    assert(drain() == Seq((1L, "a")))
    // stage an append on an audit branch: it lands in HISTORY but the
    // published head (current-snapshot-id) stays at snapshot 1 — the
    // stream must not emit unaudited data
    val f = new java.io.File(new java.io.File(t, "data"), "staged.parquet")
    val n = IcebergLayoutWriter.writeSingleParquet(
      Seq((2L, "b")).toDF("k", "v"), f)
    graft.sources.LayoutMaintenance.stageAppend(spark, t.getPath,
      Seq(ManifestEntrySpec(status = 1, content = 0,
        filePath = f.getAbsolutePath, recordCount = n,
        sizeBytes = f.length(), sequenceNumber = 0L)), branch = "audit")
    assert(drain().isEmpty, "stream advanced to an unaudited staged snapshot")
    // publish: NOW the stream sees exactly the staged rows
    graft.sources.LayoutMaintenance.fastForward(spark, t.getPath, from = "audit")
    assert(drain() == Seq((2L, "b")))
  }

  test("initial streaming load of a MOR snapshot applies tombstones (merge-on-read catch-up)") {
    import spark.implicits._
    val t = new java.io.File("target/tmp-dsv2-stream-mor")
    val ckpt = new java.io.File("target/tmp-dsv2-stream-mor-ckpt")
    org.apache.commons.io.FileUtils.deleteQuietly(t)
    org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.format("graft-iceberg")
      .option("write.schema", "k LONG, v STRING").mode("append").save(t.getPath)
    graft.sources.LayoutMaintenance.commitUpsert(spark, t.getPath,
      Seq((2L, "b2")).toDF("k", "v"), keyCols = Seq("k"))
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = spark.readStream.format("graft-iceberg").load(t.getPath)
      .writeStream.option("checkpointLocation", ckpt.getPath)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= df.collect().map(r => (r.getLong(0), r.getString(1)))
        }; ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // the catch-up equals the MOR state: (2,"b") tombstoned, (2,"b2") live
    assert(got.sorted.toSeq == Seq((1L, "a"), (2L, "b2")),
      s"initial MOR catch-up wrong: ${got.sorted}")
  }

  test("rewriteDataFiles resolves equality keys from metadata; legacy id-less layouts refuse") {
    import spark.implicits._
    val t = new java.io.File("target/tmp-dsv2-rewrite-guard")
    org.apache.commons.io.FileUtils.deleteQuietly(t)
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.format("graft-iceberg")
      .option("write.schema", "k LONG, v STRING").mode("append").save(t.getPath)
    graft.sources.LayoutMaintenance.commitUpsert(spark, t.getPath,
      Seq((2L, "b2")).toDF("k", "v"), keyCols = Seq("k"))
    // the upsert recorded spec `equality_ids` in its manifest entry, so
    // a key-less rewrite resolves the keys from METADATA and is correct
    graft.sources.LayoutMaintenance.rewriteDataFiles(spark, t.getPath, Nil)
    val got = spark.read.format("graft-iceberg").load(t.getPath)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == Seq((1L, "a"), (2L, "b2")))
    // a LEGACY layout whose eq-delete entry carries no ids must still
    // fail fast: dropping unapplied tombstones would resurrect rows
    val t2 = new java.io.File("target/tmp-dsv2-rewrite-legacy")
    org.apache.commons.io.FileUtils.deleteQuietly(t2)
    val dataDir = new java.io.File(t2, "data"); dataDir.mkdirs()
    val df = new java.io.File(dataDir, "d.parquet")
    val ef = new java.io.File(dataDir, "e.parquet")
    val nd = IcebergLayoutWriter.writeSingleParquet(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), df)
    val ne = IcebergLayoutWriter.writeSingleParquet(
      Seq(Tuple1(2L)).toDF("k"), ef)
    IcebergLayoutWriter.writeTable(t2, Seq(
      ManifestEntrySpec(status = 1, content = 0, filePath = df.getAbsolutePath,
        recordCount = nd, sizeBytes = df.length(), sequenceNumber = 1L),
      ManifestEntrySpec(status = 1, content = 2, filePath = ef.getAbsolutePath,
        recordCount = ne, sizeBytes = ef.length(), sequenceNumber = 2L)))
    val ex = intercept[IllegalArgumentException] {
      graft.sources.LayoutMaintenance.rewriteDataFiles(spark, t2.getPath, Nil)
    }
    assert(ex.getMessage.contains("equality"))
  }

  test("connector batch read is merge-on-read: position + equality tombstones applied") {
    import spark.implicits._
    val t = new java.io.File("target/tmp-dsv2-morread")
    org.apache.commons.io.FileUtils.deleteQuietly(t)
    (0L until 100L).map(k => (k, k * 10)).toDF("k", "v")
      .write.format("graft-iceberg")
      .option("write.schema", "k LONG, v LONG").mode("append").save(t.getPath)
    // eq-tombstones via upsert (keys recorded as equality_ids)...
    graft.sources.LayoutMaintenance.commitUpsert(spark, t.getPath,
      Seq((7L, 777L), (8L, 888L)).toDF("k", "v"), keyCols = Seq("k"))
    // ...plus position tombstones via predicate DELETE
    graft.sources.LayoutMaintenance.commitDeleteWhere(
      spark, t.getPath, col("v") >= 900L)
    val viaConnector = spark.read.format("graft-iceberg").load(t.getPath)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    val viaMor = graft.sources.MorRead.readTable(spark, t.getPath)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    assert(viaConnector == viaMor,
      s"connector MOR read diverged: ${viaConnector.take(5)} vs ${viaMor.take(5)}")
    // spot semantics: k=7,8 carry upserted values; v>=900 rows are gone
    val m = viaConnector.toMap
    assert(m(7L) == 777L && m(8L) == 888L)
    assert(viaConnector.forall { case (k, v) => v < 900L || k == 8L })
    assert(!m.contains(95L))
    // the projection path still works when key columns aren't selected
    val onlyV = spark.read.format("graft-iceberg").load(t.getPath)
      .select("v").collect().map(_.getLong(0)).sorted.toSeq
    assert(onlyV == viaMor.map(_._2).sorted)
  }

  test("file pruning compares long bounds exactly above 2^53") {
    import spark.implicits._
    val t = new java.io.File("target/tmp-dsv2-longbounds")
    org.apache.commons.io.FileUtils.deleteQuietly(t)
    val dataDir = new java.io.File(t, "data"); dataDir.mkdirs()
    val big = (1L << 53) + 1 // doubles round this DOWN to 2^53
    val f = new java.io.File(dataDir, "big.parquet")
    val n = IcebergLayoutWriter.writeSingleParquet(
      Seq((1L, big)).toDF("okey", "price"), f)
    IcebergLayoutWriter.writeTable(t, Seq(ManifestEntrySpec(status = 1,
      content = 0, filePath = f.getAbsolutePath, recordCount = n,
      sizeBytes = f.length(), sequenceNumber = 1L,
      lower = Map(1 -> IcebergLayoutWriter.boundLong(0L)),
      upper = Map(1 -> IcebergLayoutWriter.boundLong(big)))))
    // hi=2^53+1 > v=2^53 holds in Long; a Double comparison would see
    // 2^53 > 2^53 = false and wrongly prune the file
    val got = spark.read.format("graft-iceberg")
      .option("pushdown.fields", "price:1:long").load(t.getPath)
      .filter(col("price") > (1L << 53))
    assert(got.rdd.getNumPartitions == 1,
      "double-rounded bound comparison wrongly pruned the file")
    assert(got.count() == 1L)
  }

  test("explicit read schema is honored as a projection") {
    val got = spark.read.format("graft-iceberg")
      .schema("price BIGINT").load(tbl.getPath)
    assert(got.schema.fieldNames.toSeq == Seq("price"))
    assert(got.count() == ground.count())
    assert(got.agg(sum(col("price"))).head.getLong(0) ==
      ground.agg(sum(col("price"))).head.getLong(0))
  }

  test("native streaming WRITE: one snapshot per epoch, checkpointed restart, no replay double-count") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val t = new java.io.File("target/tmp-dsv2-swrite")
    val ckpt = new java.io.File("target/tmp-dsv2-swrite-ckpt")
    org.apache.commons.io.FileUtils.deleteQuietly(t)
    org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
    val input = MemoryStream[(Long, String)]
    def run(): Unit = {
      val q = input.toDS().toDF("k", "v")
        .writeStream.format("graft-iceberg")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt.getPath)
        .option("write.schema", "k LONG, v STRING")
        .start(t.getPath)
      try q.awaitTermination() finally q.stop()
    }
    input.addData((1L, "a"), (2L, "b"))
    run()
    assert(spark.read.format("graft-iceberg").load(t.getPath).count() == 2L)
    val idsAfter1 = graft.sources.LayoutMaintenance.snapshotIds(spark, t.getPath)
    // restart with accumulated data: the resumed stream commits it once
    input.addData((3L, "c"))
    input.addData((4L, "d"))
    run()
    val got = spark.read.format("graft-iceberg").load(t.getPath)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    assert(graft.sources.LayoutMaintenance.snapshotIds(spark, t.getPath)
      .size > idsAfter1.size)
    // idle restart: nothing new commits
    val idsBefore = graft.sources.LayoutMaintenance.snapshotIds(spark, t.getPath)
    run()
    assert(graft.sources.LayoutMaintenance
      .snapshotIds(spark, t.getPath) == idsBefore)
    // END-TO-END epoch replay: deleting the newest commit marker from
    // the checkpoint makes the restarted query RE-RUN that micro-batch
    // (the crash-between-sink-commit-and-checkpoint-commit window). The
    // sink's (queryId, epochId) ledger must swallow the re-delivered
    // commit: rows stay exactly-once, no new snapshot, and the rerun's
    // orphan files are deleted.
    val commitsDir = new java.io.File(ckpt, "commits")
    val newest = commitsDir.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toLong)
    assert(newest.delete())
    new java.io.File(commitsDir, "." + newest.getName + ".crc").delete()
    run()
    val afterReplay = spark.read.format("graft-iceberg").load(t.getPath)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(afterReplay == got, "replayed epoch double-counted rows")
    assert(graft.sources.LayoutMaintenance
      .snapshotIds(spark, t.getPath) == idsBefore,
      "replayed epoch must not commit a snapshot")
  }

  test("transform-aware pruning: days(ts) partitions skip on a plain ts predicate, no column stats") {
    import spark.implicits._
    val t = new java.io.File("target/tmp-dsv2-daypart")
    org.apache.commons.io.FileUtils.deleteQuietly(t)
    val dataDir = new java.io.File(t, "data"); dataDir.mkdirs()
    val usPerDay = 86400L * 1000 * 1000
    // 6 day-partitions, one file each — NO lower/upper bounds anywhere
    val entries = (0 until 6).map { d =>
      val f = new java.io.File(dataDir, s"d$d.parquet")
      val rows = (0 until 10).map(i => (d * usPerDay + i * 1000L, s"r$d-$i"))
      val n = IcebergLayoutWriter.writeSingleParquet(rows.toDF("ts", "v"), f)
      ManifestEntrySpec(status = 1, content = 0,
        filePath = f.getAbsolutePath, recordCount = n,
        sizeBytes = f.length(), sequenceNumber = 1L,
        partition = Seq("ts_day" -> d))
    }
    IcebergLayoutWriter.writeTable(t, entries,
      partitionSpec = Seq(("ts_day", "day", 1)))
    def scan = spark.read.format("graft-iceberg")
      .option("pushdown.fields", "ts:1:long").load(t.getPath)
    // ts >= start of day 4 → days 4,5 survive (inclusive projection)
    val ge = scan.filter(col("ts") >= 4 * usPerDay)
    assert(ge.rdd.getNumPartitions == 2,
      s"day pruning broke: ${ge.rdd.getNumPartitions} of 6 files planned")
    assert(ge.count() == 20L)
    // mid-day predicate keeps its own day
    val mid = scan.filter(col("ts") > 4 * usPerDay + 5000L)
    assert(mid.rdd.getNumPartitions == 2)
    assert(mid.count() == 14L)
    // range both ways
    val range = scan.filter(col("ts") >= 2 * usPerDay && col("ts") < 3 * usPerDay)
    assert(range.rdd.getNumPartitions == 1)
    assert(range.count() == 10L)
  }

  test("transform-aware pruning: bucket[N] partitions skip on equality") {
    import spark.implicits._
    val t = new java.io.File("target/tmp-dsv2-bucketpart")
    org.apache.commons.io.FileUtils.deleteQuietly(t)
    val dataDir = new java.io.File(t, "data"); dataDir.mkdirs()
    val keys = (1L to 64L)
    val byBucket = keys.groupBy(k => graft.sources.PartitionTransforms.bucketLong(k, 4))
    val entries = byBucket.toSeq.sortBy(_._1).map { case (b, ks) =>
      val f = new java.io.File(dataDir, s"b$b.parquet")
      val n = IcebergLayoutWriter.writeSingleParquet(
        ks.map(k => (k, k * 10)).toDF("id", "x"), f)
      ManifestEntrySpec(status = 1, content = 0,
        filePath = f.getAbsolutePath, recordCount = n,
        sizeBytes = f.length(), sequenceNumber = 1L,
        partition = Seq("id_bucket" -> b))
    }
    IcebergLayoutWriter.writeTable(t, entries,
      partitionSpec = Seq(("id_bucket", "bucket[4]", 1)))
    val scan = spark.read.format("graft-iceberg")
      .option("pushdown.fields", "id:1:long").load(t.getPath)
    val eq = scan.filter(col("id") === 17L)
    assert(eq.rdd.getNumPartitions == 1,
      s"bucket pruning broke: ${eq.rdd.getNumPartitions} of ${entries.size}")
    assert(eq.collect().map(_.getLong(1)).toSeq == Seq(170L))
    // a RANGE predicate cannot project through bucket: all files planned
    val rng = scan.filter(col("id") > 60L)
    assert(rng.rdd.getNumPartitions == entries.size)
    assert(rng.count() == 4L)
  }

  test("native streaming WRITE converges: arbitrary micro-batch splits land the batch-append state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rows = (1L to 40L).map(k => (k, s"v$k"))
    def streamed(split: Seq[Seq[(Long, String)]]): Seq[(Long, String)] = {
      val t = new java.io.File(s"target/tmp-dsv2-conv-${split.size}")
      val ckpt = new java.io.File(s"target/tmp-dsv2-conv-${split.size}-ckpt")
      org.apache.commons.io.FileUtils.deleteQuietly(t)
      org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
      val input = MemoryStream[(Long, String)]
      val q = input.toDS().toDF("k", "v")
        .writeStream.format("graft-iceberg")
        .option("checkpointLocation", ckpt.getPath)
        .option("write.schema", "k LONG, v STRING")
        .start(t.getPath)
      try split.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      finally { q.stop(); q.awaitTermination() }
      assert(graft.sources.LayoutMaintenance.snapshotIds(spark, t.getPath)
        .size == split.count(_.nonEmpty), "one snapshot per non-empty trigger")
      spark.read.format("graft-iceberg").load(t.getPath)
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    }
    val a = streamed(Seq(rows))                              // one big trigger
    val b = streamed(rows.grouped(7).toSeq)                  // ragged splits
    val c = streamed(Seq(rows.take(1), rows.drop(1)))        // 1 + rest
    assert(a == rows.sortBy(_._1) && b == a && c == a,
      "micro-batch split must not change the final table state")
  }

  test("concurrent appends both land: per-table lock + CREATE_NEW version swap") {
    import spark.implicits._
    val t = new java.io.File("target/tmp-dsv2-race")
    org.apache.commons.io.FileUtils.deleteQuietly(t)
    Seq((0L, "base")).toDF("k", "v").write.format("graft-iceberg")
      .option("write.schema", "k LONG, v STRING").mode("append").save(t.getPath)
    val dataDir = new java.io.File(t, "data")
    def entryFor(k: Long, tag: String) = {
      val f = new java.io.File(dataDir, s"race-$tag.parquet")
      val n = IcebergLayoutWriter.writeSingleParquet(
        Seq((k, tag)).toDF("k", "v"), f)
      ManifestEntrySpec(status = 1, content = 0,
        filePath = f.getAbsolutePath, recordCount = n,
        sizeBytes = f.length(), sequenceNumber = 0L)
    }
    val (e1, e2) = (entryFor(1L, "t1"), entryFor(2L, "t2"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq(e1, e2).map { e =>
      new Thread(() =>
        try graft.sources.LayoutMaintenance.commitAppend(spark, t.getPath, Seq(e))
        catch { case ex: Throwable => errs.add(ex) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"racing commit failed: ${errs.asScala.headOption}")
    // neither commit dropped the other's files
    assert(graft.sources.LayoutMaintenance
      .snapshotIds(spark, t.getPath) == Seq(1L, 2L, 3L))
    val got = spark.read.format("graft-iceberg").load(t.getPath)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == Seq((0L, "base"), (1L, "t1"), (2L, "t2")))
  }

  test("aggregate pushdown: count/min/max answered from manifests, zero data-file I/O") {
    // ground truth BEFORE tampering
    val want = ground.agg(count(lit(1)), min(col("price")), max(col("price")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    // copy the layout, then DESTROY every data file: if the aggregate
    // still answers, not one data byte was needed
    val t2 = new java.io.File("target/tmp-dsv2-aggpush")
    org.apache.commons.io.FileUtils.deleteQuietly(t2)
    org.apache.commons.io.FileUtils.copyDirectory(tbl, t2)
    val dataFiles = new java.io.File(t2, "data").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(dataFiles.nonEmpty)
    dataFiles.foreach { f =>
      val w = new java.io.FileOutputStream(f)
      w.write("not parquet anymore".getBytes); w.close()
    }
    // schema must come from the caller (inference would open a file)
    val df = spark.read.format("graft-iceberg")
      .schema("okey LONG, price LONG, flag STRING")
      .option("pushdown.fields", "price:1:long")
      .load(t2.getPath)
      .agg(count(lit(1)).as("n"), min(col("price")).as("lo"),
        max(col("price")).as("hi"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("aggPushed"), s"aggregate was not pushed:\n$plan")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    assert(got == want, s"pushed aggregate disagrees: $got vs $want")
  }

  test("aggregate pushdown refuses a WHERE (file-coarse bounds) and stays exact") {
    val df = dsv2.filter(col("price") >= 60000L)
      .agg(count(lit(1)).as("n"), max(col("price")).as("hi"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("aggPushed"),
      s"must not push an aggregate past a residual filter:\n$plan")
    val want = ground.filter(col("price") >= 60000L)
      .agg(count(lit(1)), max(col("price")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).head
    assert(got == want)
  }

  test("aggregate pushdown refuses a snapshot that carries delete files") {
    import spark.implicits._
    val t = new java.io.File("target/tmp-dsv2-aggdel")
    org.apache.commons.io.FileUtils.deleteQuietly(t)
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
      .write.format("graft-iceberg")
      .option("write.schema", "k LONG, v LONG").mode("append").save(t.getPath)
    graft.sources.LayoutMaintenance.commitUpsert(spark, t.getPath,
      Seq((2L, 21L)).toDF("k", "v"), keyCols = Seq("k"))
    val df = spark.read.format("graft-iceberg")
      .option("pushdown.fields", "k:1:long").load(t.getPath)
      .agg(count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("aggPushed"),
      s"record_count overcounts under tombstones; must not push:\n$plan")
  }

  test("runtime (dynamic) file pruning: a broadcast join's keys prune files at execution") {
    import spark.implicits._
    // dim must carry a SELECTIVE predicate in its plan (Spark's DPP
    // rule only injects a runtime filter when the build side filters)
    // — and the predicate is on a NON-join column, so no static filter
    // can be inferred onto the fact side: any file pruning observed
    // below can ONLY have come from the runtime (dynamic) filter.
    val topOkey = ground.sort(col("price").desc).limit(1)
      .select(col("okey")).as[Long].head()
    val dim = ground.filter(col("okey") === topOkey)
      .select("price").distinct()
    val joined = dsv2.join(broadcast(dim), "price")
    val n = joined.collect().length.toLong // execute THIS plan
    val want = ground.join(broadcast(dim), "price").count()
    assert(n == want, s"join result wrong: $n vs $want")
    // after execution, the final plan's BatchScan must have emitted only
    // the surviving files' rows — far fewer than the full table
    val total = ground.count()
    // only the price-bucket files containing the dim's values survive —
    // the runtime filter must prune the scan to exactly those files
    val dimPrices = ground.filter(col("okey") === topOkey)
      .select(col("price")).distinct().as[Long].collect().toSeq
    val buckets = dimPrices.map(p => math.min(p / 12000, 7L)).distinct
    val expected = ground.filter(
      least(floor(col("price") / lit(12000)), lit(7L)).isin(buckets: _*))
      .count()
    val scanned = graft.operators.PlanProbe.rowsReadByGraftScans(joined)
    assert(scanned == expected && expected < total,
      s"runtime pruning did not engage: scanned $scanned, want exactly " +
        s"$expected of $total rows\n" + joined.queryExecution.executedPlan)
  }

  test("manifest statistics feed the planner: small table broadcasts with no hint") {
    // without SupportsReportStatistics a DSv2 table defaults to
    // defaultSizeInBytes (effectively infinite) and this join would
    // sort-merge; manifest-derived size (~100 KB) makes Catalyst pick
    // a broadcast join unprompted
    val big = spark.range(0, 2000000).withColumnRenamed("id", "price")
    val j = big.join(dsv2.select("price", "flag"), "price")
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"),
      s"manifest stats did not drive a broadcast join:\n$plan")
  }

  test("registered Puffin NDV sketches surface as planner column statistics") {
    import spark.implicits._
    val t = new java.io.File("target/tmp-dsv2-colstats")
    org.apache.commons.io.FileUtils.deleteQuietly(t)
    (0L until 1000L).map(i => (i % 7, i)).toDF("k", "v")
      .coalesce(1).write.format("graft-iceberg")
      .option("write.schema", "k LONG, v LONG").mode("append").save(t.getPath)
    // KMV sketch over k (7 distinct values < 64 mins: exact NDV)
    val k64 = 64
    val minK = org.apache.spark.sql.functions.udaf(
      new graft.functions.MinKDistinct.MinK(k64),
      org.apache.spark.sql.Encoders.scalaLong)
    val mins = spark.read.format("graft-iceberg").load(t.getPath)
      .agg(minK(graft.operators.TextOps.portableHash28(
        concat(lit("jk:"), col("k").cast("string"))))).as[Seq[Long]].head()
    val pf = new java.io.File(new java.io.File(t, "metadata"), "stats.puffin")
    graft.sources.PuffinIO.write(pf, Seq(graft.sources.PuffinIO.Blob(
      "graft-kmv-sketch-v1", Seq(1), 1L, 1L,
      Map("k" -> k64.toString), graft.sources.PuffinIO.sketchBytes(mins))))
    graft.sources.LayoutMaintenance.attachStatistics(spark, t.getPath, 1L, pf,
      Seq(("graft-kmv-sketch-v1", Seq(1), Map.empty[String, String])))
    // the scan's reported stats carry the NDV: visible through the
    // optimized plan's attribute statistics under CBO
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val df = spark.read.format("graft-iceberg").load(t.getPath)
      val stats = df.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.exists(_.toLong == 1000L),
        s"row count not reported: ${stats.rowCount}")
      val ndv = stats.attributeStats.collectFirst {
        case (a, s) if a.name == "k" => s.distinctCount
      }.flatten
      assert(ndv.exists(_.toLong == 7L),
        s"column NDV not reported: ${stats.attributeStats}")
    } finally spark.conf.unset("spark.sql.cbo.enabled")
  }

  test("CDC streaming read: commits surface as insert/delete change rows") {
    import spark.implicits._
    val t = new java.io.File("target/tmp-dsv2-cdc")
    val ckpt = new java.io.File("target/tmp-dsv2-cdc-ckpt")
    org.apache.commons.io.FileUtils.deleteQuietly(t)
    org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
    (0L until 10L).map(k => (k, k * 10)).toDF("k", "v")
      .write.format("graft-iceberg")
      .option("write.schema", "k LONG, v LONG").mode("append").save(t.getPath)
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Option[Long], Option[Long], String, Long)]
    val q = spark.readStream.format("graft-iceberg")
      .option("read-changes", "true").load(t.getPath)
      .writeStream.option("checkpointLocation", ckpt.getPath)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= df.collect().map(r => (
            if (r.isNullAt(0)) None else Some(r.getLong(0)),
            if (r.isNullAt(1)) None else Some(r.getLong(1)),
            r.getString(2), r.getLong(3)))
        }; ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(got.isEmpty, s"stream-from-latest must skip history: $got")
      // commit 2: MERGE upsert — new rows insert, old keys eq-delete
      graft.sources.LayoutMaintenance.commitUpsert(spark, t.getPath,
        Seq((3L, 333L), (11L, 111L)).toDF("k", "v"), keyCols = Seq("k"))
      q.processAllAvailable()
      val batch2 = got.toSeq
      assert(batch2.toSet == Set(
        (Some(3L), Some(333L), "insert", 2L),
        (Some(11L), Some(111L), "insert", 2L),
        (Some(3L), None, "delete", 2L), // eq tombstone: key only
        (Some(11L), None, "delete", 2L)), s"upsert CDC wrong: $batch2")
      // commit 3: predicate DELETE — the deleted ROWS themselves stream
      got.clear()
      graft.sources.LayoutMaintenance.commitDeleteWhere(
        spark, t.getPath, col("v") >= 80L)
      q.processAllAvailable()
      val batch3 = got.toSeq
      assert(batch3.toSet == Set(
        (Some(8L), Some(80L), "delete", 3L),
        (Some(9L), Some(90L), "delete", 3L),
        (Some(3L), Some(333L), "delete", 3L),
        (Some(11L), Some(111L), "delete", 3L)), s"delete CDC wrong: $batch3")
      // commit 4: rewrite_position_deletes consolidates the tombstones —
      // a physical no-op whose added delete file RESTATES commit 3's
      // deletes; the stream must advance past it emitting nothing
      got.clear()
      val (rwId, removedPos, _, _) = graft.sources.LayoutMaintenance
        .rewritePositionDeletes(spark, t.getPath)
      assert(removedPos > 0, "fixture should have carried pos-deletes")
      q.processAllAvailable()
      assert(got.isEmpty,
        s"delete-file maintenance (commit $rwId) must be a CDC no-op, " +
          s"not a re-emission: ${got.toSeq}")
    } finally q.stop()
  }

  test("CDC streaming read: one drain covers a multi-commit offset range per commit") {
    import spark.implicits._
    val t = new java.io.File("target/tmp-dsv2-cdc-multi")
    val ckpt = new java.io.File("target/tmp-dsv2-cdc-multi-ckpt")
    org.apache.commons.io.FileUtils.deleteQuietly(t)
    org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
    (0L until 10L).map(k => (k, k * 10)).toDF("k", "v")
      .write.format("graft-iceberg")
      .option("write.schema", "k LONG, v LONG").mode("append").save(t.getPath)
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Option[Long], Option[Long], String, Long)]
    val q = spark.readStream.format("graft-iceberg")
      .option("read-changes", "true").load(t.getPath)
      .writeStream.option("checkpointLocation", ckpt.getPath)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= df.collect().map(r => (
            if (r.isNullAt(0)) None else Some(r.getLong(0)),
            if (r.isNullAt(1)) None else Some(r.getLong(1)),
            r.getString(2), r.getLong(3)))
        }; ()
      }
      .start()
    try {
      q.processAllAvailable() // pin initial offset at the head
      // TWO commits land before the next drain: the range must plan
      // per-commit steps, so every change row keeps ITS commit's sid —
      // exactly what q218's one-drain fold relies on
      graft.sources.LayoutMaintenance.commitUpsert(spark, t.getPath,
        Seq((3L, 333L), (11L, 111L)).toDF("k", "v"), keyCols = Seq("k"))
      graft.sources.LayoutMaintenance.commitDeleteWhere(
        spark, t.getPath, col("v") >= 80L)
      q.processAllAvailable()
      assert(got.toSet == Set(
        (Some(3L), Some(333L), "insert", 2L),
        (Some(11L), Some(111L), "insert", 2L),
        (Some(3L), None, "delete", 2L),
        (Some(11L), None, "delete", 2L),
        (Some(8L), Some(80L), "delete", 3L),
        (Some(9L), Some(90L), "delete", 3L),
        (Some(3L), Some(333L), "delete", 3L),
        (Some(11L), Some(111L), "delete", 3L)),
        s"multi-commit range CDC wrong: ${got.toSeq}")
    } finally q.stop()
  }

  test("manifest-granular distributed planning past the driver file ceiling") {
    val capKey = "spark.graft.maxDriverFileEntries"
    spark.conf.set(capKey, "3") // 8-file fixture > 3: oversized
    try {
      val all = dsv2.select("okey", "price", "flag")
      // manifests, not files, are the planning unit now (the writeTable
      // fixture groups all 8 entries into ONE manifest)
      val nParts = all.rdd.getNumPartitions
      assert(nParts >= 1 && nParts < 8,
        s"expected manifest-granular partitions, got $nParts")
      assert(all.collect().map(key).sorted.toSeq ==
        ground.select("okey", "price", "flag").collect().map(key).sorted.toSeq)
      // pruning still happens — task-side now: result stays exact
      val f = dsv2.filter(col("price") >= 60000L).select("okey", "price", "flag")
      assert(f.collect().map(key).sorted.toSeq ==
        ground.filter(col("price") >= 60000L)
          .select("okey", "price", "flag").collect().map(key).sorted.toSeq)
      // aggregate pushdown must refuse (no per-file plan to fold)
      val agg = dsv2.agg(count(lit(1)))
      assert(!agg.queryExecution.executedPlan.toString.contains("aggPushed"))
      assert(agg.head.getLong(0) == ground.count())
    } finally spark.conf.unset(capKey)
  }

  test("sorted write records sort_order_id per file and registers the metadata sort order") {
    import spark.implicits._
    val t = new java.io.File("target/tmp-dsv2-sorted")
    org.apache.commons.io.FileUtils.deleteQuietly(t)
    Seq((3L, "c"), (1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format("graft-iceberg")
      .option("write.schema", "k LONG, v STRING")
      .option("write.sort-order", "k")
      .mode("append").save(t.getPath)
    // every data file stamped with the order it was written under
    val ids = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, t.getPath, "t", Nil)
      .select("sort_order_id").collect().map(r =>
        Option(r.getAs[java.lang.Integer](0)).map(_.intValue))
    assert(ids.nonEmpty && ids.forall(_.contains(1)))
    // and the metadata declares the default sort order (identity asc on k)
    assert(graft.sources.IcebergManifestSource.sortOrder(spark, t.getPath)
      == Seq((1, "identity", "asc", "nulls-first")))
    // an UNSORTED append to the same table voids the per-file claim
    Seq((9L, "z")).toDF("k", "v").write.format("graft-iceberg")
      .mode("append").save(t.getPath)
    val ids2 = graft.sources.IcebergManifestSource
      .statsFromTableDir(spark, t.getPath, "t", Nil)
      .select("sort_order_id").collect().map(r =>
        Option(r.getAs[java.lang.Integer](0)).map(_.intValue))
    assert(ids2.exists(_.isEmpty), "unsorted append must carry no sort_order_id")
  }

  test("storage-partitioned SORT-MERGE join over sorted tables: no shuffle AND no sort") {
    import spark.implicits._
    // identity-partitioned on region, one file per region, each file
    // SORTED by v and stamped sort_order_id=1; metadata declares the
    // identity-asc order on v — the scan reports (region, v) per-
    // partition ordering, so the SMJ needs neither exchange nor sort
    def mk(tag: String, rows: Seq[(Long, Long)]): java.io.File = {
      val t = new java.io.File(s"target/tmp-dsv2-spjsort-$tag")
      org.apache.commons.io.FileUtils.deleteQuietly(t)
      val dataDir = new java.io.File(t, "data"); dataDir.mkdirs()
      val entries = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (r, rs) =>
        val f = new java.io.File(dataDir, s"r$r.parquet")
        val n = IcebergLayoutWriter.writeSingleParquet(
          rs.sortBy(_._2).toDF("region", "v"), f)
        ManifestEntrySpec(status = 1, content = 0,
          filePath = f.getAbsolutePath, recordCount = n,
          sizeBytes = f.length(), sequenceNumber = 1L,
          partition = Seq("region" -> r), sortOrderId = 1)
      }
      IcebergLayoutWriter.writeTable(t, entries,
        partitionSpec = Seq(("region", "identity", 1)),
        sortOrder = Seq((2, "identity", "asc", "nulls-first")))
      t
    }
    val rowsA = (0L until 4L).flatMap(r => (0L until 10L).map(i => (r, i)))
    val rowsB = (0L until 4L).flatMap(r => (0L until 10L).map(i => (r, i)))
    val (tA, tB) = (mk("a", rowsA), mk("b", rowsB))
    def rd(t: java.io.File) = spark.read.format("graft-iceberg")
      .option("pushdown.fields", "region:1:long").load(t.getPath)
    val (bucketing, bcast) = ("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val prevB = spark.conf.getOption(bcast)
    spark.conf.set(bucketing, "true")
    spark.conf.set(bcast, "-1")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    try {
      val b = rd(tB).withColumnRenamed("region", "region2")
        .withColumnRenamed("v", "v2")
      val j = rd(tA).join(b, col("region") === col("region2"))
      val got = j.count()
      assert(got == 4L * 10L * 10L, s"per-region cross size wrong: $got")
      val plan = j.queryExecution.executedPlan
      assert(graft.operators.PlanProbe.shuffles(plan).isEmpty,
        s"SPJ must not shuffle:\n$plan")
      // AQE-aware collects (the SMJ lives inside the adaptive wrapper)
      def collectAll[T](p: org.apache.spark.sql.execution.SparkPlan)(
          pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] =
        p.collectWithSubqueries(
          pf.andThen(Seq(_)) orElse {
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              collectAll(q.plan)(pf)
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              collectAll(a.executedPlan)(pf)
          }).flatten
      // the claim is only meaningful if the join IS a sort-merge join —
      // a fallback join shape would make the no-sort assertion vacuous
      val smjs = collectAll(plan) {
        case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s }
      assert(smjs.nonEmpty, s"expected a sort-merge join:\n$plan")
      val sorts = collectAll(plan) {
        case s: org.apache.spark.sql.execution.SortExec => s }
      assert(sorts.isEmpty,
        s"scan-reported ordering must eliminate SMJ sorts:\n$plan")
    } finally {
      spark.conf.set(bucketing, "false")
      spark.conf.unset("spark.sql.join.preferSortMergeJoin")
      prevB match {
        case Some(v) => spark.conf.set(bcast, v)
        case None => spark.conf.unset(bcast)
      }
    }
  }

  test("storage-partitioned join: co-partitioned identity tables join with NO shuffle") {
    import spark.implicits._
    // two tables, both identity-partitioned on `region`, one file per
    // region value, partition values in the manifests
    def mk(tag: String, rows: Seq[(Long, Long)]): java.io.File = {
      val t = new java.io.File(s"target/tmp-dsv2-spj-$tag")
      org.apache.commons.io.FileUtils.deleteQuietly(t)
      val dataDir = new java.io.File(t, "data"); dataDir.mkdirs()
      val entries = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (r, rs) =>
        val f = new java.io.File(dataDir, s"r$r.parquet")
        val n = IcebergLayoutWriter.writeSingleParquet(
          rs.toDF("region", "v"), f)
        ManifestEntrySpec(status = 1, content = 0,
          filePath = f.getAbsolutePath, recordCount = n,
          sizeBytes = f.length(), sequenceNumber = 1L,
          partition = Seq("region" -> r))
      }
      IcebergLayoutWriter.writeTable(t, entries,
        partitionSpec = Seq(("region", "identity", 1)))
      t
    }
    val rowsA = (0L until 5L).flatMap(r => (0L until 20L).map(i => (r, r * 100 + i)))
    val rowsB = (0L until 5L).flatMap(r => (0L until 3L).map(i => (r, r * 1000 + i)))
    val (tA, tB) = (mk("a", rowsA), mk("b", rowsB))
    def rd(t: java.io.File) = spark.read.format("graft-iceberg")
      .option("pushdown.fields", "region:1:long").load(t.getPath)
    val (bucketing, bcast) = ("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val prevB = spark.conf.getOption(bcast)
    spark.conf.set(bucketing, "true")
    spark.conf.set(bcast, "-1") // force a non-broadcast join
    try {
      val j = rd(tA).join(rd(tB).withColumnRenamed("v", "v2"), "region")
        .select(col("region"), col("v"), col("v2"))
      val got = j.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      val want = rowsA.flatMap { case (r, v) =>
        rowsB.filter(_._1 == r).map { case (_, v2) => (r, v, v2) } }
        .sorted.toSeq
      assert(got == want, s"join result wrong: ${got.take(5)} vs ${want.take(5)}")
      val shuffles = graft.operators.PlanProbe.shuffles(
        j.queryExecution.executedPlan)
      assert(shuffles.isEmpty,
        s"storage-partitioned join must not shuffle:\n" +
          j.queryExecution.executedPlan)
    } finally {
      spark.conf.set(bucketing, "false")
      prevB match {
        case Some(v) => spark.conf.set(bcast, v)
        case None => spark.conf.unset(bcast)
      }
    }
  }

  test("struct columns: write/read round trip, nested pruning reaches the scan") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = new java.io.File("target/tmp-v2-struct")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    val df = Seq((1L, "web", 10L), (2L, "book", 20L), (3L, "web", 30L))
      .toDF("k", "src", "score")
      .select(col("k"),
        when(col("k") === 3L, lit(null))
          .otherwise(struct(col("src"), col("score"))).as("meta"))
    df.write.format("graft-iceberg").mode("append").save(dir.getPath)
    val back = spark.read.format("graft-iceberg").load(dir.getPath)
    assert(back.schema("meta").dataType.isInstanceOf[
      org.apache.spark.sql.types.StructType])
    val got = back.select(col("k"), col("meta.src"), col("meta.score"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).sortBy(_._1).toSeq
    assert(got == Seq((1L, "web", 10L), (2L, "book", 20L), (3L, null, -1L)))
    // nested pruning: a query touching only meta.src must hand the scan
    // a struct pruned to that one leaf — the reader then projects the
    // pruned group, so the score leaf's pages are never decoded
    val q = back.select(col("meta.src")).filter(col("meta.src") === "web")
    val scanSchemas = q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.readSchema()
    }
    assert(scanSchemas.nonEmpty)
    val metaDt = scanSchemas.head("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(metaDt.fieldNames.toSeq == Seq("src"),
      s"nested pruning must reach the scan, got $metaDt")
    assert(q.count() == 1L) // k=1 only (k=3's whole struct is null)
    // a second append stacks; aggregation over a nested field spans both
    Seq((4L, "web", 40L)).toDF("k", "src", "score")
      .select(col("k"), struct(col("src"), col("score")).as("meta"))
      .write.format("graft-iceberg").mode("append").save(dir.getPath)
    val agg = spark.read.format("graft-iceberg").load(dir.getPath)
      .groupBy(col("meta.src").as("src"))
      .agg(sum(col("meta.score")).as("s")).collect()
      .map(r => (Option(r.getString(0)).getOrElse("-"),
        if (r.isNullAt(1)) 0L else r.getLong(1))).sorted.toSeq
    assert(agg == Seq(("-", 0L), ("book", 20L), ("web", 50L)))
  }
}
