package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Sessionizer
import graft.streaming.Sessionizer.{Event, Session}

/** Streaming sessionization: feed the events through a MemoryStream in two
  * batches and check sessions against a hand-computed expectation AND the
  * batch twin's semantics (gap > 30 min closes a session). */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val H = 3600L * 1000000 // 1h in micros

  test("streaming funnel matches q45 semantics (first signup, first purchase after, 1h flag)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Funnel
    import graft.streaming.Funnel.{Conversion, FunnelEvent}
    val input = MemoryStream[FunnelEvent]
    val conv = Funnel.conversions(input.toDS())
    val q = conv.writeStream.format("memory").queryName("funnel").outputMode("append").start()
    try {
      val base = 1000 * H
      input.addData(
        // user 1: signup then purchase 10 min later -> converted
        FunnelEvent(1, "signup", base), FunnelEvent(1, "purchase", base + 600000000L),
        // user 2: purchase BEFORE signup, next purchase 2h after -> not converted (but purchase recorded)
        FunnelEvent(2, "purchase", base - 600000000L), FunnelEvent(2, "signup", base),
        FunnelEvent(2, "purchase", base + 2 * H),
        // user 3: signup, no purchase -> not converted, no purchase_us
        FunnelEvent(3, "signup", base),
        // user 4: purchases only -> no funnel row
        FunnelEvent(4, "purchase", base))
      q.processAllAvailable()
      // out-of-order: user 5's purchase arrives before their EARLIER signup
      // (timestamps sit above the batch-1 watermark of base + 2h - 30min)
      input.addData(FunnelEvent(5, "purchase", base + 3 * H + 300000000L))
      q.processAllAvailable()
      input.addData(FunnelEvent(5, "signup", base + 3 * H + 100000000L))
      q.processAllAvailable()
      // advance the watermark far past base + horizon so all states finalize
      input.addData(FunnelEvent(99, "signup", base + 200 * H))
      q.processAllAvailable()
      input.addData(FunnelEvent(99, "signup", base + 400 * H))
      q.processAllAvailable()
      val out = spark.table("funnel").as[Conversion].collect()
        .map(c => c.user_id -> c).toMap
      withClue(s"out=${out.toSeq.sortBy(_._1)}") {
        assert(out.get(1L).contains(Conversion(1, base, Some(base + 600000000L), 1)))
        assert(out.get(2L).contains(Conversion(2, base, Some(base + 2 * H), 0)))
        assert(out.get(3L).contains(Conversion(3, base, None, 0)))
        assert(!out.contains(4L))
        assert(out.get(5L).contains(
          Conversion(5, base + 3 * H + 100000000L, Some(base + 3 * H + 300000000L), 1)))
      }
    } finally q.stop()
  }

  test("funnel tombstone: re-activity after emission does not duplicate the user's row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Funnel
    import graft.streaming.Funnel.{Conversion, FunnelEvent}
    val input = MemoryStream[FunnelEvent]
    val conv = Funnel.conversions(input.toDS())
    val q = conv.writeStream.format("memory").queryName("funnel_ts").outputMode("append").start()
    try {
      val base = 1000 * H
      input.addData(FunnelEvent(1, "signup", base), FunnelEvent(1, "purchase", base + 600000000L))
      q.processAllAvailable()
      // advance the watermark past base + horizon: user 1 finalizes and emits
      input.addData(FunnelEvent(99, "signup", base + 10 * H))
      q.processAllAvailable()
      input.addData(FunnelEvent(99, "signup", base + 11 * H))
      q.processAllAvailable()
      assert(spark.table("funnel_ts").as[Conversion].collect().count(_.user_id == 1L) == 1)
      // user 1 reappears (second signup + purchase) within the tombstone
      // horizon; finalize again by pushing the watermark far ahead
      input.addData(
        FunnelEvent(1, "signup", base + 12 * H), FunnelEvent(1, "purchase", base + 12 * H + 1))
      q.processAllAvailable()
      input.addData(FunnelEvent(99, "signup", base + 20 * H))
      q.processAllAvailable()
      input.addData(FunnelEvent(99, "signup", base + 40 * H))
      q.processAllAvailable()
      val rows = spark.table("funnel_ts").as[Conversion].collect().filter(_.user_id == 1L)
      withClue(s"rows=${rows.toSeq}") {
        assert(rows.length == 1, "user 1 must be emitted exactly once despite re-activity")
        assert(rows.head == Conversion(1, base, Some(base + 600000000L), 1))
      }
    } finally q.stop()
  }

  test("gap sessionization over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionizer.sessionize(input.toDS(), gapUs = 30L * 60 * 1000000)
    val q = sessions.writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // NOTE: events at/below the initial watermark (0) are dropped as late;
      // keep all test timestamps strictly positive past the delay.
      val base = 1000 * H
      val tenMin = 10 * 60 * 1000000L
      // user 1: two events close together, then a 2h gap, then one more
      input.addData(
        Event(1, 1, base, 1.0), Event(1, 2, base + tenMin, 1.0),
        Event(2, 3, base, 1.0))
      q.processAllAvailable()
      input.addData(Event(1, 4, base + 2 * H + tenMin, 1.0))
      q.processAllAvailable()
      // user 1's first session must have closed (gap 2h > 30min)
      val closed = spark.table("sess").as[Session].collect()
      withClue(s"closed=${closed.toSeq}") {
        assert(closed.exists(s => s.user_id == 1 && s.n_events == 2 && s.start_us == base))
      }
      // push the watermark far ahead so open sessions time out
      input.addData(Event(9, 99, base + 100 * H, 1.0))
      q.processAllAvailable()
      input.addData(Event(9, 100, base + 101 * H, 1.0))
      q.processAllAvailable()
      val all = spark.table("sess").as[Session].collect()
      withClue(s"all=${all.toSeq}") {
        assert(all.exists(s => s.user_id == 2 && s.n_events == 1))
        assert(all.exists(s => s.user_id == 1 && s.n_events == 1 && s.start_us == base + 2 * H + tenMin))
      }
    } finally q.stop()
  }

  test("streaming metrics over a file-entry stream match the batch pipeline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[graft.model.FileEntry]
    val results = scala.collection.mutable.Map.empty[Long, Map[String, graft.model.TableMetricsWide]]
    val q = graft.streaming.MetricsStream.start(input.toDS(), manifestCountPerTable = 2) {
      (wide, batchId) =>
        results.synchronized { results(batchId) = wide.collect().map(w => w.table -> w).toMap }
    }
    try {
      val mib = 1024L * 1024
      val batch = Seq(
        graft.model.FileEntry("t1", 0, "p1", 100 * mib),
        graft.model.FileEntry("t1", 0, "p1", 900 * mib),
        graft.model.FileEntry("t1", 2, "p1", 10 * mib),
        graft.model.FileEntry("t2", 0, "px", 5 * mib))
      input.addData(batch: _*)
      q.processAllAvailable()
      val got = results.synchronized(results.values.flatten.toMap)
      assert(got.keySet == Set("t1", "t2"))
      // cross-check against the batch pipeline on the same data
      val batchWide = graft.metrics.MetricsCalculator.computeMetricsWide(
        spark.createDataset(batch),
        spark.createDataset(Seq(("t1", 2L), ("t2", 2L)))).collect()
        .map(w => w.table -> w).toMap
      assert(got == batchWide)
      assert(got("t1").fileCountBefore == 3 && got("t1").totalPartitions == 1)
    } finally q.stop()
  }

  test("stream-stream interval join: purchases pick up in-range signups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Event]
    val signups = MemoryStream[Event]
    val joined = Sessionizer.purchasesWithRecentSignups(
      purchases.toDS(), signups.toDS(), intervalUs = H) // 1h lookback
    val q = joined.writeStream.format("memory").queryName("ssjoin").outputMode("append").start()
    try {
      val base = 1000 * H
      signups.addData(
        Event(1, 10, base, 0), // in range of purchase at base+30min
        Event(1, 11, base - 2 * H, 0), // too old
        Event(2, 12, base, 0)) // other user
      purchases.addData(Event(1, 100, base + 30 * 60 * 1000000L, 9.99))
      q.processAllAvailable()
      val rows = spark.table("ssjoin")
        .select("purchase_id", "signup_id").as[(Long, Long)].collect().toSet
      assert(rows == Set((100L, 10L)))
    } finally q.stop()
  }

  test("interval join honors sub-second lookbacks (no truncation)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Event]
    val signups = MemoryStream[Event]
    // 0.5s lookback: would degenerate to exact-timestamp-only if the
    // interval were truncated to whole seconds
    val joined = Sessionizer.purchasesWithRecentSignups(
      purchases.toDS(), signups.toDS(), intervalUs = 500000L)
    val q = joined.writeStream.format("memory").queryName("ssjoin2").outputMode("append").start()
    try {
      val base = 1000 * H
      signups.addData(
        Event(1, 20, base - 300000L, 0), // 0.3s before: in range
        Event(1, 21, base - 800000L, 0)) // 0.8s before: out of range
      purchases.addData(Event(1, 200, base, 1.0))
      q.processAllAvailable()
      val rows = spark.table("ssjoin2")
        .select("purchase_id", "signup_id").as[(Long, Long)].collect().toSet
      assert(rows == Set((200L, 20L)))
    } finally q.stop()
  }

  test("streaming dedup keeps first-seen content across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[graft.streaming.StreamingDedup.Doc]
    val q = graft.streaming.StreamingDedup.dedup(input.toDS())
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      val base = 1000 * H
      input.addData(
        graft.streaming.StreamingDedup.Doc(1, "alpha beta", base),
        graft.streaming.StreamingDedup.Doc(2, "alpha beta", base + 1), // dup in-batch
        graft.streaming.StreamingDedup.Doc(3, "gamma", base))
      q.processAllAvailable()
      input.addData(
        graft.streaming.StreamingDedup.Doc(4, "gamma", base + 1000), // dup cross-batch
        graft.streaming.StreamingDedup.Doc(5, "delta", base + 1000))
      q.processAllAvailable()
      val ids = spark.table("dedup").select("doc_id").as[Long].collect().toSet
      assert(ids.contains(3L) && ids.contains(5L))
      assert(!ids.contains(4L)) // cross-batch duplicate suppressed by state
      assert((ids & Set(1L, 2L)).size == 1) // exactly one of the in-batch dups
    } finally q.stop()
  }

  test("streaming heavy hitters: alert exactly once on crossing, set matches batch recount") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingHeavyHitters
    import graft.streaming.StreamingHeavyHitters.{Alert, KeyEvent}
    // skewed stream: key "hot" 12x, "warm" 5x, background keys 1-2x
    val evs = (0 until 12).map(i => KeyEvent("hot", i)) ++
      (0 until 5).map(i => KeyEvent("warm", 100 + i)) ++
      (0 until 8).map(i => KeyEvent(s"bg${i % 4}", 200 + i))
    val input = MemoryStream[KeyEvent]
    val q = StreamingHeavyHitters.alerts(input.toDS(), threshold = 5L)
      .writeStream.format("memory").queryName("hh").outputMode("append").start()
    try {
      // feed in three batches so "hot" crosses mid-stream and keeps flowing after
      val batches = evs.grouped(9).toSeq
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val alerts = spark.table("hh").as[Alert].collect()
      // exactly-once: one alert row per flagged key
      assert(alerts.map(_.k).toSeq.sorted == alerts.map(_.k).distinct.toSeq.sorted)
      // flagged set == batch recount at the same threshold
      val want = evs.groupBy(_.k).filter(_._2.size >= 5).keySet
      assert(alerts.map(_.k).toSet == want)
      assert(want == Set("hot", "warm"), "fixture must be non-degenerate")
      // the crossing count is recorded at-or-after the threshold, never before
      alerts.foreach(a => assert(a.n_at_alert >= 5))
    } finally q.stop()
  }

  test("streaming packer: closed bins match batch q82 on in-order delivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingPacker
    import graft.streaming.StreamingPacker.{Doc, PackedSeq}
    import org.apache.spark.sql.functions.{col, size, split}
    val dir = "/root/testdata/sf0.001"
    // the same corpus the batch query packs, in (lang, doc_id) order
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tok"))
      .as[Doc].collect().sortBy(d => (d.lang, d.doc_id))
    val input = MemoryStream[Doc]
    val q = StreamingPacker.pack(input.toDS())
      .writeStream.format("memory").queryName("packer").outputMode("append").start()
    try {
      docs.grouped(97).foreach { b => input.addData(b.toSeq: _*); q.processAllAvailable() }
      val streamed = spark.table("packer").as[PackedSeq].collect()
        .map(p => (p.lang, p.seq_id, p.n_docs, p.n_tokens)).toSet
      val batch = graft.operators.Queries6.all("q82_sequence_packing")(spark, dir)
        .select(col("lang"), col("seq_id"), col("n_docs"), col("n_tokens"))
        .as[(String, Long, Long, Long)].collect()
      val batchSet = batch.toSet
      // every streamed (closed) bin is a batch bin
      streamed.foreach(b => assert(batchSet.contains(b), s"stream-only bin $b"))
      // batch bins not yet streamed are exactly the per-lang OPEN (last) bins
      val open = batch.groupBy(_._1).map { case (_, bs) => bs.maxBy(_._2) }.toSet
      assert(batchSet -- streamed == open, "missing bins must be the open tails")
      assert(streamed.size == batchSet.size - open.size)
    } finally q.stop()
  }

  test("streaming windowed counts match the batch computation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = (0 until 100).map(i =>
      Event(i % 7, i, i * 97L * 1000000, i * 0.5))
    val input = MemoryStream[Event]
    val agg = Sessionizer.windowedCounts(input.toDS())
    val q = agg.writeStream.format("memory").queryName("winagg").outputMode("complete").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("winagg").as[(Long, Long, Double)].collect().toSet
      val batch = events.groupBy(e => e.ts_us / H * H).map { case (w, es) =>
        (w, es.size.toLong, es.map(_.value).sum)
      }.toSet
      assert(streamed.map(t => (t._1, t._2)) == batch.map(t => (t._1, t._2)))
      // sums may differ in float order; compare rounded
      val sMap = streamed.map(t => t._1 -> math.round(t._3 * 100)).toMap
      val bMap = batch.map(t => t._1 -> math.round(t._3 * 100)).toMap
      assert(sMap == bMap)
    } finally q.stop()
  }

  test("hopping windows: each event counted in exactly length/hop windows (q44 twin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val agg = Sessionizer.hoppingCounts(input.toDS()) // 1h window, 30m hop
    val q = agg.writeStream.format("memory").queryName("hopagg").outputMode("complete").start()
    try {
      val base = 1000 * H
      val events = Seq(
        Event(1, 1, base + 10 * 60 * 1000000L, 2.0),   // 10 min past the hour
        Event(1, 2, base + 40 * 60 * 1000000L, 3.0),   // 40 min past
        Event(2, 3, base + H + 5 * 60 * 1000000L, 1.0)) // next hour
      input.addData(events: _*)
      q.processAllAvailable()
      val rows = spark.table("hopagg").as[(Long, Long, Double)].collect()
      // every event lands in exactly 2 windows
      assert(rows.map(_._2).sum == 2 * events.size)
      val byStart = rows.map(r => r._1 -> r).toMap
      val halfH = 30 * 60 * 1000000L
      // window [base, base+1h) holds events 1 and 2; [base-30m, ...) only event 1
      assert(byStart(base)._2 == 2)
      assert(byStart(base - halfH)._2 == 1)
      assert(byStart(base + halfH)._2 == 2) // events 2 and 3
    } finally q.stop()
  }

  test("streaming anomaly detector matches batch q72 on in-order delivery") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.AnomalyDetector
    import graft.streaming.AnomalyDetector.{Anomaly, ValueEvent}
    implicit val s = spark
    val dir = "/root/testdata/sf0.001"
    val all = graft.operators.Rel.events(dir)
      .select(col("event_id"), col("event_type"), col("ts_us"), col("value"))
      .as[ValueEvent].collect().sortBy(e => (e.ts_us, e.event_id))
    val input = MemoryStream[ValueEvent]
    val q = AnomalyDetector.anomalies(input.toDS())
      .writeStream.format("memory").queryName("anom").outputMode("append").start()
    try {
      // deliver in three event-time-ordered chunks (order across batches
      // preserved -> the stream must reproduce the batch scores exactly)
      all.grouped((all.length + 2) / 3).foreach { chunk =>
        input.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("anom").as[Anomaly].collect()
        .map(a => a.event_id -> a).toMap
      val batch = graft.operators.Queries4.all("q72_anomaly_zscore")(spark, dir)
        .as[(Long, String, Long, Long, Double)].collect()
      assert(batch.nonEmpty)
      assert(streamed.keySet == batch.map(_._1).toSet)
      batch.foreach { case (id, _, v, nPrior, z) =>
        val a = streamed(id)
        assert(a.v == v && a.n_prior == nPrior)
        assert(math.abs(a.z - z) < 1e-12, s"event $id: stream z=${a.z} batch z=$z")
      }
    } finally q.stop()
  }
}
