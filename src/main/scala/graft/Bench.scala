package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query wall times.
  * A short warmup action absorbs JVM/classloader startup so the timings
  * reflect steady-state engine throughput, and queries run in sorted order
  * so run-to-run comparisons are stable. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: JIT + codegen + parquet reader init, not counted
    spark.range(5000000L).selectExpr("sum(id)").collect()
    try SparkEntry.queries("q16_lang_profile")(spark, sfDir).count()
    catch { case _: Throwable => () }

    // min of 2 runs (3 when the two disagree by >30%): the first touch of a
    // plan pays whole-stage codegen compilation, and a neighbor query's GC
    // debt can land on either rep — the adaptive third rep is what keeps
    // bench times within ~20% of TimeOne warm reps instead of reporting
    // phantom 2x regressions. Before each query the cache is cleared (a
    // neighbor's leaked cache block steals executor memory) and a GC drains
    // inherited garbage so the timed reps start clean.
    // a failed query reports -1 (NOT its near-zero elapsed time) so broken
    // queries are visible in the JSON instead of deflating the total
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      spark.catalog.clearCache()
      System.gc()
      def rep(): Double = {
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      val two = Seq(rep(), rep())
      var times = if (two.forall(_ >= 0) && two.max > two.min * 1.3) two :+ rep() else two
      var good = times.filter(_ >= 0).sorted
      // spread = the two FASTEST reps (the slowest is usually the first
      // rep paying codegen compile — that's startup, not instability).
      // SUB-SECOND queries whose fastest pair still disagrees >2x are
      // JIT/GC-hostage, not unstable plans: buy up to 3 more cheap reps
      // before letting the spread flag fire (q17's 0.26..0.88 shape).
      while (good.size >= 2 && good(0) > 0.05 && good(0) < 1.5 &&
          good(1) > good(0) * 2 && times.size < 6) {
        times = times :+ rep()
        good = times.filter(_ >= 0).sorted
      }
      if (good.size >= 2) (name, good(0), good(1))
      else if (good.nonEmpty) (name, good.head, good.head)
      else (name, -1.0, -1.0)
    } ++ Seq(1000, 10000).map { n =>
      // catalog-width fan-out: 1,000 AND 10,000 synthesized tables each
      // diagnosed in ONE job (SURVEY §3.2's flagship multi-table claim,
      // timed per round; FanoutSpec proves the shuffle count is the same
      // at both widths) — min-of-2 like every other entry
      spark.catalog.clearCache(); System.gc()
      def fanoutRep(): Double = {
        val t0 = System.nanoTime()
        val got = try graft.metrics.Fanout.run(spark, n).count() catch {
          case e: Throwable =>
            System.err.println(s"[bench] fanout$n FAILED: ${e.getMessage}"); -1L
        }
        if (got == n.toLong) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      // three reps for these sub-second probes: with two, one JIT/GC
      // hiccup on a 0.3s measurement trips the >2x spread flag on pure
      // noise; the two FASTEST of three keep the same min-time contract
      val reps = Seq(fanoutRep(), fanoutRep(), fanoutRep())
        .filter(_ >= 0).sorted
      if (reps.size >= 2) (s"fanout$n", reps(0), reps(1))
      else if (reps.nonEmpty) (s"fanout$n", reps.head, reps.head)
      else (s"fanout$n", -1.0, -1.0)
    }
    // The driver captures only the LAST ~2000 chars of output and parses
    // the JSON line out of that tail; sbt's own "[success]" epilogue eats
    // ~100 of those chars too. Round 6's 151-entry 3-decimal line outgrew
    // the window and went ungraded ("parsed": null). Two-pronged fix:
    // (a) the stdout line stays SMALL — qNN keys + integer MILLISECONDS
    // ("qunit":"ms" marks the unit; ~10 chars/query keeps 200+ queries
    // inside the window); (b) the full-name full-precision detail is
    // WRITTEN TO BENCH_DETAIL.json in the repo root, immune to any tail
    // buffer, plus echoed to stderr for humans.
    def d3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    results.foreach { case (k, v, _) => System.err.println(s"[bench] $k ${d3(v)} s") }
    // variance telemetry: a query whose two FASTEST reps disagree >2x
    // inside ONE run is environment-hostage (checkpoint placement, GC
    // debt, page cache) and its min is not trustworthy as "the" time —
    // self-report it here instead of leaving the discovery to a
    // cross-host comparison
    val flagged = results.filter { case (_, mn, m2) => mn > 0.05 && m2 > mn * 2 }
    flagged.foreach { case (k, mn, m2) =>
      System.err.println(s"[bench] SPREAD $k: fastest reps ${d3(mn)}..${d3(m2)} s (>2x)")
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    val detail = results.map { case (k, v, _) => "\"" + k + "\":" + d3(v) }
      .mkString("{", ",", "}")
    val spread = results.map { case (k, mn, mx) =>
      "\"" + k + "\":[" + d3(mn) + "," + d3(mx) + "]"
    }.mkString("{", ",", "}")
    val flaggedJson = flagged.map("\"" + _._1 + "\"").mkString("[", ",", "]")
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"),
      (s"""{"sf":"$sfDir","cpus":"$cpus","total_sec":${d3(total)},""" +
        s""""queries_sec":$detail,"rep_spread_sec":$spread,""" +
        s""""spread_flagged":$flaggedJson}""" + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] detail write failed: $e") }
    // The name-keyed per-query map outgrew the driver's ~2 KB tail window
    // at ~250 queries (round 9's file carried a truncated tail with
    // parsed:null). The stdout line now carries the COMPLETE per-query
    // coverage as a dense array: q_ms[i] is q(i+1)'s fastest rep in
    // integer milliseconds, -1 = failed, -2 = no query with that number;
    // fanout probes ride separately. ~4.5 chars/query keeps 300+ queries
    // inside the window as one parseable JSON object. Names, full
    // precision, and rep spreads stay in BENCH_DETAIL.json.
    val byNum = results.collect { case (k, v, _) if k.startsWith("q") =>
      k.drop(1).takeWhile(_.isDigit).toInt -> v }.toMap
    val maxQ = byNum.keys.max
    val qArr = (1 to maxQ).map(i => byNum.get(i) match {
      case None => "-2"
      case Some(v) if v < 0 => "-1"
      case Some(v) => math.round(v * 1000).toString
    }).mkString("[", ",", "]")
    val fanout = results.filter(_._1.startsWith("fanout"))
      .map { case (_, v, _) =>
        if (v < 0) "-1" else math.round(v * 1000).toString }
      .mkString("[", ",", "]")
    // stop BEFORE printing: any shutdown logging after the JSON line could
    // push it out of the tail buffer — the JSON line must be the process's
    // last output, and a shutdown failure must not lose computed results.
    try spark.stop() catch { case e: Throwable => System.err.println(s"[bench] stop failed: $e") }
    println(s"""{"metric":"total","value":${d3(total)},"unit":"sec","sf":"$sfDir",""" +
      s""""qunit":"ms","q_index":"q_ms[i] = q(i+1); -1 failed, -2 absent",""" +
      s""""q_ms":$qArr,"fanout_ms":$fanout,"detail":"BENCH_DETAIL.json"}""")
    System.out.flush()
  }
}
