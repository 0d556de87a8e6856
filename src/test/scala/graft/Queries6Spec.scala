package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Queries6

/** Behavioral tests for the round-5 batch-2 operators (the oracle gate
  * covers value parity; these pin down ALGORITHM invariants the oracle
  * can't express — conservation laws, partitioning-independence, merge
  * equivalence). */
class Queries6Spec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("sequence packing: tokens conserved, bins close before overflow, seq ids dense") {
    import spark.implicits._
    val bins = Queries6.all("q82_sequence_packing")(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(bins.nonEmpty)
    // docs are 10-99 tokens (< budget), so every bin must respect the cap
    bins.foreach { case (lang, seq, nDocs, nToks, fill) =>
      assert(nDocs >= 1)
      assert(nToks <= 256L, s"$lang#$seq overflows: $nToks")
      assert(math.abs(fill - nToks.toDouble / 256) < 1e-4) // fill_frac is round(..,4)
    }
    // conservation: total docs and tokens across bins == corpus totals
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("tok"))
    assert(bins.map(_._3).sum == docs.count())
    assert(bins.map(_._4).sum == docs.agg(sum("tok")).as[Long].head())
    // per lang: seq ids are 1..n with no gaps
    bins.groupBy(_._1).foreach { case (lang, bs) =>
      val seqs = bs.map(_._2).sorted
      assert(seqs.toSeq == (1L to seqs.length).toSeq, s"$lang seq ids not dense")
    }
    // greedy tightness: no bin except the last of each lang could have
    // absorbed the first doc of the next bin — implied by close-on-overflow;
    // spot-check that average fill is reasonable (> 60%)
    val nonLast = bins.groupBy(_._1).toSeq.flatMap { case (_, bs) => bs.sortBy(_._2).dropRight(1).toSeq }
    if (nonLast.nonEmpty)
      assert(nonLast.map(_._4).sum.toDouble / (256L * nonLast.size) > 0.6)
  }

  test("mixture weights: shares sum to 1, weights capped, upweighting is toward uniform") {
    import spark.implicits._
    val rows = Queries6.all("q83_mixture_weights")(spark, dir)
      .as[(String, Long, Double, Double, Long)].collect()
    assert(rows.length >= 2)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3)
    rows.foreach { case (_, n, share, w, exp) =>
      assert(w <= 3.0 + 1e-9)
      assert(w > 0)
      assert(exp <= (3.0 * n).toLong)
      // under-represented langs (share < uniform) get weight > 1, and vice
      // versa (modulo the cap)
      val uniform = 1.0 / rows.length
      if (share < uniform - 1e-9) assert(w > 1.0 - 1e-9)
      if (share > uniform + 1e-9) assert(w < 1.0 + 1e-9)
    }
  }

  test("heavy hitters: two-pass answer equals the full groupBy answer and is partitioning-independent") {
    import spark.implicits._
    val got = Queries6.all("q84_heavy_hitters")(spark, dir)
      .as[(String, Long, Double)].collect().toSeq
    assert(got.nonEmpty)
    // exact reference: full groupBy over the same derived stream
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val stream = li.select(concat(lit("L"), length(bin(col("l_orderkey") + 1)).cast("string")).as("k"))
      .union(li.select(concat(lit("u"), ((col("l_orderkey") * 7919) % 5000).cast("string")).as("k")))
    val total = stream.count()
    val want = stream.groupBy("k").count().filter(col("count") * 64 > total)
      .orderBy(desc("count"), col("k"))
      .as[(String, Long)].collect().toSeq
    assert(got.map(t => (t._1, t._2)) == want)
    // every reported key really is heavy; background uniform keys never appear
    got.foreach { case (k, n, share) =>
      assert(n * 64 > total)
      assert(k.startsWith("L"), s"uniform background key $k leaked into heavy set")
      assert(math.abs(share - n.toDouble / total) < 1e-6) // share is round(..,6)
    }
  }

  test("cohort retention: offset-0 retention is 1, retention in (0,1], cohort sizes consistent") {
    import spark.implicits._
    val rows = Queries6.all("q85_cohort_retention")(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, cs) =>
      val zero = cs.filter(_._2 == 0L)
      assert(zero.length == 1, "every cohort must have an offset-0 row")
      assert(zero.head._4 == 1.0)
      cs.foreach { case (_, off, n, r) =>
        assert(off >= 0)
        assert(r > 0 && r <= 1.0)
        assert(n <= zero.head._3, "no offset can exceed cohort size")
      }
    }
  }

  test("ship priority: top-10, descending revenue, only pre-cutoff BUILDING orders") {
    import spark.implicits._
    val rows = Queries6.all("q86_ship_priority")(spark, dir)
      .as[(Long, Long, Double)].collect()
    assert(rows.length == 10)
    assert(rows.map(_._3).sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    rows.foreach { case (_, dateUs, rev) =>
      assert(dateUs < 852076800000000L, "order date must be before the cutoff")
      assert(rev > 0)
    }
    val building = spark.read.parquet(s"$dir/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val ordersOf = spark.read.parquet(s"$dir/orders.parquet")
      .join(building, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey")).as[Long].collect().toSet
    rows.foreach(r => assert(ordersOf.contains(r._1), s"order ${r._1} not from a BUILDING customer"))
  }

  test("scd2 history: one current row per live key, intervals chain, deletes close") {
    import spark.implicits._
    val rows = Queries6.all("q87_scd2_history")(spark, dir)
      .as[(Long, Long, Option[Long], Long, Long, Double, String)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (k, hist) =>
      val sorted = hist.sortBy(_._2)
      // intervals chain: each ver_to equals the next ver_from
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3.contains(b._2), s"key $k: interval gap")
        case _ => ()
      }
      val current = hist.filter(_._4 == 1L)
      if (k % 50 == 0 && k >= 0) {
        // deleted keys: no current row; last interval closed by the delete
        assert(current.isEmpty, s"deleted key $k still has a current row")
        assert(sorted.last._5 == 1L, s"deleted key $k: last interval not closed by D")
      } else {
        assert(current.length == 1, s"live key $k must have exactly one current row")
        assert(current.head._3.isEmpty)
      }
      // inserted keys (negative space) have exactly one open version
      if (k < 0) assert(hist.length == 1 && current.length == 1)
    }
  }

  test("incremental agg: merged partials equal a direct full aggregation") {
    import spark.implicits._
    val got = Queries6.all("q88_incremental_agg")(spark, dir)
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val want = spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("cents", expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)"))
      .groupBy(col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("n_rows"), sum("cents").as("sum_cents"),
        min("cents").as("min_cents"), max("cents").as("max_cents"))
      .select(col("prio"), col("n_rows"), col("sum_cents"), col("min_cents"),
        col("max_cents"),
        round(col("sum_cents").cast("double") / (col("n_rows") * 100), 4).as("avg_price"))
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got == want, "partial-agg merge must be bit-exact vs full recompute")
  }

  test("kmv sketch: estimate within expected error, exact column matches countDistinct") {
    import spark.implicits._
    val rows = Queries6.all("q90_kmv_distinct")(spark, dir)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.length >= 3)
    rows.foreach { case (flag, exact, est, relErr) =>
      assert(exact > 64, s"$flag: fixture must exercise the sketch path")
      // KMV with k=64 has std error ~ 1/sqrt(k-2) ~ 12.7%; 4 sigma bound
      assert(relErr < 0.5, s"$flag: estimate $est vs $exact (err $relErr) implausibly bad")
      assert(math.abs(relErr - math.abs(est - exact).toDouble / exact) < 1e-4)
    }
  }

  test("kmv aggregator: distinct min-k, order- and partitioning-independent, merge law") {
    import graft.functions.MinKDistinct
    val agg = new MinKDistinct.MinK(4)
    val xs = Seq(9L, 3L, 7L, 3L, 1L, 8L, 1L, 5L, 2L)
    val direct = xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
    assert(agg.finish(direct) == Seq(1L, 2L, 3L, 5L))
    // split arbitrarily, reduce each side, merge — same sketch
    val (l, r) = xs.splitAt(4)
    val m = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(m) == agg.finish(direct))
    // reversed order — same sketch
    val rev = xs.reverse.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
    assert(agg.finish(rev) == agg.finish(direct))
  }

  test("pagerank: ranks positive, top node is a hub, iteration is deterministic") {
    import spark.implicits._
    val rows = Queries6.all("q91_part_pagerank")(spark, dir)
      .as[(Long, Long)].collect()
    assert(rows.length == 20)
    rows.foreach { case (_, r) => assert(r >= 150000L, "rank below the damping floor") }
    assert(rows.map(_._2).sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    // determinism across runs
    val again = Queries6.all("q91_part_pagerank")(spark, dir)
      .as[(Long, Long)].collect()
    assert(rows.toSeq == again.toSeq)
    // the top-ranked part must have above-median co-purchase degree
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val deg = li.join(li.withColumnRenamed("p", "q"), Seq("o"))
      .filter(col("p") =!= col("q")).select(col("o"), col("p"), col("q")).distinct()
      .groupBy("p").count()
    val medianDeg = deg.stat.approxQuantile("count", Array(0.5), 0.01).head
    val topDeg = deg.filter(col("p") === rows.head._1).select("count").as[Long].head()
    assert(topDeg >= medianDeg, "top PageRank node should not be a low-degree node")
  }

  test("pq encode: codebook vectors self-encode at zero error, codes in range") {
    import spark.implicits._
    val rows = Queries6.all("q92_pq_encode")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val total = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.length == total, "every vector must be encoded")
    rows.foreach { case (id, c0, c1, c2, c3, err) =>
      Seq(c0, c1, c2, c3).foreach(c => assert(c >= 0 && c < 16, s"vec $id code $c out of range"))
      assert(err >= 0)
      if (id < 16) {
        // a codebook seed's nearest codeword in every subspace is itself
        assert(Seq(c0, c1, c2, c3).forall(_ == id), s"seed $id not self-coded")
        assert(err == 0L, s"seed $id nonzero reconstruction error $err")
      }
    }
    // non-seed vectors are word salad: reconstruction error must be nonzero
    val nonSeed = rows.filter(_._1 >= 16)
    assert(nonSeed.nonEmpty && nonSeed.forall(_._6 > 0))
  }

  test("pq adc search: ranks dense per query, adc distance is the sum of per-subspace LUT entries") {
    import spark.implicits._
    val rows = Queries6.all("q93_pq_adc_search")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 50, "10 queries x top-5")
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._4).sorted.toSeq == (1L to 5L), s"query $q ranks not dense")
      // adc distances ascend with rank
      val byRank = rs.sortBy(_._4).map(_._3)
      assert(byRank.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
      assert(!rs.exists(_._2 == q), "self must be excluded")
    }
    // a query that IS a codebook seed (id < 10 < 16) has adc_dist 0 to any
    // vector whose 4 codes equal the seed's id — in particular rank-1 dist
    // to itself would be 0; excluding self, distances are still >= 0
    rows.foreach(r => assert(r._3 >= 0))
  }

  test("join-cardinality sketch: union estimate within 4 sigma, exact columns consistent") {
    import spark.implicits._
    val r = Queries6.all("q94_join_cardinality_sketch")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Double, Double)].head()
    val (ea, eb, eu, ei, estU, estI, errU, _) = r
    assert(ea + eb - eu == ei, "inclusion-exclusion must hold")
    assert(ei >= 0 && ei <= math.min(ea, eb))
    assert(ea > 128 && eb > 128, "fixture must exercise the sketch path")
    // KMV k=128: std err ~ 1/sqrt(126) ~ 8.9%; 4 sigma
    assert(errU < 0.36, s"union estimate $estU vs $eu (err $errU) implausibly bad")
    assert(estI >= 0 && estI <= estU)
  }

  test("equi-depth histogram: bucket counts within 1, bounds non-overlapping and ordered") {
    import spark.implicits._
    val rows = Queries6.all("q95_equidepth_histogram")(spark, dir)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.length == 8)
    val counts = rows.map(_._2)
    assert(counts.max - counts.min <= 1, "equi-depth buckets must differ by at most 1")
    rows.foreach { case (_, _, lo, hi) => assert(lo <= hi) }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3, "bucket bounds must not overlap")
      case _ => ()
    }
  }

  test("asof tolerance: fresh matches within bound, stale matches nulled, fixture non-degenerate") {
    import spark.implicits._
    val rows = Queries6.all("q97_asof_tolerance")(spark, dir)
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, _, id, gap) =>
      assert(id.isDefined == gap.isDefined, "id and gap must null together")
      gap.foreach(g => assert(g >= 0 && g <= 86400000000L, s"gap $g outside tolerance"))
    }
    // the 1-day bound must actually split the data: some fresh, some stale/unmatched
    assert(rows.exists(_._4.isDefined) && rows.exists(_._4.isEmpty),
      "tolerance must be non-degenerate on this fixture")
  }

  test("multi-table metrics: one DAG covers populated, delete-heavy, and EMPTY tables") {
    import spark.implicits._
    val rows = Queries6.all("q98_multi_table_metrics")(spark, dir).collect()
    assert(rows.length == 4)
    val byTbl = rows.map(r => r.getString(0) -> r).toMap
    assert(byTbl.keySet == Set("t0", "t1", "t2", "t3"))
    // t0 has no file entries: overhead seeded purely from its 5 manifests,
    // every other metric zero — the reference's empty-iterator behavior
    val t0 = byTbl("t0")
    assert(t0.getLong(1) == 5L, "empty table overhead must be manifestCount * msPerScan")
    (2 to 8).foreach(i => assert(t0.getLong(i) == 0L, s"t0 col $i must be 0"))
    assert(t0.getDouble(9) == 0.0 && t0.getDouble(10) == 0.0)
    // populated tables: compaction strictly reduces file counts
    Seq("t1", "t2", "t3").foreach { tn =>
      val r = byTbl(tn)
      assert(r.getLong(5) > r.getLong(6), s"$tn: after-count must shrink")
      assert(r.getLong(13) > 0, s"$tn: partitions present")
    }
  }

  test("resample+ffill: grid aligned and bounded, fill matches latest prior event") {
    import spark.implicits._
    val P = 21600000000L
    val rows = Queries6.all("q99_resample_ffill")(spark, dir)
      .as[(Long, Long, Option[Double])].collect()
    assert(rows.nonEmpty)
    // every grid point is period-aligned, and the first point per user has a
    // fill (grid starts at ceil(min_ts), so an event always precedes it)
    rows.foreach { case (_, g, v) =>
      assert(g % P == 0, s"grid point $g not aligned")
      assert(v.isDefined, "grid starts after the first event; fill can't be null")
    }
    // the grid is dense: per user, consecutive points differ by exactly P
    rows.groupBy(_._1).values.foreach { pts =>
      pts.map(_._2).sorted.toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(b - a == P, s"gap in grid: $a -> $b")
        case _ => ()
      }
    }
    // spot-check semantics: fill == value of the latest event at/before the
    // grid point (ties on ts broken by max event_id), for one user
    val ev = graft.operators.Rel.events(dir)(spark)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)].collect()
    val u = rows.head._1
    val evU = ev.filter(_._1 == u)
    rows.filter(_._1 == u).foreach { case (_, g, v) =>
      val expected = evU.filter(_._2 <= g).maxBy(e => (e._2, e._3))._4
      assert(v.contains(expected), s"user $u grid $g: got $v want $expected")
    }
  }

  test("split assignment: deterministic, disjoint, exhaustive, ~80/10/10") {
    import spark.implicits._
    val rows = Queries6.all("q89_split_assignment")(spark, dir)
      .as[(String, String, Long, Long, Double)].collect()
    val totalDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_._3).sum == totalDocs, "every doc must land in exactly one split")
    val bySplit = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    val train = bySplit("train").toDouble / totalDocs
    assert(train > 0.7 && train < 0.9, s"train share $train far from 0.8")
    // determinism: a second run yields the identical assignment rollup
    val again = Queries6.all("q89_split_assignment")(spark, dir)
      .as[(String, String, Long, Long, Double)].collect()
    assert(rows.sortBy(r => (r._1, r._2)).toSeq == again.sortBy(r => (r._1, r._2)).toSeq)
  }
}
