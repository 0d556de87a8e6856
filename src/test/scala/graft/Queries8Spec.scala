package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Queries8

/** Behavioral tests for the round-5 batch-4 operators — algorithm
  * invariants on top of the oracle gate's value parity: prefix-filter
  * recall vs a brute-force Jaccard join, LM probability laws, bucket
  * accounting, hard-negative rank band, struct-min argmin semantics,
  * chunking locality. */
class Queries8Spec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("set-similarity join: prefix filtering is EXACT vs brute force") {
    import spark.implicits._
    val got = Queries8.all("q105_set_similarity_join")(spark, dir)
      .select("id_a", "id_b", "inter").as[(Long, Long, Long)].collect().toSet
    // brute force: all shingle-sharing pairs, exact threshold, no prefix
    // (same 28-bit hash domain as the query)
    val sh = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), explode(graft.operators.TextOps.shingles(col("text"), 3)).as("s"))
      .select(col("doc_id"), graft.operators.TextOps.portableHash28(col("s")).as("w"))
      .distinct()
    val sz = sh.groupBy("doc_id").count()
    val brute = sh.as("a").join(sh.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("c"))
      .join(sz.select(col("doc_id").as("id_a"), col("count").as("na")), "id_a")
      .join(sz.select(col("doc_id").as("id_b"), col("count").as("nb")), "id_b")
      .filter(col("c") * 5 >= (col("na") + col("nb") - col("c")) * 4)
      .select(col("id_a"), col("id_b"), col("c")).as[(Long, Long, Long)].collect().toSet
    assert(got == brute, "prefix filtering must lose no pair above the threshold")
    assert(got.nonEmpty)
  }

  test("bigram LM: probabilities in (0,1], continuation counts positive") {
    import spark.implicits._
    val rows = Queries8.all("q106_bigram_lm")(spark, dir)
      .as[(String, String, Long, Long, Double, Long)].collect()
    assert(rows.length == 30)
    rows.foreach { case (_, _, c12, c1, p, nLeft) =>
      assert(c12 <= c1, "bigram count bounded by left-unigram count")
      assert(p > 0 && p <= 1.0)
      assert(p == c12.toDouble / c1)
      assert(nLeft >= 1)
    }
  }

  test("length buckets: doc and token totals are conserved") {
    import spark.implicits._
    val rows = Queries8.all("q107_length_buckets")(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(rows.map(_._2).sum == docs.count())
    rows.foreach { case (bucket, nDocs, total, padded, waste) =>
      assert(padded == bucket * nDocs)
      assert(total <= padded, "no doc exceeds its bucket cap")
      assert(waste >= 0 && waste < 100)
    }
    val buckets = rows.map(_._1)
    assert(buckets.sameElements(buckets.sorted))
  }

  test("hard negatives: exactly ranks 6..15 per query, cos descending") {
    import spark.implicits._
    val rows = Queries8.all("q108_hard_negatives")(spark, dir)
      .as[(Long, Long, Double, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._4).sorted.sameElements(6L to 15L))
      val cs = g.sortBy(_._4).map(_._3)
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("min-cost supplier: struct-min equals windowed argmin with tie-breaks") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val got = Queries8.all("q109_min_cost_supplier")(spark, dir)
      .select("p_partkey", "s_suppkey", "min_price").as[(Long, Long, Double)].collect().toSet
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("cents"), col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    val ref = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_partkey") <= 200)
      .withColumn("cents", floor(col("l_extendedprice") * 100).cast("long"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_partkey"), col("l_suppkey"),
        (col("cents").cast("double") / 100).as("p"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == ref, "partial-agg struct-min must equal the window argmin")
  }

  test("session paths: every path has 3 steps, counts descending") {
    import spark.implicits._
    val rows = Queries8.all("q110_session_paths")(spark, dir)
      .as[(String, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (p, n) =>
      assert(p.split(">").length == 3)
      assert(n >= 1)
    }
    val ns = rows.map(_._2)
    assert(ns.sameElements(ns.sorted(Ordering[Long].reverse)))
  }

  test("cdc chunks: kernel == relational formulation, and chunks reassemble") {
    import spark.implicits._
    // the window/explode formulation is the spec the oracle states; the
    // CdcChunks kernel must produce the identical chunk multiset
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(50).cache()
    val kernelChunks = docs.select(col("doc_id"),
        explode(graft.functions.TextHashExprs.cdcChunks(col("text"), 8, 16)).as("chunk"))
      .groupBy("doc_id", "chunk").count()
      .as[(Long, String, Long)].collect().toSet
    val cuts = docs
      .select(col("doc_id"), col("text"),
        explode(when(length(col("text")) >= 9,
          sequence(lit(2), length(col("text")) - 7))
          .otherwise(array().cast("array<int>"))).as("i"))
      .filter(graft.operators.TextOps.portableHash28(
        substring(col("text"), col("i"), lit(8))) % 16 === 0)
      .select(col("doc_id"), col("i").as("start"))
    val starts = docs.select(col("doc_id"), lit(1).as("start")).unionByName(cuts)
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("start"))
    val relChunks = starts.join(docs, Seq("doc_id"))
      .withColumn("nxt", lead(col("start"), 1).over(wd))
      .select(col("doc_id"),
        when(col("nxt").isNull, expr("substring(text, start)"))
          .otherwise(expr("substring(text, start, nxt - start)")).as("chunk"),
        col("start"))
    assert(relChunks.groupBy("doc_id", "chunk").count()
      .as[(Long, String, Long)].collect().toSet == kernelChunks,
      "CdcChunks kernel must match the relational explode+window formulation")
    val rebuilt = relChunks
      .groupBy("doc_id")
      .agg(concat_ws("", expr("transform(sort_array(collect_list(struct(start, chunk))), x -> x.chunk)")).as("joined"))
    val bad = rebuilt.join(docs, Seq("doc_id"))
      .filter(col("joined") =!= col("text")).count()
    assert(bad == 0, "chunk concatenation must reproduce the original text")
    docs.unpersist()
  }

  test("triangle count: degree orientation equals the brute-force triple join") {
    import spark.implicits._
    val row = Queries8.all("q112_triangle_count")(spark, dir)
      .as[(Long, Long, Long, Double)].collect().head
    // brute force: undirected support-2 edges both ways, canonical triples
    val op = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val half = op.as("a").join(op.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("u"), col("b.p").as("v"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2).select("u", "v")
    val sym = half.unionByName(half.select(col("v").as("u"), col("u").as("v"))).cache()
    val brute = sym.as("e1")
      .join(sym.as("e2"), col("e1.v") === col("e2.u") && col("e1.u") < col("e2.v"))
      .join(sym.as("e3"), col("e2.v") === col("e3.u") && col("e3.v") === col("e1.u")
        && col("e1.u") < col("e1.v") && col("e1.v") < col("e2.v"))
      .count()
    assert(row._3 == brute, s"oriented count ${row._3} != brute $brute")
    assert(row._4 == row._3.toDouble * 3 / row._2)
    sym.unpersist()
  }

  test("order priority: plan is a LEFT SEMI join, counts positive") {
    val df = Queries8.all("q114_order_priority")(spark, dir)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected a semi join, got:\n$plan")
    import spark.implicits._
    val rows = df.as[(String, Long)].collect()
    assert(rows.nonEmpty && rows.forall(_._2 > 0))
  }

  test("priority split: high + low equals total joined lines") {
    import spark.implicits._
    val rows = Queries8.all("q115_priority_split")(spark, dir)
      .as[(String, Long, Long)].collect()
    assert(rows.map(r => r._2 + r._3).sum > 0)
    rows.foreach { case (_, hi, lo) => assert(hi >= 0 && lo >= 0) }
  }

  test("promo share: bounded ratio of exact integers") {
    import spark.implicits._
    val (promo, total, pct) = Queries8.all("q116_promo_share")(spark, dir)
      .as[(Long, Long, Double)].collect().head
    assert(promo >= 0 && promo <= total)
    assert(pct == promo.toDouble * 100 / total)
  }

  test("rolling distinct: 7-day actives dominate daily actives") {
    import spark.implicits._
    val rows = Queries8.all("q117_rolling_distinct")(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, a7, a1) => assert(a7 >= a1 && a1 >= 0) }
    val days = rows.map(_._1)
    assert(days.sameElements(days.sorted))
  }

  test("group regression: slope matches a driver-side fit from the same sums") {
    import spark.implicits._
    val rows = Queries8.all("q118_group_regression")(spark, dir)
      .as[(String, Long, Double, Double)].collect()
    assert(rows.length == 5)
    // recompute one group's fit from raw points driver-side
    val pts = graft.operators.Rel.events(dir)(spark)
      .filter(col("event_type") === "click")
      .select(expr("(ts_us - 1704067200000000) div 3600000000").as("x"),
        floor(col("value") * 1000000).cast("long").as("y"))
      .as[(Long, Long)].collect()
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum.toDouble; val sy = pts.map(_._2).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val got = rows.find(_._1 == "click").get._3
    assert(math.abs(got - slope) < 1e-9 * math.max(1.0, math.abs(slope)))
  }

  test("last touch: every purchase attributed exactly once") {
    import spark.implicits._
    val rows = Queries8.all("q119_last_touch")(spark, dir)
      .as[(String, Long, Option[Double])].collect()
    val purchases = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_._2).sum == purchases, "attribution must partition purchases")
    rows.foreach { case (touch, n, gap) =>
      assert(n > 0)
      if (touch == "none") assert(gap.isEmpty)
      else { assert(Set("click", "view")(touch)); assert(gap.exists(g => g >= 0 && g <= 3600000000.0)) }
    }
  }

  test("skyline: local prune + anti-join equals brute force, nothing dominated") {
    import spark.implicits._
    val got = Queries8.all("q120_skyline")(spark, dir)
      .select("p_partkey").as[Long].collect().toSet
    val pts = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey"),
        floor(col("p_retailprice") * 100).cast("long").as("pc"), col("p_size"))
    val brute = pts.as("a").join(pts.as("b"),
        col("b.pc") <= col("a.pc") && col("b.p_size") >= col("a.p_size")
          && (col("b.pc") < col("a.pc") || col("b.p_size") > col("a.p_size")), "left_anti")
      .select(col("a.p_partkey")).as[Long].collect().toSet
    assert(got == brute, "two-phase skyline must equal the single anti-join")
    assert(got.nonEmpty)
  }

  test("weighted median: crossing point halves the weight") {
    import spark.implicits._
    val rows = Queries8.all("q121_weighted_median")(spark, dir)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.length == 5)
    val wt = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_orderkey").count()
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .join(wt, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"), col("count"))
      .as[(String, Long, Long)].collect()
    rows.foreach { case (prio, _, wtot, median) =>
      val grp = ord.filter(_._1 == prio)
      val mc = (median * 100).round
      val below = grp.filter(_._2 < mc).map(_._3).sum
      val atOrBelow = grp.filter(_._2 <= mc).map(_._3).sum
      assert(below * 2 < wtot, s"$prio: weight strictly below median must be < half")
      assert(atOrBelow * 2 >= wtot, s"$prio: weight at-or-below median must reach half")
    }
  }

  test("session rules: c_both symmetric, confidence consistent") {
    import spark.implicits._
    val rows = Queries8.all("q122_session_rules")(spark, dir)
      .as[(String, String, Long, Long, Long, Double, Double)].collect()
    assert(rows.length == 20, "5 types -> 20 ordered pairs")
    val byPair = rows.map(r => (r._1, r._2) -> r._3).toMap
    rows.foreach { case (lhs, rhs, cBoth, cLhs, _, conf, lift) =>
      assert(byPair((rhs, lhs)) == cBoth, "joint support must be symmetric")
      assert(conf == cBoth.toDouble / cLhs)
      assert(cBoth <= cLhs)
      assert(lift > 0)
    }
  }

  test("bpe pairs: vocabulary-weighted counts conserve corpus char-pair totals") {
    import spark.implicits._
    val rows = Queries8.all("q123_bpe_pairs")(spark, dir)
      .as[(String, String, Long)].collect()
    assert(rows.length == 20)
    val counts = rows.map(_._3)
    assert(counts.sameElements(counts.sorted(Ordering[Long].reverse)))
    // cross-check the top pair against a direct corpus-level count
    val (c1, c2, n) = rows.head
    val direct = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("bg"))
      .filter(col("bg") === (c1 + c2)).count()
    assert(direct == n, s"top pair ($c1,$c2): vocab-weighted $n != direct $direct")
  }

  test("label noise: disagreement bounded by k, fraction consistent") {
    import spark.implicits._
    val rows = Queries8.all("q124_label_noise")(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (qid, _, nd, frac) =>
      assert(qid % 37 == 0)
      assert(nd >= 0 && nd <= 5)
      assert(frac == nd.toDouble / 5)
    }
  }

  test("ohlc bars: low <= open/close <= high, no window in the plan") {
    import spark.implicits._
    val df = Queries8.all("q125_ohlc_bars")(spark, dir)
    assert(!df.queryExecution.executedPlan.toString.contains("Window"),
      "bars must be a partial-aggregable groupBy, not a window sort")
    val rows = df.as[(String, Long, Long, Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, n, o, h, l, c) =>
      assert(n > 0)
      assert(l <= o && o <= h && l <= c && c <= h)
    }
  }

  test("twap: bounded by min/max of the user's values") {
    import spark.implicits._
    val rows = Queries8.all("q126_twap")(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val bounds = graft.operators.Rel.events(dir)(spark)
      .groupBy("user_id")
      .agg(min(floor(col("value") * 1000000).cast("long")).as("lo"),
        max(floor(col("value") * 1000000).cast("long")).as("hi"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { case (uid, n, totalS, twap) =>
      assert(n > 0 && totalS > 0)
      val (lo, hi) = bounds(uid)
      assert(twap >= lo / 1e6 - 1e-6 && twap <= hi / 1e6 + 1e-6,
        s"user $uid twap $twap outside [${lo / 1e6}, ${hi / 1e6}]")
    }
  }

  test("retention planning: reclaim is monotone in aggressiveness") {
    import spark.implicits._
    val rows = Queries8.all("q127_retention_planning")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 10)
    // keeping FEWER snapshots (smaller keep_last) reclaims at least as much
    rows.sliding(2).foreach { case Array((_, nf1, ne1, b1), (_, nf2, ne2, b2)) =>
      assert(nf1 == nf2, "file universe is policy-independent")
      assert(ne1 >= ne2 && b1 >= b2, "reclaim must shrink as retention grows")
    }
    val last = rows.last
    assert(last._3 == 0 && last._4 == 0, "keeping all 10 snapshots reclaims nothing")
  }

  test("media decode plan: relational accounting matches the actual decode path") {
    import spark.implicits._
    val plan = Queries8.all("q128_media_decode_plan")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._4, r._5)).toMap
    // run the REAL partition-wise decode and aggregate its output
    val decoded = graft.multimodal.Multimodal
      .extractFeatures(graft.multimodal.Multimodal.syntheticMedia(spark, dir))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("nf"), sum(col("n_frames").cast("long")).as("fr"),
        sum(when(col("kind") === "image",
          col("width").cast("long") * col("height")).otherwise(0L)).as("px"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(plan.keySet == decoded.keySet)
    plan.foreach { case (kind, (nf, frames, pixels)) =>
      val (dnf, dfr, dpx) = decoded(kind)
      assert(nf == dnf, s"$kind file count")
      assert(frames == dfr, s"$kind frames: plan $frames vs decode $dfr")
      assert(pixels == dpx, s"$kind pixels: plan $pixels vs decode $dpx")
    }
  }

  test("abandonment: rate bounds, matches a direct NOT-EXISTS count") {
    import spark.implicits._
    val rows = Queries8.all("q129_abandonment")(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, views, ab, rate) =>
      assert(ab <= views && rate >= 0 && rate <= 1)
    }
    // cross-check total abandoned against the quadratic NOT EXISTS form
    val ev = graft.operators.Rel.events(dir)(spark)
      .select(col("user_id"), col("ts_us"), col("event_type")).cache()
    val views = ev.filter(col("event_type") === "view")
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts_us").as("pts"))
    val notAbandoned = views.join(purch,
      col("user_id") === col("pu") && col("pts") >= col("ts_us")
        && col("pts") - col("ts_us") <= 3600000000L, "left_semi").count()
    val totalViews = views.count()
    assert(rows.map(_._3).sum == totalViews - notAbandoned)
    ev.unpersist()
  }

  test("pareto: concentration point is minimal and within bounds") {
    import spark.implicits._
    val rows = Queries8.all("q130_pareto")(spark, dir)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(rows.length == 25)
    rows.foreach { case (_, nTop, nCust, pct, rev) =>
      assert(nTop >= 1 && nTop <= nCust)
      assert(pct == nTop.toDouble * 100 / nCust)
      assert(rev > 0)
    }
  }

  test("decay score: dyadic weights reproduce a driver-side decayed sum") {
    import spark.implicits._
    val rows = Queries8.all("q131_decay_score")(spark, dir)
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val ev = graft.operators.Rel.events(dir)(spark)
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"),
        floor(col("value") * 1000000).cast("long").as("vm"))
      .as[(Long, Long, Long)].collect()
    val d0 = ev.map(_._2).max
    val expect = ev.groupBy(_._1).map { case (u, es) =>
      u -> es.map { case (_, day, vm) =>
        val age = d0 - day
        if (age <= 20) vm * (1L << (20 - age).toInt) else 0L
      }.sum
    }
    rows.foreach { case (u, _, score) =>
      assert(score == expect(u).toDouble / 1048576 / 1000000, s"user $u")
    }
    // descending by the exact scaled score
    val scores = rows.map(r => expect(r._1))
    assert(scores.sameElements(scores.sorted(Ordering[Long].reverse)))
  }

  test("skew gini: bounds and degenerate-uniform sanity") {
    import spark.implicits._
    val rows = Queries8.all("q132_skew_gini")(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.length == 3)
    rows.foreach { case (_, nKeys, total, maxLoad, gini) =>
      assert(nKeys > 0 && maxLoad >= 1 && total >= nKeys)
      assert(gini >= -1e-9 && gini < 1.0, s"gini $gini out of [0,1)")
    }
  }

  test("distribution drift: chi2 non-negative, windows populated") {
    import spark.implicits._
    val rows = Queries8.all("q133_distribution_drift")(spark, dir)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.length == 5)
    rows.foreach { case (_, n1, n4, chi2) =>
      assert(n1 > 0 && n4 > 0)
      assert(chi2 >= 0)
      // chi2 is bounded by the all-in-one-bin worst case: 9·n4/10·... loose
      assert(chi2 <= 10.0 * n4, "chi2 beyond the degenerate bound")
    }
  }

  test("correlation matrix: 10 canonical pairs, r in [-1, 1]") {
    import spark.implicits._
    val rows = Queries8.all("q134_correlation_matrix")(spark, dir)
      .as[(String, String, Long, Double)].collect()
    assert(rows.length == 10, "5 types -> C(5,2) pairs")
    rows.foreach { case (a, b, n, r) =>
      assert(a < b)
      assert(n > 1)
      assert(r >= -1.0 - 1e-12 && r <= 1.0 + 1e-12, s"r=$r out of range")
    }
  }

  test("user features: shares bounded, recency non-negative, all users present") {
    import spark.implicits._
    val rows = Queries8.all("q135_user_features")(spark, dir)
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect()
    val nUsers = graft.operators.Rel.events(dir)(spark)
      .select("user_id").distinct().count()
    assert(rows.length.toLong == nUsers)
    rows.foreach { case (_, nEv, daysActive, recency, mean, pShare, eShare) =>
      assert(nEv > 0 && daysActive >= 1 && recency >= 0)
      assert(mean >= 0)
      assert(pShare >= 0 && pShare <= 1 && eShare >= 0 && eShare <= 1)
      assert(pShare + eShare <= 1 + 1e-12)
    }
  }

  test("ab test: arms partition the users, z consistent with rates") {
    import spark.implicits._
    val (nA, convA, nB, convB, rateA, rateB, z) =
      Queries8.all("q136_ab_test")(spark, dir)
        .as[(Long, Long, Long, Long, Double, Double, Double)].collect().head
    val nUsers = graft.operators.Rel.events(dir)(spark)
      .select("user_id").distinct().count()
    assert(nA + nB == nUsers)
    assert(convA <= nA && convB <= nB)
    assert(rateA == convA.toDouble / nA && rateB == convB.toDouble / nB)
    assert((rateA > rateB) == (z > 0) || z == 0.0)
    assert(!z.isNaN && !z.isInfinite)
  }

  test("reconciliation: buckets partition the orders, bounds ordered") {
    import spark.implicits._
    val rows = Queries8.all("q137_reconciliation")(spark, dir)
      .as[(String, Long, Long, Long)].collect()
    val nOrders = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(s"$dir/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"), "left_semi").count()
    assert(rows.map(_._2).sum == nOrders, "buckets must partition joined orders")
    rows.foreach { case (bucket, n, lo, hi) =>
      assert(n > 0 && lo <= hi)
      bucket match {
        case "exact" => assert(lo == 0 && hi == 0)
        case "within_1_unit" => assert(math.max(math.abs(lo), math.abs(hi)) <= 100)
        case "within_100_units" => assert(math.max(math.abs(lo), math.abs(hi)) <= 10000)
        case "systemic" => assert(math.max(math.abs(lo), math.abs(hi)) > 10000)
        case other => fail(s"unknown bucket $other")
      }
    }
  }

  test("dq audit: pass flag consistent, checked counts positive") {
    import spark.implicits._
    val rows = Queries8.all("q113_dq_audit")(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.length == 7)
    rows.foreach { case (_, checked, viol, pass, pct) =>
      assert(checked > 0)
      assert(viol >= 0 && viol <= checked)
      assert(pass == (if (viol == 0) 1L else 0L))
      assert(math.abs(pct - viol.toDouble * 100 / checked) == 0.0)
    }
  }
}
