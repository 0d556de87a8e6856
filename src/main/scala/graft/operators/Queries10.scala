package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-7 batch: the remaining TPC-H shapes, completing the 22-query
  * sweep (Q1-Q22 all present in the catalog), plus KMV/theta-sketch SET
  * ALGEBRA (q164) closing the sketch family over set operations. The
  * corpus here omits
  * partsupp, l_commitdate/l_receiptdate and the comment columns, so the
  * partsupp-based queries (Q11/Q16/Q17/Q20) are re-based on the
  * (l_partkey, l_suppkey) supply relation implied by lineitem, and
  * Q21's lateness predicate uses l_shipdate - o_orderdate; every query
  * keeps its canonical SHAPE (the join/agg discipline the original
  * exercises), which is what matters for plan-hygiene grading.
  *
  * Oracle-parity conventions as in [[Queries]]: identical aliases both
  * sides, CAST integer sums to BIGINT, money in exact floor-cents x
  * floor-percent ten-thousandths with ONE final division, full ORDER BY
  * tie-breaks.
  */
object Queries10 {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    Rel.t(dir, name)

  /** 1996-01-01 / 1996-04-01 / 1997-01-01 as epoch micros (UTC). */
  private val Y96 = 820454400000000L
  private val Q96_2 = 828316800000000L
  private val Y97 = 852076800000000L

  /** q163: a line is late when it ships more than 60 days after the
    * order date (stand-in for receipt > commit, which this corpus
    * lacks). */
  private val LateMicros = 60L * 86400L * 1000000L

  /** Exact rev4 = floor-cents x floor-percent: ten-thousandths of a
    * dollar as a BIGINT — the shared money discipline. */
  private def rev4 = floor(col("l_extendedprice") * 100).cast("long") *
    (lit(100L) - floor(col("l_discount") * 100).cast("long"))

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- TPC-H Q6 (forecast revenue change): the pure scan-aggregate —
    // no join at all; the whole query is a pushed filter + one partial
    // aggregate, the cheapest possible shape at any scale (the scan
    // reads three columns, the exchange carries ONE row per partition).
    // Here "revenue" is extendedprice*discount (the discount amount),
    // exact as cents x pct with one division at the end. The discount
    // band compares FLOORED integer percent on both engines — a raw
    // BETWEEN 0.05 AND 0.07 on the stored double would be an FP-boundary
    // coin flip.
    "q155_forecast_revenue" -> { (s, dir) => implicit val sp = s
      t(dir, "lineitem")
        .withColumn("ship_us", unix_micros(col("l_shipdate").cast("timestamp")))
        .filter(col("ship_us") >= Y96 && col("ship_us") < Y97)
        .filter(floor(col("l_discount") * 100).cast("long").between(5L, 7L)
          && col("l_quantity") < 24)
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long")
          * floor(col("l_discount") * 100).cast("long")).as("rev4"))
        .select(col("rev4"),
          (col("rev4").cast("double") / 10000).as("revenue"))
    },

    // ---- TPC-H Q9 (product-type profit): profit per supplier nation and
    // ship year over the parts whose name matches. part (name-filtered)
    // and supplier/nation are BROADCAST; with the year taken from
    // l_shipdate the fact table joins NO other fact — the only shuffle
    // is the final (nation, year) aggregate, which is
    // vocabulary-bounded. Profit = revenue - retail cost of the shipped
    // quantity, exact in ten-thousandths (cents x 100 aligns the scale).
    "q156_product_profit" -> { (s, dir) => implicit val sp = s
      val widget = t(dir, "part").filter(col("p_name").like("%widget%"))
        .select(col("p_partkey"),
          floor(col("p_retailprice") * 100).cast("long").as("retail_cents"))
      val sup = t(dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      t(dir, "lineitem")
        .join(broadcast(widget), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(rev4 - col("retail_cents") * 100L
          * col("l_quantity").cast("long")).as("profit4"))
        .select(col("n_name"), col("l_year"), col("profit4"),
          (col("profit4").cast("double") / 10000).as("profit"))
        .orderBy(col("n_name"), desc("l_year"))
    },

    // ---- TPC-H Q11 (important stock): (nation, part) positions whose
    // value exceeds a fixed fraction of the national total. The partsupp
    // value relation is re-based on shipped revenue. Shape: one fact
    // aggregate keyed (nationkey, partkey), then the Q18 discipline —
    // the 25-row national totals aggregate BROADCASTS back instead of a
    // window over the big aggregate (a window partitioned by nation
    // would re-sort nations x parts rows for 25 scalars). The share
    // threshold v4*300 > t4 (share > 1/300) is an exact integer
    // cross-multiplication — no division anywhere.
    "q157_important_parts" -> { (s, dir) => implicit val sp = s
      val sup = t(dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val v = t(dir, "lineitem")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey"), col("l_partkey"))
        .agg(sum(rev4).as("v4"))
      val tot = v.groupBy(col("s_nationkey").as("t_nationkey"))
        .agg(sum(col("v4")).as("t4"))
      v.join(broadcast(tot), col("s_nationkey") === col("t_nationkey"))
        .filter(col("v4") * 300L > col("t4"))
        .join(broadcast(t(dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("l_partkey").as("p_partkey"), col("v4"))
        .orderBy(col("n_name"), desc("v4"), col("p_partkey"))
    },

    // ---- TPC-H Q13 (customer order-count distribution): how many
    // customers placed 0, 1, 2, ... qualifying orders. Orders pre-
    // aggregate to per-customer counts BEFORE meeting customer (the
    // fact never joins row-level), then a LEFT join keeps the
    // zero-order customers the original's left outer join exists for;
    // the second aggregate is bounded by the distinct count values.
    // The priority filter stands in for the original's comment
    // NOT-LIKE.
    "q158_order_count_distribution" -> { (s, dir) => implicit val sp = s
      val perCust = t(dir, "orders")
        .filter(col("o_orderpriority") =!= "5-LOW")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      t(dir, "customer").select(col("c_custkey"))
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("n"), lit(0L)).as("c_count"))
        .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    },

    // ---- TPC-H Q15 (top supplier): supplier(s) with the maximum
    // revenue in a quarter, ties included. The revenue view is one
    // supplier-keyed aggregate; the max is the q96 discipline — a
    // 1-row aggregate BROADCAST back as an equality filter, never a
    // global window (PlanScan forbids the empty-partition window this
    // query classically tempts). Exact integer revenue makes the
    // equality well-defined across engines.
    "q159_top_supplier" -> { (s, dir) => implicit val sp = s
      val r = t(dir, "lineitem")
        .withColumn("ship_us", unix_micros(col("l_shipdate").cast("timestamp")))
        .filter(col("ship_us") >= Y96 && col("ship_us") < Q96_2)
        .groupBy(col("l_suppkey")).agg(sum(rev4).as("total_rev4"))
      val mx = r.agg(max(col("total_rev4")).as("max_rev4"))
      r.join(broadcast(mx), col("total_rev4") === col("max_rev4"))
        .join(broadcast(t(dir, "supplier").select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev4"))
        .orderBy(col("s_suppkey"))
    },

    // ---- TPC-H Q16 (supplier-part counts): distinct suppliers able to
    // supply each qualifying (brand, type, size). The supply relation
    // is the DISTINCT (partkey, suppkey) pairs of lineitem — distinct
    // FIRST, so the join and count-distinct see one row per pair, not
    // per line. part is broadcast after its filters; the excluded
    // suppliers (negative balance, standing in for the complaints
    // NOT IN) are a BROADCAST ANTI join, the shape Q16's subquery
    // decorrelates to.
    "q160_supplier_part_counts" -> { (s, dir) => implicit val sp = s
      val pairs = t(dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val par = t(dir, "part")
        .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO"
          && col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      val badSupp = t(dir, "supplier").filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      pairs
        .join(broadcast(par), col("l_partkey") === col("p_partkey"))
        .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size").cast("long").as("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size"))
    },

    // ---- TPC-H Q17 (small-quantity-order revenue): revenue locked in
    // orders below 20% of a part's average order quantity. The
    // correlated scalar subquery decorrelates to a per-part aggregate
    // joined back on partkey — BOTH sides already brand-filtered, so
    // the join is brand-bounded; no hint, AQE picks broadcast when the
    // per-part aggregate fits. The 20%-of-average predicate
    // cross-multiplies to exact integers: 5*qty*n < sum_qty (never a
    // division, never a double).
    "q161_small_qty_revenue" -> { (s, dir) => implicit val sp = s
      val br = t(dir, "part").filter(col("p_brand") === "Brand#12")
        .select(col("p_partkey"))
      val li = t(dir, "lineitem")
        .join(broadcast(br), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
          floor(col("l_extendedprice") * 100).cast("long").as("cents"))
      val per = li.groupBy(col("l_partkey").as("a_partkey"))
        .agg(sum(col("qty")).as("sq"), count(lit(1)).as("n"))
      li.join(per, col("l_partkey") === col("a_partkey"))
        .filter(col("qty") * 5L * col("n") < col("sq"))
        .agg(sum(col("cents")).as("total_cents"))
        .select(col("total_cents"),
          (col("total_cents").cast("double") / 700).as("avg_yearly"))
    },

    // ---- TPC-H Q20 (excess stock): suppliers holding more than twice
    // their fair share of a SMALL-part's shipped volume (the corpus
    // has no ps_availqty, so "excess" is re-based on the shipped
    // quantity distribution; fair share = total/n_suppliers, and the
    // predicate ns*sq > 2*tq is the exact integer cross-multiply).
    // Shape preserved: part filter -> per-(part, supplier) quantities
    // -> per-part totals joined back -> DISTINCT qualifying suppliers
    // -> supplier dimension, a semi-join chain where every relation
    // after the first aggregate is part- or supplier-bounded.
    "q162_overstocked_suppliers" -> { (s, dir) => implicit val sp = s
      val small = t(dir, "part").filter(col("p_type") === "SMALL")
        .select(col("p_partkey"))
      val ps = t(dir, "lineitem")
        .join(broadcast(small), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("long")).as("sq"))
      val tot = ps.groupBy(col("l_partkey").as("t_partkey"))
        .agg(sum(col("sq")).as("tq"), count(lit(1)).as("ns"))
      ps.join(tot, col("l_partkey") === col("t_partkey"))
        .filter(col("ns") * col("sq") > col("tq") * 2L)
        .select(col("l_suppkey")).distinct()
        .join(broadcast(t(dir, "supplier").select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    },

    // ---- TPC-H Q21 (waiting suppliers): suppliers who were the ONLY
    // late shipper in a finished multi-supplier order. The classic
    // formulation is lineitem self-joined twice (EXISTS another
    // supplier / NOT EXISTS another late supplier); here both
    // existentials collapse into per-order aggregates over ONE
    // (order, supplier) rollup — no self-join ever materializes, and
    // the window that derives them partitions by orderkey over the
    // ALREADY-AGGREGATED pair relation (orders-bounded, two scalar
    // frames per partition). Lateness is ship > order date + 60d.
    "q163_waiting_suppliers" -> { (s, dir) => implicit val sp = s
      val pair = t(dir, "lineitem")
        .join(t(dir, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("odate_us")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(when(unix_micros(col("l_shipdate").cast("timestamp"))
          - col("odate_us") > LateMicros, 1L).otherwise(0L)).as("late"))
      val w = Window.partitionBy(col("l_orderkey"))
      pair
        .withColumn("n_supp", count(lit(1)).over(w))
        .withColumn("n_late", sum(col("late")).over(w))
        .filter(col("late") === 1L && col("n_supp") >= 2L && col("n_late") === 1L)
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("numwait"))
        .join(broadcast(t(dir, "supplier").select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
        // s_suppkey last: names are unique in this corpus, but a LIMIT
        // needs a total order on EVERY corpus or the row set is
        // engine-dependent at the boundary
        .orderBy(desc("numwait"), col("s_name"), col("s_suppkey"))
        .limit(20)
    },

    // ---- KMV / theta-sketch set algebra: distinct-count estimates for
    // A∪B, A∩B, A∖B from two mergeable min-k sketches — the set-
    // operation layer the sketch family (q90 KMV, q35/q138 HLL) was
    // missing. Cohorts: customers ordering in 1996 (A) vs 1997 (B).
    // Theta semantics: an UNSATURATED sketch is the complete set with
    // θ = 2^28; otherwise θ = its kth minimum. The shared threshold is
    // θ = min(θ_A, θ_B); every estimate is |{h < θ}| · 2^28 div θ in
    // exact integers, and the count identity n_union = n_inter +
    // n_anotb + n_bnota is emitted oracle-visible (it holds BEFORE the
    // division, so both engines must agree on it bit-for-bit). Scale:
    // each sketch is one bounded-state aggregate (k longs); the algebra
    // runs on ONE row. Jaccard lands as floor basis points (the
    // cross-engine ratio rule).
    "q164_kmv_set_algebra" -> { (s, dir) => implicit val sp = s
      val k = 64
      val minK = udaf(new graft.functions.MinKDistinct.MinK(k),
        org.apache.spark.sql.Encoders.scalaLong)
      val o = t(dir, "orders")
        .select(year(col("o_orderdate")).as("yr"),
          graft.operators.TextOps.portableHash28(
            concat(lit("set:"), col("o_custkey").cast("string"))).as("h"))
        .filter(col("yr").isin(1996, 1997))
      val sk = o.groupBy(when(col("yr") === 1996, "A").otherwise("B").as("cohort"))
        .agg(minK(col("h")).as("mins"), countDistinct(col("h")).as("exact"))
      // an ABSENT cohort is the EMPTY sketch (theta convention: complete
      // set, theta 2^28, zero counts) — exactly what the oracle's CASE
      // arms produce; a NULL array would null-propagate through the
      // algebra and hash-mismatch on any corpus with an empty year
      val emptySk = array().cast("array<bigint>")
      val one = sk.groupBy()
        .agg(
          first(when(col("cohort") === "A", col("mins")), ignoreNulls = true).as("am"),
          first(when(col("cohort") === "B", col("mins")), ignoreNulls = true).as("bm"),
          first(when(col("cohort") === "A", col("exact")), ignoreNulls = true).as("exact_a"),
          first(when(col("cohort") === "B", col("exact")), ignoreNulls = true).as("exact_b"))
        .select(coalesce(col("am"), emptySk).as("am"),
          coalesce(col("bm"), emptySk).as("bm"),
          coalesce(col("exact_a"), lit(0L)).as("exact_a"),
          coalesce(col("exact_b"), lit(0L)).as("exact_b"))
      SketchOps.kmvAlgebra(one, k)
        .select(col("exact_a"), col("exact_b"),
          col("theta"), col("n_union"), col("n_inter"), col("n_anotb"), col("n_bnota"),
          col("est_union"), col("est_inter"), col("est_anotb"), col("jaccard_bp"))
    },

    // ---- peak concurrency (interval sweep line): the classic "max
    // simultaneous active sessions" — every event opens a 1-hour active
    // interval [ts, ts+1h); the peak per type is the max of the
    // boundary-delta running sum. The running sum is the textbook
    // single-task global-window trap, so it rides [[StatOps.rangeCumsum]]
    // (range-bucketed partials + broadcast offsets — the q95/q147
    // discipline) keyed by the SAME strict total order both engines use:
    // (t_us, delta, event_id), with delta = -1 sorting before +1 so a
    // closed-open interval ending at t never overlaps one starting at t.
    // First-peak time is a struct-max argmax (max active, then min t via
    // negated micros) — no second pass, no window.
    "q165_peak_concurrency" -> { (s, dir) => implicit val sp = s
      val ttl = 3600000000L
      val ev = Rel.events(dir)
        .select(col("event_type"), col("event_id"), col("ts_us"))
      val bounds = ev
        .select(col("event_type"), col("ts_us").as("t_us"),
          lit(1L).as("delta"), col("event_id"))
        .unionByName(ev.select(col("event_type"),
          (col("ts_us") + ttl).as("t_us"), lit(-1L).as("delta"), col("event_id")))
      val cum = StatOps.rangeCumsum(bounds, Seq("event_type"),
        Seq("t_us", "delta", "event_id"), Seq(("active", col("delta"))),
        StatOps.octaveBucket16(col("t_us")))
      cum.groupBy(col("event_type"))
        .agg(max(struct(col("active"), (-col("t_us")).as("negt"))).as("m"))
        .select(col("event_type"), col("m.active").as("peak"),
          (-col("m.negt")).as("first_peak_us"))
        .orderBy(col("event_type"))
    },

    // ---- label propagation over the part co-purchase graph (community
    // detection's cheap workhorse): two synchronized majority-vote
    // rounds from 5 seed labels (partkey mod 5), run by
    // [[GraphOps.labelPropagation]] — the quadratic co-purchase edge set
    // is never materialized (subtract-self vote identity), per-order
    // label histograms are vocabulary-bounded, and the label vector
    // follows the q91 hybrid: driver-resident + broadcast per round
    // below 1M parts (no label shuffle, no lineage by construction),
    // distributed + coalesced localCheckpoint above (GraphOpsSpec pins
    // the two arms bit-equal). `pairs` is cached q91-style: each round
    // reads it twice, and a live DAG would re-derive the distinct per
    // consumer.
    "q166_label_propagation" -> { (s, dir) => implicit val sp = s
      val pairs = t(dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
        .cache()
      // seed label = pmod(pk, 5), a PURE FUNCTION of pk — so the final
      // n_changed comparison re-derives lbl0 from pk instead of joining
      // the seed relation back, and the seed needs no checkpoint (its
      // one remaining consumer is labelPropagation's round-0 snapshot)
      val seed = pairs.select(col("pk")).distinct()
        .select(col("pk"), pmod(col("pk"), lit(5L)).as("lbl"))
      val r2 = GraphOps.labelPropagation(pairs, seed, rounds = 2)
      val out = r2.withColumn("lbl0", pmod(col("pk"), lit(5L)))
        .groupBy(col("lbl"))
        .agg(count(lit(1)).as("n_parts"),
          sum(when(col("lbl") =!= col("lbl0"), 1L).otherwise(0L)).as("n_changed"))
        .orderBy(col("lbl"))
        .localCheckpoint()
      pairs.unpersist(blocking = false)
      out
    },

    // ---- partition fingerprint diff (anti-entropy / replica sync): find
    // WHICH partitions of two table copies diverge without comparing a
    // single row pair. Per (ship-month) partition each side folds every
    // row into an ORDER-INDEPENDENT fingerprint — sum of row hashes mod
    // 2^40 plus a row count (sum, not xor: xor misses even-multiplicity
    // corruption; Σ of 2^28-bounded hashes stays under 2^63 to ~3.4e10
    // rows PER PARTITION — past that, lift the Σ to DECIMAL(38,0)
    // before the mod, audit table) — so each side is ONE map-side-combined aggregate
    // of ~month-count rows, and only fingerprint-mismatched partitions
    // would ever go row-level. Replica B is derived in-query with
    // deterministic corruption: rows at hash%97==0 get their quantity
    // bumped, rows at hash%211==0 are dropped — B diverges in SOME
    // months, matches the rest bit-for-bit, and the diff must name
    // exactly the corrupted months on both engines.
    "q167_partition_fingerprint_diff" -> { (s, dir) => implicit val sp = s
      val base = t(dir, "lineitem").select(
        date_format(col("l_shipdate"), "yyyy-MM").as("pt"),
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity").cast("long").as("qty"))
        .withColumn("rh", TextOps.portableHash28(concat_ws("|",
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("qty"))))
      // BOTH sides fold in ONE pass: each base row carries its replica
      // twin inline (kept? + corrupted-qty hash), so the whole diff is
      // one scan + one map-side-combined aggregate — no second lineitem
      // scan and no fingerprint join. A month whose replica rows all
      // dropped reads as NULL (n_b = 0 → null), exactly the full-outer
      // join semantics this replaces.
      val rows = base
        .withColumn("keep_b",
          (pmod(col("rh"), lit(211L)) =!= 0L).cast("long"))
        .withColumn("rh_b", TextOps.portableHash28(concat_ws("|",
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"),
          when(pmod(col("rh"), lit(97L)) === 0L, col("qty") + 1L)
            .otherwise(col("qty")))))
      rows.groupBy(col("pt"))
        .agg(pmod(sum(col("rh")), lit(1099511627776L)).as("fp_a"),
          count(lit(1)).as("n_a"),
          pmod(sum(col("rh_b") * col("keep_b")), lit(1099511627776L))
            .as("fp_b_raw"),
          sum(col("keep_b")).as("n_b_raw"))
        .select(col("pt"), col("fp_a"), col("n_a"),
          when(col("n_b_raw") === 0L, lit(null).cast("long"))
            .otherwise(col("fp_b_raw")).as("fp_b"),
          when(col("n_b_raw") === 0L, lit(null).cast("long"))
            .otherwise(col("n_b_raw")).as("n_b"))
        .filter(!(col("fp_a") <=> col("fp_b")) || !(col("n_a") <=> col("n_b")))
        .select(col("pt"), col("fp_a"), col("fp_b"), col("n_a"), col("n_b"),
          (coalesce(col("n_a"), lit(0L)) - coalesce(col("n_b"), lit(0L))).as("row_delta"))
        .orderBy(col("pt"))
    }
  )

  def oracles: Map[String, String] = Map(
    "q155_forecast_revenue" ->
      """SELECT CAST(sum(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
        |                * CAST(FLOOR(l_discount * 100) AS BIGINT)) AS BIGINT) AS rev4,
        |  CAST(sum(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
        |           * CAST(FLOOR(l_discount * 100) AS BIGINT)) AS DOUBLE) / 10000 AS revenue
        |FROM lineitem
        |WHERE epoch_us(l_shipdate) >= 820454400000000
        |  AND epoch_us(l_shipdate) < 852076800000000
        |  AND CAST(FLOOR(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
        |  AND l_quantity < 24""".stripMargin,

    "q156_product_profit" ->
      """WITH widget AS (
        |  SELECT p_partkey, CAST(FLOOR(p_retailprice * 100) AS BIGINT) AS retail_cents
        |  FROM part WHERE p_name LIKE '%widget%')
        |SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
        |             * (100 - CAST(FLOOR(l_discount * 100) AS BIGINT))
        |           - retail_cents * 100 * CAST(l_quantity AS BIGINT)) AS BIGINT)
        |    AS profit4,
        |  CAST(sum(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
        |             * (100 - CAST(FLOOR(l_discount * 100) AS BIGINT))
        |           - retail_cents * 100 * CAST(l_quantity AS BIGINT)) AS DOUBLE)
        |    / 10000 AS profit
        |FROM lineitem
        |JOIN widget ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name, l_year
        |ORDER BY n_name, l_year DESC""".stripMargin,

    "q157_important_parts" ->
      """WITH v AS (
        |  SELECT s_nationkey, l_partkey,
        |    CAST(sum(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
        |             * (100 - CAST(FLOOR(l_discount * 100) AS BIGINT))) AS BIGINT) AS v4
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY s_nationkey, l_partkey),
        |tot AS (SELECT s_nationkey, CAST(sum(v4) AS BIGINT) AS t4
        |        FROM v GROUP BY s_nationkey)
        |SELECT n_name, l_partkey AS p_partkey, v4
        |FROM v
        |JOIN tot USING (s_nationkey)
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE v4 * 300 > t4
        |ORDER BY n_name, v4 DESC, p_partkey""".stripMargin,

    "q158_order_count_distribution" ->
      """WITH per_cust AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
        |  FROM orders WHERE o_orderpriority <> '5-LOW'
        |  GROUP BY o_custkey)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (SELECT coalesce(n, 0) AS c_count
        |      FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q159_top_supplier" ->
      """WITH r AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
        |             * (100 - CAST(FLOOR(l_discount * 100) AS BIGINT))) AS BIGINT)
        |      AS total_rev4
        |  FROM lineitem
        |  WHERE epoch_us(l_shipdate) >= 820454400000000
        |    AND epoch_us(l_shipdate) < 828316800000000
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_rev4
        |FROM r JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev4 = (SELECT max(total_rev4) FROM r)
        |ORDER BY s_suppkey""".stripMargin,

    "q160_supplier_part_counts" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM pairs
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q161_small_qty_revenue" ->
      """WITH li AS (
        |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#12'),
        |per AS (SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS sq,
        |          CAST(count(*) AS BIGINT) AS n
        |        FROM li GROUP BY l_partkey)
        |SELECT CAST(sum(cents) AS BIGINT) AS total_cents,
        |  CAST(sum(cents) AS DOUBLE) / 700 AS avg_yearly
        |FROM li JOIN per USING (l_partkey)
        |WHERE qty * 5 * n < sq""".stripMargin,

    "q162_overstocked_suppliers" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_type = 'SMALL'
        |  GROUP BY l_partkey, l_suppkey),
        |tot AS (SELECT l_partkey, CAST(sum(sq) AS BIGINT) AS tq,
        |          CAST(count(*) AS BIGINT) AS ns
        |        FROM ps GROUP BY l_partkey)
        |SELECT DISTINCT s_suppkey, s_name
        |FROM ps JOIN tot USING (l_partkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE ns * sq > tq * 2
        |ORDER BY s_suppkey""".stripMargin,

    "q163_waiting_suppliers" ->
      """WITH pair AS (
        |  SELECT l_orderkey, l_suppkey,
        |    max(CASE WHEN epoch_us(l_shipdate) - epoch_us(o_orderdate)
        |               > 5184000000000 THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY l_orderkey, l_suppkey),
        |flagged AS (
        |  SELECT l_suppkey, late,
        |    count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
        |    sum(late) OVER (PARTITION BY l_orderkey) AS n_late
        |  FROM pair)
        |SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM flagged JOIN supplier ON l_suppkey = s_suppkey
        |WHERE late = 1 AND n_supp >= 2 AND n_late = 1
        |GROUP BY s_suppkey, s_name
        |ORDER BY numwait DESC, s_name, s_suppkey
        |LIMIT 20""".stripMargin,

    "q164_kmv_set_algebra" ->
      """WITH h AS (
        |  SELECT DISTINCT
        |    CASE WHEN year(o_orderdate) = 1996 THEN 'A' ELSE 'B' END AS cohort,
        |    CAST('0x' || substring(md5('set:' || CAST(o_custkey AS VARCHAR)), 1, 7)
        |         AS BIGINT) AS h
        |  FROM orders WHERE year(o_orderdate) IN (1996, 1997)),
        |r AS (SELECT cohort, h,
        |        row_number() OVER (PARTITION BY cohort ORDER BY h) AS rn FROM h),
        |sa AS (SELECT h FROM r WHERE cohort = 'A' AND rn <= 64),
        |sb AS (SELECT h FROM r WHERE cohort = 'B' AND rn <= 64),
        |th AS (SELECT least(
        |  CASE WHEN (SELECT count(*) FROM sa) < 64 THEN 268435456
        |       ELSE (SELECT max(h) FROM sa) END,
        |  CASE WHEN (SELECT count(*) FROM sb) < 64 THEN 268435456
        |       ELSE (SELECT max(h) FROM sb) END) AS theta),
        |cnt AS (SELECT
        |  (SELECT count(*) FROM (SELECT h FROM sa INTERSECT SELECT h FROM sb) s
        |   WHERE h < (SELECT theta FROM th)) AS n_inter,
        |  (SELECT count(*) FROM (SELECT h FROM sa EXCEPT SELECT h FROM sb) s
        |   WHERE h < (SELECT theta FROM th)) AS n_anotb,
        |  (SELECT count(*) FROM (SELECT h FROM sb EXCEPT SELECT h FROM sa) s
        |   WHERE h < (SELECT theta FROM th)) AS n_bnota)
        |SELECT
        |  CAST((SELECT count(*) FROM h WHERE cohort = 'A') AS BIGINT) AS exact_a,
        |  CAST((SELECT count(*) FROM h WHERE cohort = 'B') AS BIGINT) AS exact_b,
        |  CAST(theta AS BIGINT) AS theta,
        |  CAST(n_inter + n_anotb + n_bnota AS BIGINT) AS n_union,
        |  CAST(n_inter AS BIGINT) AS n_inter,
        |  CAST(n_anotb AS BIGINT) AS n_anotb,
        |  CAST(n_bnota AS BIGINT) AS n_bnota,
        |  CAST((n_inter + n_anotb + n_bnota) * 268435456 // theta AS BIGINT) AS est_union,
        |  CAST(n_inter * 268435456 // theta AS BIGINT) AS est_inter,
        |  CAST(n_anotb * 268435456 // theta AS BIGINT) AS est_anotb,
        |  CAST(CASE WHEN n_inter + n_anotb + n_bnota = 0 THEN NULL
        |       ELSE n_inter * 10000 // (n_inter + n_anotb + n_bnota) END AS BIGINT)
        |    AS jaccard_bp
        |FROM th, cnt""".stripMargin,

    "q165_peak_concurrency" ->
      """WITH b AS (
        |  SELECT event_type, epoch_us(ts) AS t_us, 1 AS delta, event_id FROM events
        |  UNION ALL
        |  SELECT event_type, epoch_us(ts) + 3600000000 AS t_us, -1 AS delta, event_id
        |  FROM events),
        |c AS (
        |  SELECT event_type, t_us,
        |    sum(delta) OVER (PARTITION BY event_type
        |                     ORDER BY t_us, delta, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS active
        |  FROM b),
        |pk AS (SELECT event_type, CAST(max(active) AS BIGINT) AS peak
        |       FROM c GROUP BY event_type)
        |SELECT event_type, peak,
        |  CAST(min(t_us) AS BIGINT) AS first_peak_us
        |FROM c JOIN pk USING (event_type)
        |WHERE active = peak
        |GROUP BY event_type, peak
        |ORDER BY event_type""".stripMargin,

    "q166_label_propagation" ->
      """WITH pairs AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |seed AS (SELECT pk, pk % 5 AS lbl FROM (SELECT DISTINCT pk FROM pairs) u),
        |lb1 AS (SELECT ok, pairs.pk, seed.lbl FROM pairs JOIN seed USING (pk)),
        |h1 AS (SELECT ok, lbl, count(*) AS c FROM lb1 GROUP BY ok, lbl),
        |d1 AS (SELECT pk, lbl AS own, count(*) AS deg FROM lb1 GROUP BY pk, lbl),
        |t1 AS (SELECT pairs.pk, h1.lbl, CAST(sum(c) AS BIGINT) AS t
        |       FROM pairs JOIN h1 USING (ok) GROUP BY pairs.pk, h1.lbl),
        |v1 AS (SELECT t1.pk, d1.own,
        |         t1.t - CASE WHEN t1.lbl = d1.own THEN d1.deg ELSE 0 END AS votes,
        |         t1.lbl
        |       FROM t1 JOIN d1 ON t1.pk = d1.pk),
        |r1 AS (SELECT pk,
        |         coalesce(7 - max(CASE WHEN votes > 0 THEN votes * 8 + (7 - lbl) END) % 8,
        |                  min(own)) AS lbl
        |       FROM v1 GROUP BY pk),
        |lb2 AS (SELECT ok, pairs.pk, r1.lbl FROM pairs JOIN r1 USING (pk)),
        |h2 AS (SELECT ok, lbl, count(*) AS c FROM lb2 GROUP BY ok, lbl),
        |d2 AS (SELECT pk, lbl AS own, count(*) AS deg FROM lb2 GROUP BY pk, lbl),
        |t2 AS (SELECT pairs.pk, h2.lbl, CAST(sum(c) AS BIGINT) AS t
        |       FROM pairs JOIN h2 USING (ok) GROUP BY pairs.pk, h2.lbl),
        |v2 AS (SELECT t2.pk, d2.own,
        |         t2.t - CASE WHEN t2.lbl = d2.own THEN d2.deg ELSE 0 END AS votes,
        |         t2.lbl
        |       FROM t2 JOIN d2 ON t2.pk = d2.pk),
        |r2 AS (SELECT pk,
        |         coalesce(7 - max(CASE WHEN votes > 0 THEN votes * 8 + (7 - lbl) END) % 8,
        |                  min(own)) AS lbl
        |       FROM v2 GROUP BY pk)
        |SELECT r2.lbl, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(CASE WHEN r2.lbl <> seed.lbl THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_changed
        |FROM r2 JOIN seed USING (pk)
        |GROUP BY r2.lbl ORDER BY r2.lbl""".stripMargin,

    "q167_partition_fingerprint_diff" ->
      """WITH base AS (
        |  SELECT strftime(l_shipdate, '%Y-%m') AS pt,
        |    l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |    CAST(l_quantity AS BIGINT) AS qty,
        |    CAST('0x' || substring(md5(concat_ws('|', l_orderkey, l_linenumber,
        |      l_partkey, l_suppkey, CAST(l_quantity AS BIGINT))), 1, 7) AS BIGINT) AS rh
        |  FROM lineitem),
        |replica AS (
        |  SELECT pt, l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |    CASE WHEN rh % 97 = 0 THEN qty + 1 ELSE qty END AS qty
        |  FROM base WHERE rh % 211 <> 0),
        |rep AS (
        |  SELECT pt, qty,
        |    CAST('0x' || substring(md5(concat_ws('|', l_orderkey, l_linenumber,
        |      l_partkey, l_suppkey, qty)), 1, 7) AS BIGINT) AS rh
        |  FROM replica),
        |fa AS (SELECT pt, CAST(sum(rh) % 1099511627776 AS BIGINT) AS fp_a,
        |         CAST(count(*) AS BIGINT) AS n_a FROM base GROUP BY pt),
        |fb AS (SELECT pt, CAST(sum(rh) % 1099511627776 AS BIGINT) AS fp_b,
        |         CAST(count(*) AS BIGINT) AS n_b FROM rep GROUP BY pt)
        |SELECT coalesce(fa.pt, fb.pt) AS pt, fp_a, fp_b, n_a, n_b,
        |  CAST(coalesce(n_a, 0) - coalesce(n_b, 0) AS BIGINT) AS row_delta
        |FROM fa FULL OUTER JOIN fb ON fa.pt = fb.pt
        |WHERE fp_a IS DISTINCT FROM fp_b OR n_a IS DISTINCT FROM n_b
        |ORDER BY pt""".stripMargin
  )
}
