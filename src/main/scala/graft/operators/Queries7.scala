package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 batch 3: the classic multi-way-join analytics shapes the engine
  * was still missing (TPC-H Q5 and Q10 — dim-fan broadcast joins around one
  * fact shuffle), record linkage (blocked edit-distance join — the fuzzy
  * dedup that exact/MinHash dedup can't do), a count-min sketch built
  * relationally (mergeable counter cells, point estimates with the
  * one-sided error law), and PMI-style co-occurrence scoring (the signal
  * behind phrase mining and word-vector training data).
  *
  * Oracle-parity conventions as in [[Queries]]: identical aliases both
  * sides, CAST integer sums to BIGINT, integer math where exactness
  * matters, full ORDER BY tie-breaks, round(.,2) on order-dependent
  * double sums.
  */
object Queries7 {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    Rel.t(dir, name)

  /** 1996-01-01 / 1997-01-01 / 1996-04-01 / 2000-01-01 as epoch micros (UTC). */
  private val Y96 = 820454400000000L
  private val Y97 = 852076800000000L
  private val Q96_2 = 828316800000000L
  private val Y2000 = 946684800000000L

  /** q103: count-min geometry. Width 65536 keeps expected per-cell load
    * (#distinct keys / W) below 1 at bench scale so the estimates are
    * near-exact; depth 3 gives the min three independent chances. The
    * sketch is 3*65536 counter cells regardless of data size — the whole
    * point at 100 TB: cells are a groupBy with map-side combine, merge
    * across partitions is cell-wise addition (associative), and the final
    * sketch broadcasts anywhere. */
  private val CmsW = 65536L
  private val CmsD = 3

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- TPC-H Q5 shape (local supplier volume): the canonical snowflake
    // fan — region→nation→(customer, supplier) dimensions around the
    // lineitem⋈orders fact join. Every dimension is BROADCAST (region and
    // nation are tiny; customer/supplier are key+nationkey projections), so
    // the ONLY shuffle at any scale is lineitem⋈orders on orderkey — AQE
    // splits its skew. The c_nationkey = s_nationkey constraint rides the
    // supplier broadcast probe, not a second shuffle. Revenue is an
    // order-dependent double sum → round(.,2) on both engines.
    "q100_local_supplier_volume" -> { (s, dir) => implicit val sp = s
      val asiaNations = t(dir, "nation")
        .join(t(dir, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cust = t(dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val ord = t(dir, "orders")
        .withColumn("o_date_us", unix_micros(col("o_orderdate").cast("timestamp")))
        .filter(col("o_date_us") >= Y96 && col("o_date_us") < Y97)
        .select(col("o_orderkey"), col("o_custkey"))
      val supp = t(dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val li = t(dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("rev")), 2).as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    },

    // ---- TPC-H Q10 shape (returned-item losers): which customers returned
    // the most revenue in a quarter. Same join discipline as q100: one fact
    // shuffle (lineitem⋈orders), customer and nation broadcast; the
    // returnflag filter lands in the parquet scan (PushedFilters), so at
    // 100 TB only the 'R' third of lineitem is read into the join at all.
    // Revenue in exact integer ten-thousandths (FLOOR-cents × FLOOR-percent,
    // the q88 money discipline): at sf0.01 the round(sum(double),2) pattern
    // landed one customer's sum on opposite sides of a half-cent across
    // engines — integer sums cannot.
    "q101_returned_item_losers" -> { (s, dir) => implicit val sp = s
      val ord = t(dir, "orders")
        .withColumn("o_date_us", unix_micros(col("o_orderdate").cast("timestamp")))
        .filter(col("o_date_us") >= Y96 && col("o_date_us") < Q96_2)
        .select(col("o_orderkey"), col("o_custkey"))
      val li = t(dir, "lineitem").filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          (floor(col("l_extendedprice") * 100).cast("long")
            * (lit(100L) - floor(col("l_discount") * 100).cast("long"))).as("rev4"))
      val cust = t(dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(col("rev4")).as("rev4"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"),
          (col("rev4").cast("double") / 10000).as("revenue"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20)
    },

    // ---- TPC-H Q7: bilateral trade volume between two nations by ship
    // year. Both dimension chains (supplier→nation, customer→nation)
    // filter to the two nations BEFORE joining, so the broadcast inner
    // joins drop non-qualifying fact rows immediately after the scan; the
    // only wide work is the lineitem⋈orders key join. Revenue is the
    // exact rev4 integer chain, one division at the end.
    "q139_volume_shipping" -> { (s, dir) => implicit val sp = s
      val nat = t(dir, "nation").filter(col("n_name").isin("NATION_3", "NATION_8"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = t(dir, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cus = t(dir, "customer")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      t(dir, "lineitem")
        .join(t(dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cus), col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .withColumn("rev4", floor(col("l_extendedprice") * 100).cast("long")
          * (lit(100L) - floor(col("l_discount") * 100).cast("long")))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(col("rev4")).as("rev4"))
        .select(col("supp_nation"), col("cust_nation"), col("l_year"),
          (col("rev4").cast("double") / 10000).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },

    // ---- TPC-H Q8: national market share — NATION_3 suppliers' slice of
    // EUROPE customers' LARGE-part purchases by order year. Numerator and
    // denominator are BOTH exact integer sums carried per group (a
    // conditional sum and a total), so the share is ONE division of two
    // longs — never a ratio of order-dependent double sums.
    "q140_market_share" -> { (s, dir) => implicit val sp = s
      val eurNat = t(dir, "nation")
        .join(broadcast(t(dir, "region").filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val cus = t(dir, "customer")
        .join(broadcast(eurNat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val sup = t(dir, "supplier")
        .join(broadcast(t(dir, "nation").select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val par = t(dir, "part").filter(col("p_type") === "LARGE").select(col("p_partkey"))
      t(dir, "lineitem")
        .join(broadcast(par), col("l_partkey") === col("p_partkey"))
        .join(t(dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cus), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .withColumn("rev4", floor(col("l_extendedprice") * 100).cast("long")
          * (lit(100L) - floor(col("l_discount") * 100).cast("long")))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(when(col("supp_nation") === "NATION_3", col("rev4"))
          .otherwise(0L)).as("nation_rev4"),
          sum(col("rev4")).as("total_rev4"))
        // share in FLOOR parts-per-million: round(x, 6) can land on a
        // half-way 7th decimal where Spark's HALF_UP and DuckDB disagree
        // (the q144 lesson); floor of the fixed IEEE chain cannot
        .select(col("o_year"), col("nation_rev4"), col("total_rev4"),
          floor(col("nation_rev4").cast("double") * 1000000 / col("total_rev4"))
            .as("mkt_share_ppm"))
        .orderBy(col("o_year"))
    },

    // ---- TPC-H Q19 shape: disjunctive predicate revenue — three
    // brand/size/quantity AND-branches OR'd together. The whole predicate
    // sits in ONE filter after a broadcast part join, so Catalyst pushes
    // the common p_brand IN (...) prefix into the part scan and the fact
    // scan sees a single codegen'd branch — the classic "OR-of-ANDs does
    // not mean three scans" plan.
    "q141_disjunctive_revenue" -> { (s, dir) => implicit val sp = s
      val par = t(dir, "part")
        .filter(col("p_brand").isin("Brand#11", "Brand#22", "Brand#3"))
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      t(dir, "lineitem")
        .join(broadcast(par), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#11" && col("p_size").between(1, 5)
            && col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#22" && col("p_size").between(1, 10)
            && col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15)
            && col("l_quantity").between(20, 30)))
        .withColumn("rev4", floor(col("l_extendedprice") * 100).cast("long")
          * (lit(100L) - floor(col("l_discount") * 100).cast("long")))
        .groupBy(col("p_brand"))
        .agg(sum(col("rev4")).as("rev4"), count(lit(1)).as("n_lines"))
        .select(col("p_brand"), col("n_lines"),
          (col("rev4").cast("double") / 10000).as("revenue"))
        .orderBy(col("p_brand"))
    },

    // ---- TPC-H Q22 shape: dormant high-balance customers — above-average
    // balance AND no orders since 2000-01-01, per market segment (this
    // corpus gives every customer SOME order, so classic Q22's no-orders-
    // ever anti join would be vacuous — the recency window keeps the gate
    // honest). The anti join broadcasts the DISTINCT recent customer keys
    // (far smaller than the fact); the "above average" threshold never
    // computes a double average: bal_cents · n > Σcents cross-multiplies
    // exact integers, so the boundary cannot flip between engines.
    "q142_dormant_customers" -> { (s, dir) => implicit val sp = s
      val c = t(dir, "customer").select(col("c_custkey"), col("c_mktsegment"),
        floor(col("c_acctbal") * 100).cast("long").as("bal_cents"))
      val stats = c.filter(col("bal_cents") > 0)
        .agg(sum(col("bal_cents")).as("sc"), count(lit(1)).as("nc"))
      val rich = c.crossJoin(broadcast(stats))
        .filter(col("bal_cents") * col("nc") > col("sc"))
      val recent = t(dir, "orders")
        .filter(unix_micros(col("o_orderdate").cast("timestamp")) >= Y2000)
        .select(col("o_custkey")).distinct()
      rich.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"), sum(col("bal_cents")).as("bal_cents_sum"))
        .orderBy(col("c_mktsegment"))
    },

    // ---- record linkage / fuzzy dedup: blocked edit-distance join. Exact
    // and MinHash dedup both miss single-character corruptions; the linkage
    // answer is a LEVENSHTEIN join, made tractable by blocking — candidates
    // only within the same 8-char title prefix, so the join is quadratic
    // ONLY inside a block (max block ~165 rows at sf0.1). The corpus has no
    // real typos (TESTDATA.md), so twins are SYNTHESIZED deterministically:
    // every 131st doc gets a copy at id+1000000 with the 13th character
    // dropped — an edit past the block prefix, so the pair stays findable.
    // At 100 TB this is the standard shape: one shuffle on the block key,
    // oversized blocks capped or salted, cost linear in Σ(block²).
    "q102_fuzzy_linkage" -> { (s, dir) => implicit val sp = s
      val docs = t(dir, "documents")
      val corpus = docs
        .select(col("doc_id").as("id"), substring(col("text"), 1, 24).as("title"))
        .unionByName(docs.filter(col("doc_id") % 131 === 0)
          .select((col("doc_id") + 1000000L).as("id"),
            concat(substring(col("text"), 1, 12),
              substring(col("text"), 14, 11)).as("title")))
      val blocked = corpus.withColumn("blk", substring(col("title"), 1, 8))
      blocked.as("a").join(blocked.as("b"),
          col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
        .withColumn("dist",
          levenshtein(col("a.title"), col("b.title")).cast("long"))
        .filter(col("dist") <= 2)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("dist"),
          when(col("b.id") - col("a.id") === 1000000L, 1L).otherwise(0L)
            .as("is_synth_twin"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // ---- count-min sketch, built relationally: d=3 deterministic 28-bit
    // md5 hashes mod w=65536 index a (i, bucket) counter matrix — the
    // sketch is ONE partially-aggregated groupBy (cell-wise addition is the
    // merge, so map-side combine IS the distributed sketch union). Point
    // estimates for the top-10 exact keys take min over the key's d cells
    // (CMS one-sided law: est >= exact, always); the 30 probe rows
    // broadcast against the cell relation, so estimation never shuffles
    // the sketch. The overcount column makes the collision error visible
    // and oracle-gated rather than approximate-and-untested.
    "q103_countmin_sketch" -> { (s, dir) => implicit val sp = s
      val items = t(dir, "lineitem").select(col("l_partkey").as("k"))
      def bucket(i: org.apache.spark.sql.Column, k: org.apache.spark.sql.Column) =
        TextOps.portableHash28(concat(i.cast("string"), lit(":"), k.cast("string"))) % CmsW
      // cell(i,b) = Σ counts of keys hashing there, so build the sketch from
      // the exact per-key counts (one map-side-combined groupBy over the
      // fact) instead of hashing every raw row d times: |keys|·d md5 calls,
      // not |rows|·d — associativity makes it bit-identical to the oracle's
      // raw-row formulation. (3.2s -> sub-second at sf0.1.)
      val keyCounts = items.groupBy(col("k")).agg(count(lit(1)).as("exact_cnt"))
      val cells = keyCounts
        .select(col("k"), col("exact_cnt"), explode(expr(s"sequence(0, ${CmsD - 1})")).as("i"))
        .select(col("i"), bucket(col("i"), col("k")).as("b"), col("exact_cnt"))
        .groupBy(col("i"), col("b")).agg(sum(col("exact_cnt")).as("cnt"))
      val exactTop = keyCounts.orderBy(desc("exact_cnt"), col("k")).limit(10)
      val probes = exactTop
        .select(col("k"), col("exact_cnt"),
          explode(expr(s"sequence(0, ${CmsD - 1})")).as("i"))
        .select(col("k"), col("exact_cnt"), col("i"), bucket(col("i"), col("k")).as("b"))
      cells.join(broadcast(probes), Seq("i", "b"))
        .groupBy(col("k").as("part"), col("exact_cnt"))
        .agg(min(col("cnt")).as("cms_est"))
        .select(col("part"), col("exact_cnt"), col("cms_est"),
          (col("cms_est") - col("exact_cnt")).as("overcount"))
        .orderBy(desc("exact_cnt"), col("part"))
    },

    // ---- PMI-style co-occurrence: which word pairs appear together in
    // documents more than independence predicts — the signal behind phrase
    // mining and skip-gram training pairs. Ranked by LIFT = c12*N/(c1*c2):
    // PMI = ln(lift) is monotone in it, so the ranking is identical and the
    // score stays a single exact-integer-operand division (bit-equal across
    // engines; a log would be libm-dependent). Doc-word incidence is
    // distinct'd FIRST (one shuffle), the pair expansion is a self-join on
    // doc_id — quadratic in per-doc DISTINCT vocabulary, not doc length —
    // and collapses via map-side combine to |V|² counters. Unigram counts
    // broadcast twice; N rides a 1-row broadcast.
    "q104_pmi_cooccurrence" -> { (s, dir) => implicit val sp = s
      val dw = t(dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .distinct()
      val c1 = dw.groupBy(col("w")).agg(count(lit(1)).as("cw"))
      val nd = t(dir, "documents").agg(countDistinct(col("doc_id")).as("nd"))
      val pairs = dw.as("a").join(dw.as("b"),
          col("a.doc_id") === col("b.doc_id") && col("a.w") < col("b.w"))
        .groupBy(col("a.w").as("w1"), col("b.w").as("w2"))
        .agg(count(lit(1)).as("c12"))
        .filter(col("c12") >= 5)
      pairs
        .join(broadcast(c1.withColumnRenamed("w", "w1").withColumnRenamed("cw", "cw1")), Seq("w1"))
        .join(broadcast(c1.withColumnRenamed("w", "w2").withColumnRenamed("cw", "cw2")), Seq("w2"))
        .crossJoin(broadcast(nd))
        .select(col("w1"), col("w2"), col("c12"),
          ((col("c12") * col("nd")).cast("double") / (col("cw1") * col("cw2")))
            .as("lift"))
        .orderBy(desc("lift"), col("w1"), col("w2"))
        .limit(20)
    })

  def oracles: Map[String, String] = Map(
    "q139_volume_shipping" ->
      """WITH nat AS (
        |  SELECT n_nationkey, n_name FROM nation
        |  WHERE n_name IN ('NATION_3', 'NATION_8')),
        |sup AS (SELECT s_suppkey, n_name AS supp_nation FROM supplier
        |        JOIN nat ON s_nationkey = n_nationkey),
        |cus AS (SELECT c_custkey, n_name AS cust_nation FROM customer
        |        JOIN nat ON c_nationkey = n_nationkey)
        |SELECT supp_nation, cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(FLOOR(l_discount * 100) AS BIGINT))) AS DOUBLE)
        |    / 10000 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN sup ON l_suppkey = s_suppkey
        |JOIN cus ON o_custkey = c_custkey
        |WHERE supp_nation <> cust_nation
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q140_market_share" ->
      """WITH eur AS (
        |  SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |cus AS (SELECT c_custkey FROM customer JOIN eur ON c_nationkey = n_nationkey),
        |sup AS (SELECT s_suppkey, n_name AS supp_nation FROM supplier
        |        JOIN nation ON s_nationkey = n_nationkey),
        |par AS (SELECT p_partkey FROM part WHERE p_type = 'LARGE'),
        |base AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(FLOOR(l_discount * 100) AS BIGINT)) AS rev4,
        |    supp_nation
        |  FROM lineitem
        |  JOIN par ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN cus ON o_custkey = c_custkey
        |  JOIN sup ON l_suppkey = s_suppkey)
        |SELECT o_year,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev4 ELSE 0 END) AS BIGINT)
        |    AS nation_rev4,
        |  CAST(sum(rev4) AS BIGINT) AS total_rev4,
        |  CAST(FLOOR(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev4 ELSE 0 END) AS DOUBLE)
        |    * 1000000 / CAST(sum(rev4) AS BIGINT)) AS BIGINT) AS mkt_share_ppm
        |FROM base GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q141_disjunctive_revenue" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(FLOOR(l_discount * 100) AS BIGINT))) AS DOUBLE)
        |    / 10000 AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q142_dormant_customers" ->
      """WITH c AS (
        |  SELECT c_custkey, c_mktsegment,
        |    CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer),
        |stats AS (
        |  SELECT CAST(sum(bal_cents) AS BIGINT) AS sc,
        |    CAST(count(*) AS BIGINT) AS nc
        |  FROM c WHERE bal_cents > 0),
        |rich AS (SELECT c.* FROM c, stats WHERE bal_cents * nc > sc)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
        |  CAST(sum(bal_cents) AS BIGINT) AS bal_cents_sum
        |FROM rich
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = rich.c_custkey
        |    AND epoch_us(o_orderdate) >= 946684800000000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q100_local_supplier_volume" ->
      """SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND epoch_us(o_orderdate) >= 820454400000000
        |  AND epoch_us(o_orderdate) < 852076800000000
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q101_returned_item_losers" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(sum(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(FLOOR(l_discount * 100) AS BIGINT))) AS DOUBLE)
        |    / 10000 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND epoch_us(o_orderdate) >= 820454400000000
        |  AND epoch_us(o_orderdate) < 828316800000000
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q102_fuzzy_linkage" ->
      """WITH corpus AS (
        |  SELECT doc_id AS id, substring(text, 1, 24) AS title FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS id,
        |         substring(text, 1, 12) || substring(text, 14, 11) AS title
        |  FROM documents WHERE doc_id % 131 = 0),
        |blocked AS (SELECT id, title, substring(title, 1, 8) AS blk FROM corpus)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(levenshtein(a.title, b.title) AS BIGINT) AS dist,
        |  CASE WHEN b.id - a.id = 1000000 THEN CAST(1 AS BIGINT)
        |       ELSE CAST(0 AS BIGINT) END AS is_synth_twin
        |FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.id < b.id
        |WHERE levenshtein(a.title, b.title) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    "q103_countmin_sketch" ->
      """WITH items AS (SELECT l_partkey AS k FROM lineitem),
        |hashed AS (
        |  SELECT k, i,
        |    CAST('0x' || substring(md5(i || ':' || k), 1, 7) AS BIGINT) % 65536 AS b
        |  FROM items, (SELECT unnest(range(3)) AS i)),
        |cells AS (SELECT i, b, CAST(count(*) AS BIGINT) AS cnt
        |          FROM hashed GROUP BY 1, 2),
        |exact AS (
        |  SELECT k, CAST(count(*) AS BIGINT) AS exact_cnt FROM items GROUP BY k
        |  ORDER BY exact_cnt DESC, k LIMIT 10)
        |SELECT e.k AS part, e.exact_cnt, min(c.cnt) AS cms_est,
        |  min(c.cnt) - e.exact_cnt AS overcount
        |FROM exact e, (SELECT unnest(range(3)) AS i) h
        |JOIN cells c ON c.i = h.i
        | AND c.b = CAST('0x' || substring(md5(h.i || ':' || e.k), 1, 7) AS BIGINT) % 65536
        |GROUP BY e.k, e.exact_cnt
        |ORDER BY exact_cnt DESC, part""".stripMargin,

    "q104_pmi_cooccurrence" ->
      """WITH dw AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |c1 AS (SELECT w, CAST(count(*) AS BIGINT) AS cw FROM dw GROUP BY w),
        |n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM documents),
        |pairs AS (
        |  SELECT a.w AS w1, b.w AS w2, CAST(count(*) AS BIGINT) AS c12
        |  FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.w < b.w
        |  GROUP BY 1, 2)
        |SELECT w1, w2, c12,
        |  CAST(c12 * nd AS DOUBLE) / (ca.cw * cb.cw) AS lift
        |FROM pairs, n
        |JOIN c1 ca ON ca.w = w1
        |JOIN c1 cb ON cb.w = w2
        |WHERE c12 >= 5
        |ORDER BY lift DESC, w1, w2 LIMIT 20""".stripMargin)
}
