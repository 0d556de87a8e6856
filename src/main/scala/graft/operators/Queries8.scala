package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 batches 4-5 (q105-q132): exact set-similarity join
  * (AllPairs/PPJoin prefix filtering), n-gram LM statistics, length
  * bucketing, hard-negative mining, TPC-H Q2/Q4/Q12/Q14 shapes, session
  * path mining and association rules, content-defined chunking, triangle
  * counting, data-quality audit, rolling distinct users, group-wise
  * regression, attribution and its temporal anti-join dual, skyline,
  * weighted median, BPE pair statistics, label-noise detection, OHLC/TWAP
  * time-series, retention planning, multimodal decode accounting, Pareto
  * concentration, exact exponential decay, and skew Gini diagnosis.
  *
  * Oracle-parity conventions as in [[Queries]]: identical aliases both
  * sides, integer math where exactness matters, any double produced by ONE
  * division (or a fixed IEEE expression tree) over exact integers —
  * bit-equal across engines — full ORDER BY tie-breaks, and ANSI overflow
  * bounds documented next to every multiply-inside-sum.
  */
object Queries8 {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    Rel.t(dir, name)

  /** q105: Jaccard threshold 4/5 over 3-gram shingle SETS (token sets are
    * useless on this low-entropy corpus — the small shared vocabulary puts
    * 70k of 125k doc pairs over J=0.6, where shingle sets leave ~25 true
    * near-dup pairs over 0.8). The prefix length n - ceil(4n/5) + 1 is the
    * classic AllPairs bound: two sets with J >= 4/5, both sorted by the
    * SAME global order, must share an element inside both prefixes. */
  private val JacNum = 4L
  private val JacDen = 5L

  /** 1996-01-01 / 1997-01-01 / 1996-04-01 as epoch micros (UTC) — the same
    * window constants Queries7 uses. */
  private val Y96 = 820454400000000L
  private val Y97 = 852076800000000L
  private val Q96_2 = 828316800000000L

  /** q120's typed row: exact integer price (cents) so dominance is integer
    * comparison. */
  final case class SkyPoint(p_partkey: Long, price_cents: Long, p_size: Int)

  /** Local skyline prune (pure, conservative): sorted by (price asc,
    * size desc, key), a point whose size is strictly below the running max
    * is dominated by an earlier point (earlier = price <=, maxSize > size
    * makes it strict). Ties are KEPT — equal (price, size) points dominate
    * neither way, and the exact global anti-join finishes the job. Skyline
    * is distributive: skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)),
    * which is what makes the per-partition prune safe at any scale. */
  def localSkyline(it: Iterator[SkyPoint]): Iterator[SkyPoint] = {
    val arr = it.toArray.sortBy(p => (p.price_cents, -p.p_size, p.p_partkey))
    var maxSize = Int.MinValue
    arr.iterator.filter { p =>
      if (p.p_size >= maxSize) { maxSize = p.p_size; true } else false
    }
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- exact set-similarity join via prefix filtering (AllPairs/PPJoin)
    // over 3-gram shingle sets. Candidate generation is an EQUI-join on
    // prefix shingles, where each document's prefix holds its globally
    // RAREST shingles (df asc, then shingle asc — one total order shared by
    // every doc). That inverts the usual token-join blowup: bucket sizes
    // follow the df of rare shingles, so Σ(bucket²) stays near-linear while
    // recall is provably 100% for J >= 4/5 — unlike the LSH paths (q22/q24),
    // which trade recall for speed, this is EXACT. Verification is map-side:
    // per-doc sorted shingle arrays ride the candidate pair, intersection is
    // array_intersect — no second shuffle per pair. The threshold predicate
    // is pure integer (5c >= 4(na+nb-c)); jaccard itself is one int/int
    // division. At 100 TB: the df ranking is one broadcast (shingle
    // vocabulary), candidates one shuffle on prefix shingle, verify map-only.
    // Shingles live in the 28-bit hash domain (the q24 rule: long shuffle
    // keys and long-array intersections instead of ~20-char strings — the
    // oracle hashes identically, so collisions dedupe identically), via
    // the native [[graft.functions.ShingleHashes]] kernel: one streamed-MD5
    // codegen'd pass per doc, per-doc distinct built in — no interpreted
    // transform lambdas, no distinct exchange. The candidate join carries
    // ONLY (id_a, id_b): the sorted shingle arrays are re-attached per side
    // by a doc_id equi-join afterwards (AQE broadcasts the doc-array side
    // when it fits), never shuffled through the prefix join or the pair
    // dedupe. Measured 16s -> ~1s at sf0.1.
    "q105_set_similarity_join" -> { (s, dir) => implicit val sp = s
      val dt = t(dir, "documents")
        .select(col("doc_id"),
          explode(graft.functions.TextHashExprs.shingleHashes(
            split(col("text"), " "), 3)).as("h"))
      val df = dt.groupBy(col("h")).agg(count(lit(1)).as("dfc"))
      val docToks = dt.join(broadcast(df), "h")
        .groupBy(col("doc_id"))
        .agg(expr("transform(sort_array(collect_list(struct(dfc, h))), x -> x.h)").as("toks"))
        .withColumn("n", size(col("toks")).cast("long"))
        // prefix len = n - ceil(4n/5) + 1; ceil via (4n + 4) DIV 5 (n > 0)
        .withColumn("plen", expr(s"CAST(n - (n * $JacNum + ${JacDen - 1}) DIV $JacDen + 1 AS INT)"))
        // three consumers (prefix explode + both verify-side re-attach
        // joins), each of which would re-run the shingle-hash pass and
        // the df join from the scan (column pruning defeats
        // ReuseExchange across them — the q112/q166 lineage-cut rule);
        // doc-count-sized with one array per doc, so the checkpoint is
        // cheap and the MD5 shingle pass runs ONCE (r16)
        .localCheckpoint()
      val prefix = docToks.select(col("doc_id"),
        explode(slice(col("toks"), lit(1), col("plen"))).as("h"))
      val cand = prefix.as("a").join(prefix.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .dropDuplicates("id_a", "id_b")
      cand
        .join(docToks.select(col("doc_id").as("id_a"), col("toks").as("ta"),
          col("n").as("n_a")), Seq("id_a"))
        .join(docToks.select(col("doc_id").as("id_b"), col("toks").as("tb"),
          col("n").as("n_b")), Seq("id_b"))
        .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
        .filter(col("inter") * JacDen >= (col("n_a") + col("n_b") - col("inter")) * JacNum)
        .select(col("id_a"), col("id_b"), col("inter"), col("n_a"), col("n_b"),
          (col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
            .as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // ---- bigram language-model statistics: the counts behind n-gram LM
    // training and phrase scoring. Bigrams come from per-doc token arrays
    // (positional — NOT the distinct'd incidence q104 uses), so the whole
    // extraction is map-only into one partially-aggregated groupBy.
    // p_ml = c12/c1 is the MLE conditional; n_left (distinct left contexts
    // per right word) is the Kneser-Ney continuation count — both exact
    // integers, the probability one division. Unigram/continuation tables
    // are vocabulary-sized → broadcast back onto the bigram relation.
    "q106_bigram_lm" -> { (s, dir) => implicit val sp = s
      val bg = t(dir, "documents")
        .select(split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))"))
          .as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      val c12 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val cont = c12.groupBy(col("w2")).agg(count(lit(1)).as("n_left"))
      c12.join(broadcast(c1), Seq("w1"))
        .join(broadcast(cont), Seq("w2"))
        .select(col("w1"), col("w2"), col("c12"), col("c1"),
          (col("c12").cast("double") / col("c1")).as("p_ml"), col("n_left"))
        .orderBy(desc("c12"), col("w1"), col("w2"))
        .limit(30)
    },

    // ---- sequence-length bucketing: assign each document to a padded-batch
    // length bucket and price the padding waste — the standard pre-batching
    // step for fixed-shape training. Token counts via the q15 occurrence
    // arithmetic (portable, no regex split); bucket edges a fixed CASE
    // ladder so the assignment is deterministic on both engines. Map-only
    // projection + one 6-row groupBy: nothing here shuffles more than the
    // bucket cardinality at any scale.
    "q107_length_buckets" -> { (s, dir) => implicit val sp = s
      val n = TextOps.tokenCount(col("text"))
      val bucket = when(n <= 16, 16L).when(n <= 32, 32L).when(n <= 64, 64L)
        .when(n <= 128, 128L).when(n <= 256, 256L).otherwise(512L)
      t(dir, "documents")
        .select(bucket.as("bucket"), n.as("n_tok"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"))
        .withColumn("padded_tokens", col("bucket") * col("n_docs"))
        .withColumn("waste_pct",
          (col("padded_tokens") - col("total_tokens")).cast("double") * 100
            / col("padded_tokens"))
        .orderBy(col("bucket"))
    },

    // ---- hard-negative mining for contrastive training: for each query
    // vector, the neighbors ranked 6..15 — close enough to be informative,
    // not close enough to be positives. Same broadcast-probe discipline as
    // q29 (the base never shuffles; each partition scores its vectors
    // against the broadcast queries), same float determinism argument:
    // float32→double casts are exact and the left-to-right dot matches
    // DuckDB's list_sum fold bit-for-bit.
    "q108_hard_negatives" -> { (s, dir) => implicit val sp = s
      val e = t(dir, "embeddings").select(col("vec_id"),
        expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("v"))
        .withColumn("nrm", sqrt(graft.functions.DoubleArrayDot.doubleDot(col("v"), col("v"))))
      val probes = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
      e.join(broadcast(probes), col("vec_id") =!= col("query_id"))
        .withColumn("cos", graft.functions.DoubleArrayDot.doubleDot(col("v"), col("qv"))
          / (col("nrm") * col("qn")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") >= 6 && col("rank") <= 15)
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          round(col("cos"), 4).as("cos"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    },

    // ---- TPC-H Q2 shape (min-cost supplier per part): the correlated-min
    // join, reshaped onto the lineitem fact (this corpus has no partsupp).
    // NOT a window: min(struct(cents, tie-breaks)) is a partially
    // aggregable struct-min — map-side combine reduces each partition to
    // one candidate per part before the shuffle, where a row_number window
    // would sort the whole fact. Cents are exact integers; the lexicographic
    // struct order IS the tie-break (cents, suppkey, orderkey, linenumber).
    // Dimensions broadcast; the p_partkey filter pushes into both scans.
    "q109_min_cost_supplier" -> { (s, dir) => implicit val sp = s
      val li = t(dir, "lineitem").filter(col("l_partkey") <= 200)
        .select(col("l_partkey"),
          struct(floor(col("l_extendedprice") * 100).cast("long").as("cents"),
            col("l_suppkey"), col("l_orderkey"),
            col("l_linenumber").cast("long").as("l_linenumber")).as("m"))
      li.groupBy(col("l_partkey")).agg(min(col("m")).as("m"))
        .select(col("l_partkey").as("p_partkey"), col("m.cents").as("cents"),
          col("m.l_suppkey").as("s_suppkey"))
        .join(broadcast(t(dir, "part").filter(col("p_partkey") <= 200)
          .select(col("p_partkey"), col("p_name"))), Seq("p_partkey"))
        .join(broadcast(t(dir, "supplier")
          .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))), Seq("s_suppkey"))
        .join(broadcast(t(dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
          col("n_name"), (col("cents").cast("double") / 100).as("min_price"))
        .orderBy(col("p_partkey"))
    },

    // ---- session path mining: the top 3-step event-type sequences inside
    // q10's 30-minute sessions — the navigation-pattern signal behind
    // funnel design. Session ids are the running sum of q10's new-session
    // flags (same window, bit-identical sessionization), paths come from
    // two leads over the SAME window (one sort serves flag, id, and both
    // leads — Spark collapses same-spec windows into one exchange), and the
    // count is a partially-aggregated groupBy on path strings.
    "q110_session_paths" -> { (s, dir) => implicit val sp = s
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val sess = Rel.events(dir)
        .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_us").isNull || col("ts_us") - col("prev_us") > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("sess_id", sum(col("new_sess")).over(
          Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .withColumn("s2", lead(col("sess_id"), 1).over(w))
        .withColumn("s3", lead(col("sess_id"), 2).over(w))
      sess.filter(col("s3") === col("sess_id") && col("s2") === col("sess_id"))
        .select(concat(col("event_type"), lit(">"), col("e2"), lit(">"), col("e3"))
          .as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("path"))
        .limit(25)
    },

    // ---- content-defined chunking: cut documents where the hash of the
    // local 8-gram hits a 1-in-16 pattern (rsync/LBFS-style), then find
    // chunks shared across documents — the byte-level dedup signal that
    // survives insertions/deletions, which fixed-window and whole-doc
    // hashing both miss. Cuts depend only on LOCAL content, so the same
    // text yields the same chunks wherever it appears. The explode is
    // len(text) rows wide but map-only into a groupBy on (doc, start);
    // the portable md5 formulation here is the oracle-parity path — the
    // native rolling kernel ([[graft.functions.PolyHash64]]) is the 100 TB
    // scan path for the same boundaries-from-local-content contract.
    // Chunking is the native [[graft.functions.CdcChunks]] kernel: the
    // whole doc→chunks step is ONE codegen'd expression (position scan,
    // streamed MD5 per window, chunk slicing — no position explode, no
    // shuffle before the chunk aggregate). The relational
    // explode→filter→collect→zip_with formulation it replaces is what the
    // oracle still states; the kernel is value-identical by construction.
    "q111_cdc_chunks" -> { (s, dir) => implicit val sp = s
      val chunks = t(dir, "documents")
        .select(col("doc_id"),
          explode(graft.functions.TextHashExprs.cdcChunks(col("text"), 8, 16)).as("chunk"))
      chunks
        .groupBy(TextOps.portableHash28(col("chunk")).as("chunk_hash"))
        .agg(count(lit(1)).as("n_occ"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(length(col("chunk")).cast("long")).as("chunk_len"))
        .filter(col("n_docs") > 1)
        .orderBy(desc("n_occ"), col("chunk_hash"))
        .limit(50)
    },

    // ---- triangle counting with degree orientation: the standard trick
    // that makes distributed triangle counting tractable — orient every
    // undirected co-purchase edge from its (degree, id)-smaller endpoint to
    // the larger, so each triangle is counted EXACTLY once at its minimum
    // vertex and every vertex's out-degree is O(√|E|) (high-degree hubs
    // point INTO the hub, never out — the wedge join cannot blow up on
    // skew, which is what kills the naive three-way self-join at scale).
    // Wedges pair out-edges of one source; the closing edge membership
    // check is an EQUI-join against the oriented edge list after
    // re-canonicalizing the pair by the same (degree, id) order. The
    // clustering coefficient is one integer/integer division.
    // Edges need SUPPORT >= 2 (co-purchased in at least two orders): a
    // single co-occurrence is noise, and on this corpus it's also the
    // difference between ~3.5k meaningful edges and ~1.2M noise edges at
    // sf0.1 — support filtering (a map-side-combined pair count) is what
    // keeps co-purchase graphs tractable at 100 TB before any triangle
    // work starts.
    // Pair generation is basket-collect + a map-side combination expansion
    // (collect_set per order = the distinct step and the co-location in ONE
    // exchange; the i<j expansion runs over the sorted basket array, so
    // u < v for free) — the op⋈op self-join formulation cost two more
    // 600k-row exchanges for identical pairs. The expansion is capped at
    // [[GraphOps.BasketCap]] items per basket (quadratic blowup guard —
    // see [[GraphOps.basketPairs]]); value-neutral on TPC-H where baskets
    // top out at 7 items.
    "q112_triangle_count" -> { (s, dir) => implicit val sp = s
      val baskets = t(dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      // support>=2 collapses ~1.2M candidate pairs to ~3.5k edges at
      // sf0.1 — and edges is consumed by THREE differently-pruned
      // branches (deg, the orientation join, totals), each of which
      // would re-run the basket expansion + pair count from the scan
      // (column pruning defeats ReuseExchange across them). One
      // localCheckpoint of the edge-count-sized relation (coalesced to a
      // handful of blocks, the q166 discipline) makes the expensive
      // expansion run ONCE; the q91/q166 precedent for cutting lineage
      // at a support-filtered small relation.
      val edges = GraphOps.basketPairs(baskets, "ps")
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
        .select(col("u"), col("v"))
        .coalesce(8).localCheckpoint()
      val deg = edges.select(col("u").as("x"))
        .unionAll(edges.select(col("v").as("x")))
        .groupBy(col("x")).agg(count(lit(1)).as("d"))
      val ed = edges
        .join(deg.select(col("x").as("u"), col("d").as("du")), Seq("u"))
        .join(deg.select(col("x").as("v"), col("d").as("dv")), Seq("v"))
        .withColumn("fwd",
          col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")))
      val oriented = ed.select(
        when(col("fwd"), col("u")).otherwise(col("v")).as("a"),
        when(col("fwd"), col("v")).otherwise(col("u")).as("b"),
        when(col("fwd"), col("dv")).otherwise(col("du")).as("db"))
        .coalesce(8).localCheckpoint()
      val wedges = oriented.as("e1").join(oriented.as("e2"),
          col("e1.a") === col("e2.a") && col("e1.b") < col("e2.b"))
        .select(col("e1.b").as("p1"), col("e2.b").as("p2"),
          col("e1.db").as("d1"), col("e2.db").as("d2"))
        .withColumn("cfwd",
          col("d1") < col("d2") || (col("d1") === col("d2") && col("p1") < col("p2")))
        .select(when(col("cfwd"), col("p1")).otherwise(col("p2")).as("a"),
          when(col("cfwd"), col("p2")).otherwise(col("p1")).as("b"))
      val tri = wedges.join(oriented.select(col("a"), col("b")), Seq("a", "b"))
        .agg(count(lit(1)).as("n_triangles"))
      val totals = edges.agg(count(lit(1)).as("n_edges"))
        .crossJoin(deg.agg(sum(expr("d * (d - 1) DIV 2")).as("n_wedges")))
      totals.crossJoin(tri)
        .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
          (col("n_triangles").cast("double") * 3 / col("n_wedges"))
            .as("clustering_coeff"))
    },

    // ---- data-quality audit: Deequ-style rule battery — null fractions,
    // domain ranges, key uniqueness, referential integrity — as ONE
    // union-all DAG, so a thousand-rule audit is still one job. Counting
    // rules are map-only conditional sums over a single scan per table;
    // the FK rules are anti-join shapes where the key side aggregates to
    // (key, count) BEFORE the join at scale. Each rule reports checked
    // rows, violations, and pass/fail as 0/1 — exact integers.
    "q113_dq_audit" -> { (s, dir) => implicit val sp = s
      val li = t(dir, "lineitem")
      val ord = t(dir, "orders")
      def rule(name: String, checked: org.apache.spark.sql.Column,
               viol: org.apache.spark.sql.Column)(frame: DataFrame): DataFrame =
        frame.agg(checked.as("n_checked"), viol.as("n_violations"))
          .select(lit(name).as("rule"), col("n_checked"), col("n_violations"),
            when(col("n_violations") === 0, 1L).otherwise(0L).as("pass"))
      val cnt = count(lit(1))
      val r1 = rule("li_negative_quantity", cnt,
        count(when(col("l_quantity") <= 0, 1)))(li)
      val r2 = rule("li_discount_domain", cnt,
        count(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1)))(li)
      val r3 = rule("li_null_shipdate", cnt,
        count(when(col("l_shipdate").isNull, 1)))(li)
      val r4 = rule("li_dup_order_line", cnt, (cnt - countDistinct(
        col("l_orderkey"), col("l_linenumber"))))(li)
      val r5 = rule("li_orphan_orderkey", cnt, count(when(col("o_orderkey").isNull, 1)))(
        li.select(col("l_orderkey"))
          .join(ord.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"), "left"))
      val r6 = rule("ord_orphan_custkey", cnt, count(when(col("c_custkey").isNull, 1)))(
        ord.select(col("o_custkey"))
          .join(broadcast(t(dir, "customer").select(col("c_custkey"))),
            col("o_custkey") === col("c_custkey"), "left"))
      val r7 = rule("ord_childless", cnt, count(when(col("l_orderkey").isNull, 1)))(
        ord.select(col("o_orderkey"))
          .join(li.select(col("l_orderkey")).distinct(),
            col("o_orderkey") === col("l_orderkey"), "left"))
      r1.unionByName(r2).unionByName(r3).unionByName(r4)
        .unionByName(r5).unionByName(r6).unionByName(r7)
        .withColumn("violation_pct",
          col("n_violations").cast("double") * 100 / col("n_checked"))
        .orderBy(col("rule"))
    },

    // ---- TPC-H Q4 shape (order priority checking): orders in a window
    // that had at least one problem line — the canonical EXISTS → LEFT SEMI
    // join. The semi join keeps the orders side deduplicated by
    // construction (no distinct needed, no row multiplication), the
    // returnflag filter pushes into the lineitem scan, and both sides
    // shuffle once on orderkey. (This corpus has no commit/receipt dates;
    // a returned line is the problem-line proxy.)
    "q114_order_priority" -> { (s, dir) => implicit val sp = s
      val ord = t(dir, "orders")
        .withColumn("o_date_us", unix_micros(col("o_orderdate").cast("timestamp")))
        .filter(col("o_date_us") >= Y96 && col("o_date_us") < Q96_2)
      val problem = t(dir, "lineitem").filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"))
      ord.join(problem, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },

    // ---- TPC-H Q12 shape (shipping modes / priority split): one fact
    // shuffle (lineitem⋈orders on orderkey), then conditional counts per
    // linestatus — the CASE aggregation pattern. The shipdate filter lands
    // in the parquet scan.
    "q115_priority_split" -> { (s, dir) => implicit val sp = s
      val li = t(dir, "lineitem")
        .withColumn("ship_us", unix_micros(col("l_shipdate").cast("timestamp")))
        .filter(col("ship_us") >= Y96 && col("ship_us") < Y97)
        .select(col("l_orderkey"), col("l_linestatus"))
      val ord = t(dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          count(when(col("o_orderpriority") === "1-URGENT"
            || col("o_orderpriority") === "2-HIGH", 1)).as("high_line_count"),
          count(when(col("o_orderpriority") =!= "1-URGENT"
            && col("o_orderpriority") =!= "2-HIGH", 1)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    },

    // ---- TPC-H Q14 shape (promo revenue share): the ratio of two sums
    // over the same join. Revenue in exact integer ten-thousandths (the
    // q101 money discipline) so the share is ONE division of exact
    // integers — the round(sum(double)) form is order-dependent across
    // engines precisely when the ratio matters. Part is a broadcast
    // key+type projection; the fact shuffles once.
    // Overflow bound (ANSI): rev4 <= ~1e9/row, so the GLOBAL sum holds to
    // ~9e9 rows in the window; a 100 TB year-scan lifts the sums to
    // DECIMAL(38,0) (the ratio stays one division) — unlike the per-key
    // aggregates (q101), which partition the bound.
    "q116_promo_share" -> { (s, dir) => implicit val sp = s
      val li = t(dir, "lineitem")
        .withColumn("ship_us", unix_micros(col("l_shipdate").cast("timestamp")))
        .filter(col("ship_us") >= Y96 && col("ship_us") < Y97)
        .select(col("l_partkey"),
          (floor(col("l_extendedprice") * 100).cast("long")
            * (lit(100L) - floor(col("l_discount") * 100).cast("long"))).as("rev4"))
      val part = t(dir, "part").select(col("p_partkey"), col("p_type"))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", col("rev4")).otherwise(0L)).as("promo_rev4"),
          sum(col("rev4")).as("total_rev4"))
        .select(col("promo_rev4"), col("total_rev4"),
          (col("promo_rev4").cast("double") * 100 / col("total_rev4")).as("promo_share_pct"))
    },

    // ---- rolling 7-day distinct users: sliding COUNT DISTINCT does not
    // decompose into partial aggregates, so the scale shape is day-grain
    // pre-aggregation FIRST (events → distinct (day, user): one shuffle
    // that shrinks the input to |days × daily actives|), then a range join
    // against the tiny broadcast day spine, then the distinct count per
    // spine day. Never a per-event window, never collect_set over raw
    // events.
    "q117_rolling_distinct" -> { (s, dir) => implicit val sp = s
      val du = Rel.events(dir)
        .select(expr("ts_us div 86400000000").as("day"), col("user_id"))
        .distinct()
      val spine = du.select(col("day")).distinct()
      du.as("d").join(broadcast(spine.as("s")),
          col("d.day") >= col("s.day") - 6 && col("d.day") <= col("s.day"))
        .groupBy(col("s.day").as("day"))
        .agg(countDistinct(col("user_id")).as("active_7d"),
          countDistinct(when(col("d.day") === col("s.day"), col("user_id")))
            .as("active_1d"))
        .orderBy(col("day"))
    },

    // ---- group-wise linear regression (value vs hours since the corpus
    // epoch): ONLY the five classical sums (n, Σx, Σy, Σxy, Σx²) cross the
    // wire — all partially aggregable exact integers (y in micro-units,
    // x in hours), so the fit runs in one map-side-combined pass at any
    // scale. Slope/intercept assemble driver-free from the sums with a
    // FIXED double expression tree: sums are bit-identical longs on both
    // engines, and an identical IEEE op sequence on identical inputs is
    // bit-identical output, so even the rounding matches. (Σxy fits int64
    // to ~1e7 rows/group at these magnitudes — at 100 TB, shrink x's unit
    // or pre-aggregate per (group, hour) first.)
    "q118_group_regression" -> { (s, dir) => implicit val sp = s
      val t0 = 1704067200000000L // 2024-01-01T00:00:00Z
      val pts = Rel.events(dir).select(col("event_type"),
        expr(s"(ts_us - ${t0}L) div 3600000000").as("x"),
        floor(col("value") * 1000000).cast("long").as("y"))
      pts.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
        .withColumn("slope",
          (col("n").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
            / (col("n").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double")))
        .withColumn("intercept",
          (col("sy").cast("double") - col("slope") * col("sx").cast("double"))
            / col("n").cast("double"))
        .select(col("event_type"), col("n"), col("slope"), col("intercept"))
        .orderBy(col("event_type"))
    },

    // ---- last-touch attribution: every purchase credits the most recent
    // click/view of the same user within 1 hour — the q31 union+window
    // as-of shape (tag both streams, ONE window per user, carry the last
    // touch forward with last(..., ignoreNulls)), never a range join.
    // Same-timestamp ties are deterministic: touches sort before purchases
    // (kind 0 < 1), then event_id. Unattributed purchases report as
    // 'none' with a NULL average gap on both engines.
    "q119_last_touch" -> { (s, dir) => implicit val sp = s
      val tagged = Rel.events(dir)
        .withColumn("kind",
          when(col("event_type").isin("click", "view"), 0)
            .when(col("event_type") === "purchase", 1))
        .filter(col("kind").isNotNull)
        .select(col("user_id"), col("ts_us"), col("event_id"), col("kind"),
          col("event_type"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("lt_type",
          last(when(col("kind") === 0, col("event_type")), ignoreNulls = true).over(w))
        .withColumn("lt_ts",
          last(when(col("kind") === 0, col("ts_us")), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .withColumn("gap_us", col("ts_us") - col("lt_ts"))
        .withColumn("touch",
          when(col("gap_us").isNotNull && col("gap_us") <= 3600000000L, col("lt_type"))
            .otherwise(lit("none")))
        .groupBy(col("touch"))
        .agg(count(lit(1)).as("n_conversions"),
          (sum(when(col("touch") =!= "none", col("gap_us"))).cast("double")
            / count(when(col("touch") =!= "none", 1))).as("avg_gap_us"))
        .orderBy(col("touch"))
    },

    // ---- skyline (pareto front): parts where no other part is both
    // cheaper-or-equal AND bigger-or-equal (strictly better in one).
    // Skyline is DISTRIBUTIVE — skyline(A ∪ B) = skyline(skyline(A) ∪
    // skyline(B)) — so phase 1 prunes each partition locally (typed
    // mapPartitions, a sort + one linear scan, no shuffle), and only the
    // survivors meet the exact quadratic anti-join in phase 2. At 100 TB
    // the anti-join input is |local skylines|, not |parts|. Dominance is
    // exact integer comparison on cents.
    "q120_skyline" -> { (s, dir) => implicit val sp = s
      import sp.implicits._
      val pts = t(dir, "part")
        .select(col("p_partkey"),
          floor(col("p_retailprice") * 100).cast("long").as("price_cents"),
          col("p_size"))
        .as[SkyPoint]
      val reduced = pts.mapPartitions(localSkyline).toDF()
      val sky = reduced.as("a").join(reduced.as("b"),
          col("b.price_cents") <= col("a.price_cents")
            && col("b.p_size") >= col("a.p_size")
            && (col("b.price_cents") < col("a.price_cents")
              || col("b.p_size") > col("a.p_size")), "left_anti")
      sky.select(col("p_partkey"), col("price_cents"),
          col("p_size").cast("long").as("p_size"),
          (col("price_cents").cast("double") / 100).as("price"))
        .orderBy(col("p_partkey"))
    },

    // ---- weighted median: per order priority, the totalprice-median
    // weighted by each order's line count — the crossing point of the
    // cumulative weight (one window sort per priority), picked exactly:
    // first row where 2·cumweight >= total weight. All integer math until
    // the final cents→currency division.
    "q121_weighted_median" -> { (s, dir) => implicit val sp = s
      val wt = t(dir, "lineitem").groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("w"))
      val ord = t(dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .join(wt, col("o_orderkey") === col("l_orderkey"))
      val win = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("cents"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy(col("o_orderpriority"))
      ord
        .withColumn("cw", sum(col("w")).over(win))
        .withColumn("wtot", sum(col("w")).over(tot))
        .withColumn("n", count(lit(1)).over(tot))
        .filter(col("cw") * 2 >= col("wtot"))
        .groupBy(col("o_orderpriority"))
        .agg(min(col("cents")).as("median_cents"),
          min(col("wtot")).as("total_weight"), min(col("n")).as("n_orders"))
        .select(col("o_orderpriority"), col("n_orders"), col("total_weight"),
          (col("median_cents").cast("double") / 100).as("weighted_median"))
        .orderBy(col("o_orderpriority"))
    },

    // ---- association rules over sessions: which event type predicts
    // which inside one q10 session — support, confidence, lift for ordered
    // pairs (A -> B means B present given A present; direction matters for
    // confidence, so both orientations of each unordered pair appear).
    // Session-distinct incidence first (one shuffle), pair expansion
    // quadratic only in the 5-type vocabulary, type totals broadcast back.
    // Confidence and lift are single divisions of exact integers.
    "q122_session_rules" -> { (s, dir) => implicit val sp = s
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val sess = Rel.events(dir)
        .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_us").isNull || col("ts_us") - col("prev_us") > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("sess_id", sum(col("new_sess")).over(
          Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("user_id"), col("sess_id"), col("event_type"))
        .distinct()
      val n = sess.select(col("user_id"), col("sess_id")).distinct()
        .agg(count(lit(1)).as("n_sessions"))
      val c1 = sess.groupBy(col("event_type")).agg(count(lit(1)).as("c"))
      val pairs = sess.as("a").join(sess.as("b"),
          col("a.user_id") === col("b.user_id") && col("a.sess_id") === col("b.sess_id")
            && col("a.event_type") =!= col("b.event_type"))
        .groupBy(col("a.event_type").as("lhs"), col("b.event_type").as("rhs"))
        .agg(count(lit(1)).as("c_both"))
      pairs
        .join(broadcast(c1.select(col("event_type").as("lhs"), col("c").as("c_lhs"))), Seq("lhs"))
        .join(broadcast(c1.select(col("event_type").as("rhs"), col("c").as("c_rhs"))), Seq("rhs"))
        .crossJoin(broadcast(n))
        .select(col("lhs"), col("rhs"), col("c_both"), col("c_lhs"), col("c_rhs"),
          (col("c_both").cast("double") / col("c_lhs")).as("confidence"),
          ((col("c_both") * col("n_sessions")).cast("double")
            / (col("c_lhs") * col("c_rhs"))).as("lift"))
        .orderBy(col("lhs"), col("rhs"))
    },

    // ---- BPE merge statistics (the first tokenizer-training iteration):
    // frequency-weighted adjacent character-pair counts. The corpus
    // collapses to the WORD VOCABULARY first (one map-side-combined
    // groupBy — the classic BPE trick: pair counts are per-word counts ×
    // word frequency, so the char expansion runs over |vocab| rows, not
    // |corpus|), then pairs explode map-side and collapse again to the
    // character-bigram alphabet. Both shuffles are vocabulary-sized.
    "q123_bpe_pairs" -> { (s, dir) => implicit val sp = s
      val words = t(dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("wc"))
        .filter(length(col("word")) >= 2)
      words
        .select(col("wc"), explode(expr(
          "transform(sequence(1, length(word) - 1), " +
            "i -> struct(substring(word, i, 1) AS c1, substring(word, i + 1, 1) AS c2))"))
          .as("p"))
        .groupBy(col("p.c1").as("c1"), col("p.c2").as("c2"))
        .agg(sum(col("wc")).as("pair_count"))
        .orderBy(desc("pair_count"), col("c1"), col("c2"))
        .limit(20)
    },

    // ---- kNN label-noise detection: vectors whose nearest neighbors
    // mostly carry a DIFFERENT label are suspect annotations (Confident
    // Learning's cheap cousin). Same broadcast-probe discipline as
    // q17/q29 — the base never shuffles, scores are exact integer
    // quantized dots — with the label ride-along; the disagreement
    // fraction is one division of exact integers.
    "q124_label_noise" -> { (s, dir) => implicit val sp = s
      val emb = t(dir, "embeddings").select(col("vec_id"), col("label"),
        expr("transform(embedding, v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000) AS BIGINT))").as("qe"))
      val probes = emb.filter(col("vec_id") % 37 === 0)
        .select(col("vec_id").as("query_id"), col("label").as("q_label"),
          col("qe").as("qa"))
      val base = emb.select(col("vec_id").as("neighbor_id"),
        col("label").as("n_label"), col("qe").as("qb"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("dot").desc, col("neighbor_id"))
      base.join(broadcast(probes), col("neighbor_id") =!= col("query_id"))
        .withColumn("dot", graft.functions.LongArrayDot.longDot(col("qa"), col("qb")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .groupBy(col("query_id"), col("q_label"))
        .agg(count(when(col("n_label") =!= col("q_label"), 1)).as("n_disagree"))
        .select(col("query_id"), col("q_label").cast("long").as("q_label"),
          col("n_disagree"),
          (col("n_disagree").cast("double") / 5).as("disagree_frac"))
        .orderBy(desc("n_disagree"), col("query_id"))
    },

    // ---- OHLC bars (6-hour resample): open/close are argmin/argmax by
    // event time — expressed as struct-min/max over (ts, event_id, value),
    // the q109 trick, so the whole bar is ONE partially-aggregable groupBy
    // (map-side combine reduces each partition to one candidate bar per
    // key before the shuffle). A window formulation would sort every
    // event; this never sorts. Values in exact micro-units until the final
    // divisions.
    "q125_ohlc_bars" -> { (s, dir) => implicit val sp = s
      val b = Rel.events(dir).select(col("event_type"),
        expr("ts_us div 21600000000").as("bucket"),
        col("ts_us"), col("event_id"),
        floor(col("value") * 1000000).cast("long").as("vm"))
      b.groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(struct(col("ts_us"), col("event_id"), col("vm"))).as("o"),
          max(struct(col("ts_us"), col("event_id"), col("vm"))).as("c"),
          max(col("vm")).as("hi"), min(col("vm")).as("lo"))
        .select(col("event_type"), col("bucket"), col("n"),
          (col("o.vm").cast("double") / 1000000).as("open"),
          (col("hi").cast("double") / 1000000).as("high"),
          (col("lo").cast("double") / 1000000).as("low"),
          (col("c.vm").cast("double") / 1000000).as("close"))
        .orderBy(col("event_type"), col("bucket"))
    },

    // ---- time-weighted average (TWAP): each observation holds until the
    // user's next event, so the mean weights values by their holding time —
    // one lead window per user, then exact integer Σ(v·Δt)/ΣΔt. Δt in
    // SECONDS deliberately: micro-second weights overflow int64 at ~1e3
    // rows/user with these magnitudes (the q69/q72 overflow-bound
    // discipline — documented, not discovered at 100 TB).
    "q126_twap" -> { (s, dir) => implicit val sp = s
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      Rel.events(dir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          floor(col("value") * 1000000).cast("long").as("vm"))
        .withColumn("nxt", lead(col("ts_us"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .withColumn("dt_s", expr("(nxt - ts_us) div 1000000"))
        .filter(col("dt_s") > 0)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"), sum(col("dt_s")).as("total_s"),
          sum(col("vm") * col("dt_s")).as("vw"))
        .select(col("user_id"), col("n_intervals"), col("total_s"),
          (col("vw").cast("double") / 1000000 / col("total_s")).as("twap"))
        .orderBy(col("user_id"))
    },

    // ---- snapshot-retention planning (expire_snapshots dry run): the lake
    // maintenance decision next to compaction — for every keep-latest-R
    // policy, how many files become unreachable and how many bytes come
    // back. Files carry a [first, last] snapshot liveness interval (derived
    // deterministically, the q52 fixture discipline); a file is reclaimable
    // under R iff its last snapshot predates the oldest kept one. The
    // policy sweep is a 10-row broadcast cross-join over the file relation
    // with a partially-aggregated rollup — at 100 TB the files table is the
    // only big side and it streams through once. File size is an integer
    // division of exact cents (no double avg — order-dependent).
    "q127_retention_planning" -> { (s, dir) => implicit val sp = s
      val files = t(dir, "lineitem")
        .groupBy((col("l_orderkey") % 500).as("fid"))
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).as("cents"),
          count(lit(1)).as("cnt"))
        .select(col("fid"), expr("cents div cnt").as("size"))
        .withColumn("first_snap", col("fid") % 7)
        .withColumn("last_snap", least(col("first_snap") + col("fid") % 5, lit(9)))
      val policies = sp.range(1, 11).select(col("id").as("keep_last"))
      files.crossJoin(broadcast(policies))
        .withColumn("reclaimable", col("last_snap") < lit(10) - col("keep_last"))
        .groupBy(col("keep_last"))
        .agg(count(lit(1)).as("n_files"),
          count(when(col("reclaimable"), 1)).as("n_expired"),
          sum(when(col("reclaimable"), col("size")).otherwise(0L)).as("bytes_reclaimed"))
        .orderBy(col("keep_last"))
    },

    // ---- multimodal decode-plan accounting: what the partition-wise batch
    // decode ([[graft.multimodal.Multimodal.extractFeatures]]) will do,
    // computed relationally BEFORE touching any payload — files, bytes,
    // frames, pixels, and codec batches per media kind. The frame/dimension
    // arithmetic is the [[graft.multimodal.Multimodal.FakeCodec]] contract
    // expressed as columns (deterministic in the byte length), so the spec
    // can tie this oracle-gated plan to the actual mapPartitions decode
    // output row for row. At 100 TB this is the admission-control query you
    // run before committing a decode job: map-only projection, one
    // kind-level rollup, payloads projected away immediately.
    "q128_media_decode_plan" -> { (s, dir) => implicit val sp = s
      val m = t(dir, "documents").select(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n"))
      val frames = when(col("kind") === "image", 1L)
        .when(col("kind") === "video", lit(1L) + col("n") % 240)
        .otherwise(expr("n div 4"))
      val pixels = when(col("kind") === "image",
        (lit(64L) + col("n") % 512) * (lit(64L) + expr("n div 7") % 512)).otherwise(0L)
      m.select(col("kind"), col("n"), frames.as("frames"), pixels.as("pixels"))
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_files"), sum(col("n")).as("total_bytes"),
          sum(col("frames")).as("total_frames"), sum(col("pixels")).as("total_pixels"))
        .withColumn("decode_batches", expr("(n_files + 63) div 64"))
        .orderBy(col("kind"))
    },

    // ---- temporal anti-join (abandonment): views with NO purchase by the
    // same user within the next hour. The forward-looking as-of is the
    // q119 shape REVERSED — tag both streams, one window per user in
    // DESCENDING time carrying the next purchase backward — so the
    // "no event within range" predicate needs no range join and no
    // NOT EXISTS: it's a null-or-too-late check on one carried column.
    // Purchases sort before views at the same timestamp (kind asc in a
    // descending scan), so a purchase at the exact view time counts.
    "q129_abandonment" -> { (s, dir) => implicit val sp = s
      val tagged = Rel.events(dir)
        .withColumn("kind",
          when(col("event_type") === "purchase", 0).when(col("event_type") === "view", 1))
        .filter(col("kind").isNotNull)
        .select(col("user_id"), col("ts_us"), col("event_id"), col("kind"))
      val w = Window.partitionBy(col("user_id"))
        // descending time; kind ASC so a purchase at the exact view
        // timestamp is already carried when the view row is scanned
        .orderBy(col("ts_us").desc, col("kind").asc, col("event_id").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("next_purchase_us",
          last(when(col("kind") === 0, col("ts_us")), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .withColumn("abandoned",
          col("next_purchase_us").isNull
            || col("next_purchase_us") - col("ts_us") > 3600000000L)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_views"),
          count(when(col("abandoned"), 1)).as("n_abandoned"))
        .withColumn("abandon_rate",
          col("n_abandoned").cast("double") / col("n_views"))
        .orderBy(col("user_id"))
    },

    // ---- Pareto concentration (80/20): per nation, how few customers
    // carry 80% of revenue. Customer revenue is one partially-aggregated
    // groupBy; the concentration point is a cumulative-share window per
    // nation (the q121 crossing-point discipline, integer cents up to the
    // final percentage). The 80% threshold predicate is pure integer:
    // 5·cum >= 4·total.
    "q130_pareto" -> { (s, dir) => implicit val sp = s
      val rev = t(dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
        .join(broadcast(t(dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("o_custkey"), col("cents"))
      val wCum = Window.partitionBy(col("n_name"))
        .orderBy(col("cents").desc, col("o_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wTot = Window.partitionBy(col("n_name"))
      rev
        .withColumn("cum", sum(col("cents")).over(wCum))
        .withColumn("tot", sum(col("cents")).over(wTot))
        .withColumn("n_cust", count(lit(1)).over(wTot))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("n_name")).orderBy(col("cents").desc, col("o_custkey")))
          .cast("long"))
        .filter(col("cum") * 5 >= col("tot") * 4)
        .groupBy(col("n_name"))
        .agg(min(col("rnk")).as("n_top"), min(col("n_cust")).as("n_customers"),
          min(col("tot")).as("total_cents"))
        .select(col("n_name"), col("n_top"), col("n_customers"),
          (col("n_top").cast("double") * 100 / col("n_customers")).as("pct_customers"),
          (col("total_cents").cast("double") / 100).as("total_revenue"))
        .orderBy(col("n_name"))
    },

    // ---- exponential recency decay, EXACTLY: half-life-one-day weights as
    // powers of two (weight = 2^(20-age_days), zero past 20 days), so the
    // decayed score is an exact INTEGER sum — no pow(), whose libm rounding
    // differs across engines, and no order-dependent double accumulation.
    // The whole score is one partially-aggregable groupBy; the bound
    // v_micro·2^20·rows/user < 2^63 is the q126 overflow discipline.
    // Ranks users by recency-weighted activity value.
    "q131_decay_score" -> { (s, dir) => implicit val sp = s
      val maxDay = Rel.events(dir).agg(max(expr("ts_us div 86400000000")).as("d0"))
      Rel.events(dir)
        .select(col("user_id"), expr("ts_us div 86400000000").as("day"),
          floor(col("value") * 1000000).cast("long").as("vm"))
        .crossJoin(broadcast(maxDay))
        .withColumn("age", col("d0") - col("day"))
        .withColumn("w", when(col("age") <= 20,
          expr("shiftleft(CAST(1 AS BIGINT), CAST(20 - age AS INT))")).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("vm") * col("w")).as("score_scaled"))
        .select(col("user_id"), col("n_events"),
          (col("score_scaled").cast("double") / 1048576 / 1000000).as("decay_score"))
        .orderBy(desc("score_scaled"), col("user_id"))
        .limit(50)
    },

    // ---- skew diagnosis: per-part lineitem load with the top heavy keys
    // and the Gini coefficient of the load distribution — the planner-side
    // answer to "will this key skew a shuffle". Gini via the sorted
    // cumulative formula G = 2·Σ(i·x_i)/(n·Σx) - (n+1)/n: one window rank
    // over per-key counts (already thousands of times smaller than the
    // fact), exact integer Σ(i·x_i), and a fixed double expression at the
    // end. Output: one summary row per returnflag stratum.
    // Overflow bound (ANSI): Σ(i·x_i) <= n_keys · total_rows — safe to
    // ~3e9 rows per stratum at 1e9 keys; past that, rank-bucket the keys
    // (Gini over bucket totals) or lift Σ(i·x_i) to DECIMAL(38,0).
    "q132_skew_gini" -> { (s, dir) => implicit val sp = s
      val loads = t(dir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"), col("l_partkey"))
        .agg(count(lit(1)).as("x"))
      val w = Window.partitionBy(col("flag")).orderBy(col("x"), col("l_partkey"))
      loads
        .withColumn("i", row_number().over(w).cast("long"))
        .groupBy(col("flag"))
        .agg(count(lit(1)).as("n_keys"), sum(col("x")).as("total"),
          max(col("x")).as("max_load"), sum(col("i") * col("x")).as("ix"))
        .select(col("flag"), col("n_keys"), col("total"), col("max_load"),
          (col("ix").cast("double") * 2
            / (col("n_keys").cast("double") * col("total").cast("double"))
            - (col("n_keys") + 1).cast("double") / col("n_keys").cast("double"))
            .as("gini"))
        .orderBy(col("flag"))
    },

    // ---- distribution drift (data-drift monitoring): per event type, a
    // chi-square statistic of week-4 values against week-1's decile bins —
    // the check a training pipeline runs before trusting fresh data.
    // Reference bins are exact ntile(10) cutpoints on week 1 (one window
    // per type over the REFERENCE week only); week-4 rows bucket MAP-SIDE
    // against the broadcast 9-cut array (count cutpoints strictly below —
    // the scoring week is never sorted); zero-count bins stay in via a
    // generated bin spine. χ² = Σ(10·obs - n4)² / (10·n4) — integer numerator, ONE
    // division. Overflow bound (ANSI): (10·obs - n4)² <= 100·n4², safe to
    // ~3e8 rows/type; DECIMAL(38) past that.
    "q133_distribution_drift" -> { (s, dir) => implicit val sp = s
      val ev = Rel.events(dir)
        .select(col("event_type"), col("event_id"),
          expr("ts_us div 86400000000").as("day"),
          floor(col("value") * 1000000).cast("long").as("vm"))
      val d0 = ev.agg(min(col("day")).as("d0"))
      val tagged = ev.crossJoin(broadcast(d0))
        .withColumn("age", col("day") - col("d0"))
      val w1 = tagged.filter(col("age") >= 0 && col("age") <= 6)
      val w4 = tagged.filter(col("age") >= 21 && col("age") <= 27)
      val tiles = w1.withColumn("tile", ntile(10).over(
        Window.partitionBy(col("event_type")).orderBy(col("vm"), col("event_id"))))
      val cuts = tiles.filter(col("tile") <= 9)
        .groupBy(col("event_type"), col("tile")).agg(max(col("vm")).as("cut"))
        .groupBy(col("event_type"))
        .agg(sort_array(collect_list(col("cut"))).as("cs"))
      val binned = w4.join(broadcast(cuts), Seq("event_type"))
        .withColumn("bin", expr("size(filter(cs, c -> vm > c)) + 1"))
        .groupBy(col("event_type"), col("bin")).agg(count(lit(1)).as("obs"))
      val spine = w4.groupBy(col("event_type")).agg(count(lit(1)).as("n4"))
        .select(col("event_type"), col("n4"),
          explode(expr("sequence(1, 10)")).as("bin"))
      spine.join(binned, Seq("event_type", "bin"), "left")
        .withColumn("obs", coalesce(col("obs"), lit(0L)))
        .groupBy(col("event_type"))
        .agg(min(col("n4")).as("n4"),
          sum((col("obs") * 10 - col("n4")) * (col("obs") * 10 - col("n4")))
            .as("num"))
        .join(w1.groupBy(col("event_type")).agg(count(lit(1)).as("n1")),
          Seq("event_type"))
        // a fixture spanning < 4 weeks would leave n4 = 0 and make the
        // chi2 divisor an ANSI divide-by-zero; the guard is value-neutral
        // on any corpus where week 4 exists
        .filter(col("n4") > 0)
        .select(col("event_type"), col("n1"), col("n4"),
          (col("num").cast("double") / (col("n4") * 10)).as("chi2"))
        .orderBy(col("event_type"))
    },

    // ---- correlation matrix: Pearson r between the event types' daily
    // activity series. The fact collapses to the (day × type) grain first
    // (one map-side-combined shuffle — the q117 shrink-first rule), the
    // pair expansion is a self-join on day (bounded by the 5-type
    // vocabulary), and r assembles from five exact integer sums through a
    // fixed IEEE tree — sqrt is IEEE-deterministic, so r is bit-equal
    // across engines like q118's slope. Daily totals in micro-units:
    // Σxy <= (5.6e8·1e3)² · 30 days ≈ 1e25 would overflow — so daily
    // totals are REscaled to whole units (div 1e6) before the products,
    // bounding Σxy under 1e13 per pair at bench scale (document at 100 TB:
    // rescale to the grain that keeps x·y·days < 2^63).
    "q134_correlation_matrix" -> { (s, dir) => implicit val sp = s
      val daily = Rel.events(dir)
        .groupBy(expr("ts_us div 86400000000").as("day"), col("event_type"))
        .agg(sum(floor(col("value") * 1000000).cast("long")).as("sv"))
        // integer div, not a double quotient cast — a near-integer double
        // quotient could truncate differently than floor division
        .select(col("day"), col("event_type"), expr("sv div 1000000").as("v"))
      val pairs = daily.as("a").join(daily.as("b"),
          col("a.day") === col("b.day") && col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
          col("a.v").as("x"), col("b.v").as("y"))
      pairs.groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("type_a"), col("type_b"), col("n"),
          ((col("n").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
            / (sqrt(col("n").cast("double") * col("sxx").cast("double")
                - col("sx").cast("double") * col("sx").cast("double"))
              * sqrt(col("n").cast("double") * col("syy").cast("double")
                - col("sy").cast("double") * col("sy").cast("double"))))
            .as("pearson_r"))
        .orderBy(col("type_a"), col("type_b"))
    },

    // ---- bulk feature materialization: the per-user feature vector a
    // churn/recommendation model trains on, computed in ONE
    // partially-aggregated pass over the fact (conditional aggregates per
    // feature — no per-feature scans, no joins): activity counts,
    // distinct active days, recency, monetary mean, purchase share.
    // Every ratio is a single division of exact integers; recency comes
    // from a broadcast 1-row max. This is the feature-store load q97's
    // point-in-time join serves.
    "q135_user_features" -> { (s, dir) => implicit val sp = s
      val maxDay = Rel.events(dir).agg(max(expr("ts_us div 86400000000")).as("d0"))
      Rel.events(dir)
        .select(col("user_id"), expr("ts_us div 86400000000").as("day"),
          col("event_type"), floor(col("value") * 1000000).cast("long").as("vm"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("day")).as("days_active"),
          max(col("day")).as("last_day"),
          sum(col("vm")).as("sum_vm"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
          count(when(col("event_type") === "error", 1)).as("n_errors"))
        .crossJoin(broadcast(maxDay))
        .select(col("user_id"), col("n_events"), col("days_active"),
          (col("d0") - col("last_day")).as("recency_days"),
          (col("sum_vm").cast("double") / 1000000 / col("n_events")).as("mean_value"),
          (col("n_purchases").cast("double") / col("n_events")).as("purchase_share"),
          (col("n_errors").cast("double") / col("n_events")).as("error_share"))
        .orderBy(col("user_id"))
    },

    // ---- A/B test readout: users hash-split 50/50 (the q89 pure-hash
    // assignment — stable under resharding and re-runs), conversion =
    // purchase share above 1/5 (an integer predicate, and scale-invariant:
    // every user purchases SOMETHING at every sf, so "any purchase" would
    // be rate 1.0 and the z denominator 0 — ANSI throws on that divide),
    // significance via the two-proportion z-test. Counts aggregate in one
    // pass; z assembles from four exact integers through a fixed IEEE tree
    // (sqrt included), so the readout is bit-reproducible — an A/B
    // platform that flickers between runs is worse than none.
    "q136_ab_test" -> { (s, dir) => implicit val sp = s
      val users = Rel.events(dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          count(when(col("event_type") === "purchase", 1)).as("n_purch"))
        .select(col("user_id"),
          (TextOps.portableHash28(concat(lit("ab:"), col("user_id"))) % 2).as("arm"),
          when(col("n_purch") * 5 > col("n_events"), 1L).otherwise(0L).as("converted"))
      users.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("converted")).as("conv"))
        .agg(
          min(when(col("arm") === 0, col("n"))).as("n_a"),
          min(when(col("arm") === 0, col("conv"))).as("conv_a"),
          min(when(col("arm") === 1, col("n"))).as("n_b"),
          min(when(col("arm") === 1, col("conv"))).as("conv_b"))
        .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
          (col("conv_a").cast("double") / col("n_a")).as("rate_a"),
          (col("conv_b").cast("double") / col("n_b")).as("rate_b"),
          ((col("conv_a").cast("double") / col("n_a")
            - col("conv_b").cast("double") / col("n_b"))
            / sqrt(((col("conv_a") + col("conv_b")).cast("double")
                / (col("n_a") + col("n_b")))
              * (lit(1.0) - (col("conv_a") + col("conv_b")).cast("double")
                / (col("n_a") + col("n_b")))
              * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
            .as("z_score"))
    },

    // ---- ledger reconciliation: does each order header's total match the
    // sum of its lines priced gross (extprice · (1-disc) · (1+tax))?
    // The classic financial close check: one partially-aggregated line
    // rollup, one join on the key, discrepancies bucketed. The gross-cents
    // projection is a FIXED IEEE chain (mult, mult, mult, floor) so the
    // discrepancy is bit-identical across engines; buckets and counts are
    // pure integers. The diff histogram — not just a pass/fail — is what
    // lets an auditor see whether mismatch is rounding or systemic.
    "q137_reconciliation" -> { (s, dir) => implicit val sp = s
      val lines = t(dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")) * 100).cast("long")).as("line_cents"))
      val diff = t(dir, "orders")
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("long").as("hdr_cents"))
        .join(lines, col("o_orderkey") === col("l_orderkey"))
        .withColumn("diff", col("hdr_cents") - col("line_cents"))
      val bucket = when(col("diff") === 0, "exact")
        .when(abs(col("diff")) <= 100, "within_1_unit")
        .when(abs(col("diff")) <= 10000, "within_100_units")
        .otherwise("systemic")
      diff.groupBy(bucket.as("bucket"))
        .agg(count(lit(1)).as("n_orders"), min(col("diff")).as("min_diff"),
          max(col("diff")).as("max_diff"))
        .orderBy(col("bucket"))
    })

  def oracles: Map[String, String] = Map(
    "q105_set_similarity_join" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |dt AS (
        |  SELECT DISTINCT doc_id,
        |    CAST('0x' || substring(md5(t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]), 1, 7)
        |         AS BIGINT) AS w
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks)),
        |sz AS (SELECT doc_id, count(*) AS n FROM dt GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        |  FROM dt a JOIN dt b ON a.w = b.w AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT i.id_a, i.id_b, i.c AS inter, sa.n AS n_a, sb.n AS n_b,
        |  CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) AS jaccard
        |FROM inter i
        |JOIN sz sa ON sa.doc_id = i.id_a
        |JOIN sz sb ON sb.doc_id = i.id_b
        |WHERE i.c * 5 >= 4 * (sa.n + sb.n - i.c)
        |ORDER BY id_a, id_b""".stripMargin,

    "q106_bigram_lm" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        |idx AS (SELECT t, unnest(range(1, len(t))) AS i FROM toks),
        |bg AS (SELECT t[i] AS w1, t[i + 1] AS w2 FROM idx),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
        |cont AS (SELECT w2, count(*) AS n_left FROM c12 GROUP BY 1)
        |SELECT g.w1, g.w2, g.c12, c1.c1,
        |  CAST(g.c12 AS DOUBLE) / c1.c1 AS p_ml, cont.n_left
        |FROM c12 g JOIN c1 ON c1.w1 = g.w1 JOIN cont ON cont.w2 = g.w2
        |ORDER BY g.c12 DESC, g.w1, g.w2 LIMIT 30""".stripMargin,

    "q107_length_buckets" ->
      """WITH d AS (
        |  SELECT length(text) - length(replace(text, ' ', '')) + 1 AS n_tok
        |  FROM documents),
        |b AS (
        |  SELECT CASE WHEN n_tok <= 16 THEN 16 WHEN n_tok <= 32 THEN 32
        |              WHEN n_tok <= 64 THEN 64 WHEN n_tok <= 128 THEN 128
        |              WHEN n_tok <= 256 THEN 256 ELSE 512 END AS bucket, n_tok
        |  FROM d)
        |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |  CAST(bucket * count(*) AS BIGINT) AS padded_tokens,
        |  CAST(bucket * count(*) - sum(n_tok) AS DOUBLE) * 100
        |    / (bucket * count(*)) AS waste_pct
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q108_hard_negatives" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, v,
        |    sqrt(list_sum(list_apply(range(1, len(v) + 1), i -> v[i] * v[i]))) AS nrm
        |  FROM e),
        |pairs AS (
        |  SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    list_sum(list_apply(range(1, len(b.v) + 1), i -> b.v[i] * q.v[i]))
        |      / (b.nrm * q.nrm) AS cos
        |  FROM n b JOIN n q ON b.vec_id <> q.vec_id
        |  WHERE q.vec_id < 5),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY cos DESC, neighbor_id) AS rank FROM pairs)
        |SELECT query_id, neighbor_id, round(cos, 4) AS cos, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank BETWEEN 6 AND 15 ORDER BY query_id, rank""".stripMargin,

    "q109_min_cost_supplier" ->
      """WITH ranked AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY l_partkey
        |      ORDER BY CAST(FLOOR(l_extendedprice * 100) AS BIGINT),
        |               l_suppkey, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem WHERE l_partkey <= 200)
        |SELECT r.l_partkey AS p_partkey, p.p_name, s.s_suppkey, s.s_name, n.n_name,
        |  CAST(cents AS DOUBLE) / 100 AS min_price
        |FROM ranked r
        |JOIN part p ON p.p_partkey = r.l_partkey
        |JOIN supplier s ON s.s_suppkey = r.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |WHERE rn = 1 ORDER BY p_partkey""".stripMargin,

    "q110_session_paths" ->
      """WITH g AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
        |    lag(epoch_us(ts)) OVER w AS prev_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |s AS (
        |  SELECT user_id, event_id, event_type, ts_us,
        |    sum(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
        |             THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM g),
        |l AS (
        |  SELECT event_type, sess_id,
        |    lead(event_type, 1) OVER w AS e2, lead(event_type, 2) OVER w AS e3,
        |    lead(sess_id, 1) OVER w AS s2, lead(sess_id, 2) OVER w AS s3
        |  FROM s
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
        |SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*) AS n
        |FROM l WHERE s3 = sess_id AND s2 = sess_id
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 25""".stripMargin,

    "q111_cdc_chunks" ->
      """WITH docs AS (SELECT doc_id, text FROM documents),
        |pos AS (
        |  SELECT doc_id, text, unnest(range(2, length(text) - 6)) AS i
        |  FROM docs),
        |cuts AS (
        |  SELECT doc_id, i AS start FROM pos
        |  WHERE CAST('0x' || substring(md5(substring(text, i, 8)), 1, 7) AS BIGINT)
        |        % 16 = 0),
        |starts AS (
        |  SELECT doc_id, 1 AS start FROM docs
        |  UNION ALL SELECT doc_id, start FROM cuts),
        |chunks AS (
        |  SELECT s.doc_id,
        |    CASE WHEN lead(s.start) OVER w IS NULL THEN substring(d.text, s.start)
        |         ELSE substring(d.text, s.start, lead(s.start) OVER w - s.start)
        |    END AS chunk
        |  FROM starts s JOIN docs d ON d.doc_id = s.doc_id
        |  WINDOW w AS (PARTITION BY s.doc_id ORDER BY s.start))
        |SELECT
        |  CAST('0x' || substring(md5(chunk), 1, 7) AS BIGINT) AS chunk_hash,
        |  count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs,
        |  CAST(min(length(chunk)) AS BIGINT) AS chunk_len
        |FROM chunks
        |GROUP BY 1 HAVING count(DISTINCT doc_id) > 1
        |ORDER BY n_occ DESC, chunk_hash LIMIT 50""".stripMargin,

    "q112_triangle_count" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |edges AS (
        |  SELECT u, v FROM (
        |    SELECT a.p AS u, b.p AS v, count(*) AS c
        |    FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |    GROUP BY 1, 2)
        |  WHERE c >= 2),
        |deg AS (SELECT x, count(*) AS d
        |        FROM (SELECT u AS x FROM edges UNION ALL SELECT v FROM edges)
        |        GROUP BY x),
        |ed AS (SELECT u, v, du.d AS du, dv.d AS dv
        |       FROM edges JOIN deg du ON du.x = u JOIN deg dv ON dv.x = v),
        |oriented AS (
        |  SELECT CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS a,
        |         CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS b,
        |         CASE WHEN du < dv OR (du = dv AND u < v) THEN dv ELSE du END AS db
        |  FROM ed),
        |wedges AS (
        |  SELECT CASE WHEN e1.db < e2.db OR (e1.db = e2.db AND e1.b < e2.b)
        |              THEN e1.b ELSE e2.b END AS a,
        |         CASE WHEN e1.db < e2.db OR (e1.db = e2.db AND e1.b < e2.b)
        |              THEN e2.b ELSE e1.b END AS b
        |  FROM oriented e1 JOIN oriented e2 ON e1.a = e2.a AND e1.b < e2.b),
        |tri AS (SELECT count(*) AS n_triangles
        |        FROM wedges w JOIN oriented o ON o.a = w.a AND o.b = w.b),
        |tot AS (SELECT count(*) AS n_edges FROM edges),
        |wg AS (SELECT CAST(sum((d * (d - 1)) // 2) AS BIGINT) AS n_wedges FROM deg)
        |SELECT n_edges, n_wedges, n_triangles,
        |  CAST(n_triangles AS DOUBLE) * 3 / n_wedges AS clustering_coeff
        |FROM tot, wg, tri""".stripMargin,

    "q113_dq_audit" ->
      """WITH r AS (
        |  SELECT 'li_negative_quantity' AS rule, count(*) AS n_checked,
        |    count(CASE WHEN l_quantity <= 0 THEN 1 END) AS n_violations
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'li_discount_domain', count(*),
        |    count(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 END)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'li_null_shipdate', count(*),
        |    count(CASE WHEN l_shipdate IS NULL THEN 1 END)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'li_dup_order_line', count(*),
        |    count(*) - count(DISTINCT (l_orderkey, l_linenumber))
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'li_orphan_orderkey', count(*),
        |    count(CASE WHEN o.o_orderkey IS NULL THEN 1 END)
        |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  UNION ALL
        |  SELECT 'ord_orphan_custkey', count(*),
        |    count(CASE WHEN c.c_custkey IS NULL THEN 1 END)
        |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |  UNION ALL
        |  SELECT 'ord_childless', count(*),
        |    count(CASE WHEN d.l_orderkey IS NULL THEN 1 END)
        |  FROM orders o LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem) d
        |    ON o.o_orderkey = d.l_orderkey)
        |SELECT rule, n_checked, n_violations,
        |  CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS pass,
        |  CAST(n_violations AS DOUBLE) * 100 / n_checked AS violation_pct
        |FROM r ORDER BY rule""".stripMargin,

    "q114_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE epoch_us(o_orderdate) >= 820454400000000
        |  AND epoch_us(o_orderdate) < 828316800000000
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q115_priority_split" ->
      """SELECT l_linestatus,
        |  count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END)
        |    AS high_line_count,
        |  count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END)
        |    AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE epoch_us(l_shipdate) >= 820454400000000
        |  AND epoch_us(l_shipdate) < 852076800000000
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q116_promo_share" ->
      """WITH j AS (
        |  SELECT p_type,
        |    CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(FLOOR(l_discount * 100) AS BIGINT)) AS rev4
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE epoch_us(l_shipdate) >= 820454400000000
        |    AND epoch_us(l_shipdate) < 852076800000000)
        |SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev4 ELSE 0 END) AS BIGINT)
        |    AS promo_rev4,
        |  CAST(sum(rev4) AS BIGINT) AS total_rev4,
        |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev4 ELSE 0 END) AS DOUBLE) * 100
        |    / sum(rev4) AS promo_share_pct
        |FROM j""".stripMargin,

    "q117_rolling_distinct" ->
      """WITH du AS (
        |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id FROM events),
        |spine AS (SELECT DISTINCT day FROM du)
        |SELECT s.day, count(DISTINCT d.user_id) AS active_7d,
        |  count(DISTINCT CASE WHEN d.day = s.day THEN d.user_id END) AS active_1d
        |FROM du d JOIN spine s ON d.day BETWEEN s.day - 6 AND s.day
        |GROUP BY s.day ORDER BY s.day""".stripMargin,

    "q118_group_regression" ->
      """WITH pts AS (
        |  SELECT event_type,
        |    (epoch_us(ts) - 1704067200000000) // 3600000000 AS x,
        |    CAST(FLOOR(value * 1000000) AS BIGINT) AS y
        |  FROM events),
        |sums AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM pts GROUP BY event_type),
        |fit AS (
        |  SELECT event_type, n, sx, sy,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
        |  FROM sums)
        |SELECT event_type, n, slope,
        |  (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
        |    AS intercept
        |FROM fit ORDER BY event_type""".stripMargin,

    "q119_last_touch" ->
      """WITH tagged AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
        |    CASE WHEN event_type IN ('click', 'view') THEN 0
        |         WHEN event_type = 'purchase' THEN 1 END AS kind
        |  FROM events
        |  WHERE event_type IN ('click', 'view', 'purchase')),
        |carried AS (
        |  SELECT *,
        |    last_value(CASE WHEN kind = 0 THEN event_type END IGNORE NULLS) OVER w
        |      AS lt_type,
        |    last_value(CASE WHEN kind = 0 THEN ts_us END IGNORE NULLS) OVER w
        |      AS lt_ts
        |  FROM tagged
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, kind, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |conv AS (
        |  SELECT CASE WHEN ts_us - lt_ts <= 3600000000 THEN lt_type
        |              ELSE 'none' END AS touch,
        |         ts_us - lt_ts AS gap_us
        |  FROM carried WHERE kind = 1)
        |SELECT touch, count(*) AS n_conversions,
        |  CAST(sum(CASE WHEN touch <> 'none' THEN gap_us END) AS DOUBLE)
        |    / count(CASE WHEN touch <> 'none' THEN 1 END) AS avg_gap_us
        |FROM conv GROUP BY touch ORDER BY touch""".stripMargin,

    "q120_skyline" ->
      """WITH pts AS (
        |  SELECT p_partkey, CAST(FLOOR(p_retailprice * 100) AS BIGINT) AS price_cents,
        |    p_size
        |  FROM part)
        |SELECT a.p_partkey, a.price_cents, CAST(a.p_size AS BIGINT) AS p_size,
        |  CAST(a.price_cents AS DOUBLE) / 100 AS price
        |FROM pts a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts b
        |  WHERE b.price_cents <= a.price_cents AND b.p_size >= a.p_size
        |    AND (b.price_cents < a.price_cents OR b.p_size > a.p_size))
        |ORDER BY a.p_partkey""".stripMargin,

    "q121_weighted_median" ->
      """WITH wt AS (SELECT l_orderkey, count(*) AS w FROM lineitem GROUP BY 1),
        |ord AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents, w
        |  FROM orders JOIN wt ON o_orderkey = l_orderkey),
        |c AS (
        |  SELECT *,
        |    sum(w) OVER (PARTITION BY o_orderpriority ORDER BY cents, o_orderkey
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    sum(w) OVER (PARTITION BY o_orderpriority) AS wtot,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM ord)
        |SELECT o_orderpriority, CAST(min(n) AS BIGINT) AS n_orders,
        |  CAST(min(wtot) AS BIGINT) AS total_weight,
        |  CAST(min(cents) AS DOUBLE) / 100 AS weighted_median
        |FROM c WHERE cw * 2 >= wtot
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q122_session_rules" ->
      """WITH g AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
        |    lag(epoch_us(ts)) OVER w AS prev_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |s AS (
        |  SELECT user_id, event_type,
        |    sum(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
        |             THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM g),
        |inc AS (SELECT DISTINCT user_id, sess_id, event_type FROM s),
        |n AS (SELECT count(*) AS n_sessions
        |      FROM (SELECT DISTINCT user_id, sess_id FROM inc)),
        |c1 AS (SELECT event_type, count(*) AS c FROM inc GROUP BY 1),
        |pairs AS (
        |  SELECT a.event_type AS lhs, b.event_type AS rhs, count(*) AS c_both
        |  FROM inc a JOIN inc b
        |    ON a.user_id = b.user_id AND a.sess_id = b.sess_id
        |   AND a.event_type <> b.event_type
        |  GROUP BY 1, 2)
        |SELECT lhs, rhs, c_both, ca.c AS c_lhs, cb.c AS c_rhs,
        |  CAST(c_both AS DOUBLE) / ca.c AS confidence,
        |  CAST(c_both * n_sessions AS DOUBLE) / (ca.c * cb.c) AS lift
        |FROM pairs, n
        |JOIN c1 ca ON ca.event_type = lhs
        |JOIN c1 cb ON cb.event_type = rhs
        |ORDER BY lhs, rhs""".stripMargin,

    "q123_bpe_pairs" ->
      """WITH words AS (
        |  SELECT word, count(*) AS wc FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  GROUP BY word),
        |pairs AS (
        |  SELECT substring(word, i, 1) AS c1, substring(word, i + 1, 1) AS c2, wc
        |  FROM (SELECT word, wc, unnest(range(1, length(word))) AS i
        |        FROM words WHERE length(word) >= 2))
        |SELECT c1, c2, CAST(sum(wc) AS BIGINT) AS pair_count
        |FROM pairs GROUP BY c1, c2
        |ORDER BY pair_count DESC, c1, c2 LIMIT 20""".stripMargin,

    "q124_label_noise" ->
      """WITH q AS (
        |  SELECT vec_id, label, list_transform(embedding,
        |    v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000) AS BIGINT)) AS qe
        |  FROM embeddings),
        |pairs AS (
        |  SELECT a.vec_id AS query_id, a.label AS q_label, b.label AS n_label,
        |    CAST(list_sum(list_apply(range(1, len(a.qe) + 1),
        |      i -> a.qe[i] * b.qe[i])) AS BIGINT) AS dot,
        |    b.vec_id AS neighbor_id
        |  FROM q a JOIN q b ON b.vec_id <> a.vec_id
        |  WHERE a.vec_id % 37 = 0),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY dot DESC, neighbor_id) AS rank FROM pairs)
        |SELECT query_id, CAST(q_label AS BIGINT) AS q_label,
        |  count(CASE WHEN n_label <> q_label THEN 1 END) AS n_disagree,
        |  CAST(count(CASE WHEN n_label <> q_label THEN 1 END) AS DOUBLE) / 5
        |    AS disagree_frac
        |FROM ranked WHERE rank <= 5
        |GROUP BY query_id, q_label
        |ORDER BY n_disagree DESC, query_id""".stripMargin,

    "q125_ohlc_bars" ->
      """WITH b AS (
        |  SELECT event_type, epoch_us(ts) // 21600000000 AS bucket,
        |    epoch_us(ts) AS ts_us, event_id,
        |    CAST(FLOOR(value * 1000000) AS BIGINT) AS vm
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_type, bucket
        |      ORDER BY ts_us, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type, bucket
        |      ORDER BY ts_us DESC, event_id DESC) AS rn_d
        |  FROM b)
        |SELECT event_type, bucket, count(*) AS n,
        |  CAST(min(CASE WHEN rn_a = 1 THEN vm END) AS DOUBLE) / 1000000 AS open,
        |  CAST(max(vm) AS DOUBLE) / 1000000 AS high,
        |  CAST(min(vm) AS DOUBLE) / 1000000 AS low,
        |  CAST(min(CASE WHEN rn_d = 1 THEN vm END) AS DOUBLE) / 1000000 AS close
        |FROM r GROUP BY event_type, bucket
        |ORDER BY event_type, bucket""".stripMargin,

    "q126_twap" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    CAST(FLOOR(value * 1000000) AS BIGINT) AS vm,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS nxt
        |  FROM events),
        |iv AS (
        |  SELECT user_id, vm, (nxt - ts_us) // 1000000 AS dt_s
        |  FROM e WHERE nxt IS NOT NULL AND (nxt - ts_us) // 1000000 > 0)
        |SELECT user_id, count(*) AS n_intervals,
        |  CAST(sum(dt_s) AS BIGINT) AS total_s,
        |  CAST(sum(vm * dt_s) AS DOUBLE) / 1000000 / CAST(sum(dt_s) AS BIGINT)
        |    AS twap
        |FROM iv GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q127_retention_planning" ->
      """WITH files AS (
        |  SELECT l_orderkey % 500 AS fid,
        |    CAST(sum(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) // count(*)
        |         AS BIGINT) AS size
        |  FROM lineitem GROUP BY 1),
        |f2 AS (
        |  SELECT fid, size, fid % 7 AS first_snap,
        |    least(fid % 7 + fid % 5, 9) AS last_snap
        |  FROM files),
        |r AS (SELECT unnest(range(1, 11)) AS keep_last)
        |SELECT keep_last, count(*) AS n_files,
        |  count(CASE WHEN last_snap < 10 - keep_last THEN 1 END) AS n_expired,
        |  CAST(sum(CASE WHEN last_snap < 10 - keep_last THEN size ELSE 0 END)
        |       AS BIGINT) AS bytes_reclaimed
        |FROM f2, r GROUP BY keep_last ORDER BY keep_last""".stripMargin,

    "q128_media_decode_plan" ->
      """WITH m AS (
        |  SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |              ELSE 'video' END AS kind,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents),
        |x AS (
        |  SELECT kind, n,
        |    CASE kind WHEN 'image' THEN 1 WHEN 'video' THEN 1 + n % 240
        |         ELSE n // 4 END AS frames,
        |    CASE WHEN kind = 'image'
        |         THEN (64 + n % 512) * (64 + (n // 7) % 512) ELSE 0 END AS pixels
        |  FROM m)
        |SELECT kind, count(*) AS n_files, CAST(sum(n) AS BIGINT) AS total_bytes,
        |  CAST(sum(frames) AS BIGINT) AS total_frames,
        |  CAST(sum(pixels) AS BIGINT) AS total_pixels,
        |  (count(*) + 63) // 64 AS decode_batches
        |FROM x GROUP BY kind ORDER BY kind""".stripMargin,

    "q129_abandonment" ->
      """WITH tagged AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    CASE WHEN event_type = 'purchase' THEN 0
        |         WHEN event_type = 'view' THEN 1 END AS kind
        |  FROM events WHERE event_type IN ('purchase', 'view')),
        |c AS (
        |  SELECT *,
        |    last_value(CASE WHEN kind = 0 THEN ts_us END IGNORE NULLS) OVER w
        |      AS next_purchase_us
        |  FROM tagged
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY ts_us DESC, kind ASC, event_id DESC
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |v AS (
        |  SELECT user_id,
        |    CASE WHEN next_purchase_us IS NULL
        |              OR next_purchase_us - ts_us > 3600000000
        |         THEN 1 ELSE 0 END AS ab
        |  FROM c WHERE kind = 1)
        |SELECT user_id, count(*) AS n_views, CAST(sum(ab) AS BIGINT) AS n_abandoned,
        |  CAST(sum(ab) AS DOUBLE) / count(*) AS abandon_rate
        |FROM v GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q130_pareto" ->
      """WITH rev AS (
        |  SELECT n_name, o_custkey,
        |    CAST(sum(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, o_custkey),
        |c AS (
        |  SELECT *,
        |    sum(cents) OVER (PARTITION BY n_name ORDER BY cents DESC, o_custkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cents) OVER (PARTITION BY n_name) AS tot,
        |    count(*) OVER (PARTITION BY n_name) AS n_cust,
        |    row_number() OVER (PARTITION BY n_name
        |      ORDER BY cents DESC, o_custkey) AS rnk
        |  FROM rev)
        |SELECT n_name, CAST(min(rnk) AS BIGINT) AS n_top,
        |  CAST(min(n_cust) AS BIGINT) AS n_customers,
        |  CAST(min(rnk) AS DOUBLE) * 100 / min(n_cust) AS pct_customers,
        |  CAST(min(tot) AS DOUBLE) / 100 AS total_revenue
        |FROM c WHERE cum * 5 >= tot * 4
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q131_decay_score" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    CAST(FLOOR(value * 1000000) AS BIGINT) AS vm
        |  FROM events),
        |m AS (SELECT max(day) AS d0 FROM e),
        |sc AS (
        |  SELECT user_id, count(*) AS n_events,
        |    CAST(sum(vm * CASE WHEN d0 - day <= 20
        |                       THEN CAST(1 AS BIGINT) << CAST(20 - (d0 - day) AS INT)
        |                       ELSE 0 END) AS BIGINT) AS score_scaled
        |  FROM e, m GROUP BY user_id)
        |SELECT user_id, n_events,
        |  CAST(score_scaled AS DOUBLE) / 1048576 / 1000000 AS decay_score
        |FROM sc ORDER BY score_scaled DESC, user_id LIMIT 50""".stripMargin,

    "q132_skew_gini" ->
      """WITH loads AS (
        |  SELECT l_returnflag AS flag, l_partkey, count(*) AS x
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY flag
        |    ORDER BY x, l_partkey) AS BIGINT) AS i
        |  FROM loads)
        |SELECT flag, count(*) AS n_keys, CAST(sum(x) AS BIGINT) AS total,
        |  CAST(max(x) AS BIGINT) AS max_load,
        |  CAST(sum(i * x) AS DOUBLE) * 2
        |    / (CAST(count(*) AS DOUBLE) * CAST(sum(x) AS DOUBLE))
        |    - CAST(count(*) + 1 AS DOUBLE) / CAST(count(*) AS DOUBLE) AS gini
        |FROM r GROUP BY flag ORDER BY flag""".stripMargin,

    "q133_distribution_drift" ->
      """WITH ev AS (
        |  SELECT event_type, event_id, epoch_us(ts) // 86400000000 AS day,
        |    CAST(FLOOR(value * 1000000) AS BIGINT) AS vm
        |  FROM events),
        |d0 AS (SELECT min(day) AS d0 FROM ev),
        |t AS (SELECT ev.*, day - d0 AS age FROM ev, d0),
        |w1 AS (SELECT * FROM t WHERE age BETWEEN 0 AND 6),
        |w4 AS (SELECT * FROM t WHERE age BETWEEN 21 AND 27),
        |tiles AS (
        |  SELECT event_type, vm, ntile(10) OVER (PARTITION BY event_type
        |    ORDER BY vm, event_id) AS tile
        |  FROM w1),
        |cuts AS (SELECT event_type, tile, max(vm) AS cut FROM tiles
        |         WHERE tile <= 9 GROUP BY 1, 2),
        |binned AS (
        |  SELECT w4.event_type, w4.event_id,
        |    count(CASE WHEN w4.vm > c.cut THEN 1 END) + 1 AS bin
        |  FROM w4 JOIN cuts c ON c.event_type = w4.event_type
        |  GROUP BY 1, 2),
        |obs AS (SELECT event_type, bin, count(*) AS obs FROM binned GROUP BY 1, 2),
        |spine AS (
        |  SELECT event_type, n4, unnest(range(1, 11)) AS bin
        |  FROM (SELECT event_type, count(*) AS n4 FROM w4 GROUP BY 1)),
        |agg AS (
        |  SELECT s.event_type, min(s.n4) AS n4,
        |    CAST(sum((coalesce(o.obs, 0) * 10 - s.n4)
        |           * (coalesce(o.obs, 0) * 10 - s.n4)) AS BIGINT) AS num
        |  FROM spine s LEFT JOIN obs o
        |    ON o.event_type = s.event_type AND o.bin = s.bin
        |  GROUP BY 1)
        |SELECT a.event_type, w.n1, CAST(a.n4 AS BIGINT) AS n4,
        |  CAST(num AS DOUBLE) / (a.n4 * 10) AS chi2
        |FROM agg a
        |JOIN (SELECT event_type, count(*) AS n1 FROM w1 GROUP BY 1) w
        |  ON w.event_type = a.event_type
        |WHERE a.n4 > 0
        |ORDER BY a.event_type""".stripMargin,

    "q134_correlation_matrix" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, event_type,
        |    CAST(sum(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT)
        |      // 1000000 AS v
        |  FROM events GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    a.v AS x, b.v AS y
        |  FROM daily a JOIN daily b
        |    ON a.day = b.day AND a.event_type < b.event_type),
        |sums AS (
        |  SELECT type_a, type_b, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM pairs GROUP BY 1, 2)
        |SELECT type_a, type_b, n,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |     * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS pearson_r
        |FROM sums ORDER BY type_a, type_b""".stripMargin,

    "q135_user_features" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day, event_type,
        |    CAST(FLOOR(value * 1000000) AS BIGINT) AS vm
        |  FROM events),
        |m AS (SELECT max(day) AS d0 FROM e),
        |u AS (
        |  SELECT user_id, count(*) AS n_events,
        |    count(DISTINCT day) AS days_active, max(day) AS last_day,
        |    CAST(sum(vm) AS BIGINT) AS sum_vm,
        |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
        |    count(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors
        |  FROM e GROUP BY user_id)
        |SELECT user_id, n_events, days_active, d0 - last_day AS recency_days,
        |  CAST(sum_vm AS DOUBLE) / 1000000 / n_events AS mean_value,
        |  CAST(n_purchases AS DOUBLE) / n_events AS purchase_share,
        |  CAST(n_errors AS DOUBLE) / n_events AS error_share
        |FROM u, m ORDER BY user_id""".stripMargin,

    "q136_ab_test" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST('0x' || substring(md5('ab:' || user_id), 1, 7) AS BIGINT) % 2
        |      AS arm,
        |    CASE WHEN count(CASE WHEN event_type = 'purchase' THEN 1 END) * 5
        |              > count(*)
        |         THEN 1 ELSE 0 END AS converted
        |  FROM events GROUP BY user_id),
        |g AS (SELECT arm, count(*) AS n, CAST(sum(converted) AS BIGINT) AS conv
        |      FROM u GROUP BY arm),
        |p AS (
        |  SELECT min(CASE WHEN arm = 0 THEN n END) AS n_a,
        |    min(CASE WHEN arm = 0 THEN conv END) AS conv_a,
        |    min(CASE WHEN arm = 1 THEN n END) AS n_b,
        |    min(CASE WHEN arm = 1 THEN conv END) AS conv_b
        |  FROM g)
        |SELECT n_a, conv_a, n_b, conv_b,
        |  CAST(conv_a AS DOUBLE) / n_a AS rate_a,
        |  CAST(conv_b AS DOUBLE) / n_b AS rate_b,
        |  (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
        |    / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |      * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |      * (1.0 / n_a + 1.0 / n_b)) AS z_score
        |FROM p""".stripMargin,

    "q137_reconciliation" ->
      """WITH lines AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
        |      * (1.0 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS line_cents
        |  FROM lineitem GROUP BY l_orderkey),
        |d AS (
        |  SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) - line_cents AS diff
        |  FROM orders JOIN lines ON o_orderkey = l_orderkey),
        |b AS (
        |  SELECT CASE WHEN diff = 0 THEN 'exact'
        |              WHEN abs(diff) <= 100 THEN 'within_1_unit'
        |              WHEN abs(diff) <= 10000 THEN 'within_100_units'
        |              ELSE 'systemic' END AS bucket, diff
        |  FROM d)
        |SELECT bucket, count(*) AS n_orders,
        |  CAST(min(diff) AS BIGINT) AS min_diff, CAST(max(diff) AS BIGINT) AS max_diff
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin)
}
