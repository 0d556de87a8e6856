package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.metrics.MetricsCalculator
import graft.model.EngineConfig
import graft.sources.FileEntrySource

/** Round-5 batch 2: the remaining large-pipeline families —
  * training-sequence packing (secondary-sort carry scan), corpus mixture
  * re-weighting, two-pass EXACT heavy hitters (Misra-Gries candidates +
  * exact recount), cohort retention, the classic TPC-H Q3 join shape,
  * SCD Type-2 history from a CDC log, incremental aggregate maintenance
  * (partial-agg merge == full recompute), and deterministic hash-based
  * train/val/test splitting.
  *
  * Oracle-parity conventions as in [[Queries]]: identical aliases both
  * sides, CAST integer sums to BIGINT, FLOOR before int casts, integer
  * math where exactness matters, full ORDER BY tie-breaks.
  */
object Queries6 {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    Rel.t(dir, name)

  /** q82: token budget per packed training sequence. Docs are 10-99 tokens,
    * so no single doc exceeds the budget; bins close BEFORE overflow
    * (first-fit sequential — the dual of the compactor's overshoot rule,
    * both disciplines now covered). */
  private val SeqBudget = 256L

  /** q84: Misra-Gries summary capacity per partition. The two-pass answer
    * is exact for any capacity >= the heavy-hitter ratio (64): an item with
    * global count > n/64 has, in at least one partition p, local frequency
    * > n_p/64 > n_p/(Cap+1), so it survives that partition's summary. */
  private val MgCap = 256
  private val HhRatio = 64L

  /** q89: deterministic split hash — [[TextOps.portableHash28]] of a
    * prefixed doc key, mod 10; 0-7 train, 8 val, 9 test. */
  private def splitName(docId: Column): Column = {
    val h = TextOps.portableHash28(concat(lit("split:"), docId.cast("string"))) % 10
    when(h < 8, lit("train")).when(h === 8, lit("val")).otherwise(lit("test"))
  }

  /** q84 stream: an exponentially-skewed key family (key = bit-length of
    * the orderkey, so key j carries ~2^j lineitem rows) unioned with a
    * uniform background (5000 keys x ~12 rows) — the background is what a
    * heavy-hitter sketch must wade through at 100 TB. bit-length via
    * length(bin(x)) is integer-exact on both engines (no float log2). */
  private def hhStream(dir: String)(implicit s: SparkSession): DataFrame =
    t(dir, "lineitem").select(
        concat(lit("L"), length(bin(col("l_orderkey") + 1)).cast("string")).as("k"))
      .union(t(dir, "lineitem").select(
        concat(lit("u"), ((col("l_orderkey") * 7919) % 5000).cast("string")).as("k")))

  private val hhStreamSql: String =
    """SELECT 'L' || CAST(length(bin(l_orderkey + 1)) AS VARCHAR) AS k FROM lineitem
      |  UNION ALL
      |  SELECT 'u' || CAST((l_orderkey * 7919) % 5000 AS VARCHAR) AS k FROM lineitem""".stripMargin

  // ------------------------------------------------ q92/q93 PQ machinery
  // One definition (the [[Rel]] bit-identity rule): q93's ADC search must
  // see exactly the codes q92 emits.

  /** (vec_id, s, subv, self_v): quantized 16-dim subvectors per subspace,
    * with the |subv|^2 self-dot precomputed for SSD-via-dots. */
  private def pqSub(dir: String)(implicit s: SparkSession): DataFrame = {
    import graft.functions.LongArrayDot.longDot
    t(dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000) AS BIGINT))").as("qe"),
        explode(array((0 until 4).map(lit(_)): _*)).as("s"))
      .select(col("vec_id"), col("s"),
        expr("slice(qe, 16 * s + 1, 16)").as("subv"))
      .withColumn("self_v", longDot(col("subv"), col("subv")))
  }

  /** Seeded codebook: the subvectors of vec_id 0..15 (16 codewords per
    * subspace; training = q78's k-means applied per slice). */
  private def pqCodebook(sub: DataFrame): DataFrame =
    sub.filter(col("vec_id") < 16)
      .select(col("vec_id").as("c"), col("s"), col("subv").as("cent"),
        col("self_v").as("self_c"))

  /** (vec_id, s, ssd, c): per-subspace nearest codeword with integer SSD;
    * ties break to the smallest codeword via min(struct(ssd, c)). Takes the
    * already-built sub/codebook so a caller composing several PQ stages
    * (q93) scans the embeddings once, not once per stage. */
  private def pqBest(sub: DataFrame, codebook: DataFrame): DataFrame = {
    import graft.functions.LongArrayDot.longDot
    sub.join(broadcast(codebook), Seq("s"))
      .withColumn("ssd", col("self_v") + col("self_c") - lit(2L) * longDot(col("subv"), col("cent")))
      .groupBy(col("vec_id"), col("s"))
      .agg(min(struct(col("ssd"), col("c"))).as("m"))
      .select(col("vec_id"), col("s"), col("m.ssd").as("ssd"), col("m.c").as("c"))
  }

  /** Shared oracle CTE prefix producing `best` = (vec_id, s, ssd, c). */
  private val pqBestSql: String =
    """q AS (
      |  SELECT vec_id, list_transform(embedding,
      |    v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000) AS BIGINT)) AS qe
      |  FROM embeddings),
      |sub AS (
      |  SELECT vec_id, s, list_slice(qe, 16 * s + 1, 16 * s + 16) AS subv
      |  FROM q CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS s)),
      |cb AS (SELECT vec_id AS c, s, subv AS cent FROM sub WHERE vec_id < 16),
      |d AS (
      |  SELECT v.vec_id, v.s, cb.c,
      |    CAST(list_sum(list_apply(range(1, 17),
      |      i -> (v.subv[i] - cb.cent[i]) * (v.subv[i] - cb.cent[i]))) AS BIGINT) AS ssd
      |  FROM sub v JOIN cb ON v.s = cb.s),
      |ranked_d AS (
      |  SELECT vec_id, s, ssd, c,
      |    row_number() OVER (PARTITION BY vec_id, s ORDER BY ssd, c) AS rn
      |  FROM d),
      |best AS (SELECT vec_id, s, ssd, c FROM ranked_d WHERE rn = 1)""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- training-sequence packing: docs in (lang, doc_id) order packed
    // first-fit into 256-token sequences (close before overflow — the
    // complement of the compactor's overshoot discipline). The sequential
    // carry runs as ONE exchange (repartition by lang) + sortWithinPartitions
    // + a streaming mapPartitions — the secondary-sort pattern: no per-group
    // materialization, state is one open bin, output is bins only. At 100 TB
    // the shard key becomes (lang, doc_id div SHARD) so every task's run is
    // bounded; packing stays exact within shards because sequence identity
    // is per-shard anyway in a real pipeline.
    "q82_sequence_packing" -> { (s, dir) => implicit val sp = s
      import s.implicits._
      val docs = t(dir, "documents")
        .select(col("lang"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("tok"))
        .repartition(col("lang"))
        .sortWithinPartitions(col("lang"), col("doc_id"))
      val bins = docs.mapPartitions { it =>
        var lang: String = null
        var seq = 0L; var docsN = 0L; var toks = 0L
        def closeBin(): (String, Long, Long, Long) = (lang, seq, docsN, toks)
        val main = it.flatMap { r =>
          val l = r.getString(0); val tok = r.getLong(2)
          var out: List[(String, Long, Long, Long)] = Nil
          if (lang == null) { lang = l; seq = 1 }
          else if (l != lang) { out = closeBin() :: Nil; lang = l; seq = 1; docsN = 0; toks = 0 }
          else if (toks + tok > SeqBudget) { out = closeBin() :: Nil; seq += 1; docsN = 0; toks = 0 }
          docsN += 1; toks += tok
          out
        }
        // `++` is by-name: the flush runs only after `main` is exhausted,
        // so it sees the final open bin (or nothing for an empty partition)
        main ++ Iterator.single(()).flatMap { _ =>
          if (lang != null) Iterator.single(closeBin()) else Iterator.empty
        }
      }.toDF("lang", "seq_id", "n_docs", "n_tokens")
      bins.select(col("lang"), col("seq_id"), col("n_docs"), col("n_tokens"),
          round(col("n_tokens").cast("double") / SeqBudget, 4).as("fill_frac"))
        .orderBy(col("lang"), col("seq_id"))
    },

    // ---- corpus mixture re-weighting: per-language sampling weight that
    // moves the corpus toward a uniform target mix, capped at 3x upsampling
    // (the standard mixture-balancing step before training). One tiny agg +
    // a broadcast of the single-row totals: at 100 TB this is one partial
    // agg over the corpus and a driver-size join — no full shuffle.
    "q83_mixture_weights" -> { (s, dir) => implicit val sp = s
      val perLang = t(dir, "documents").groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"))
      val totals = t(dir, "documents")
        .agg(count(lit(1)).as("total"), countDistinct(col("lang")).as("n_langs"))
      perLang.crossJoin(broadcast(totals))
        .select(col("lang"), col("n_docs"),
          round(col("n_docs").cast("double") / col("total"), 6).as("corpus_share"),
          round(least(col("total").cast("double") / (col("n_langs") * col("n_docs")),
            lit(3.0)), 6).as("weight"),
          expr(s"CAST(FLOOR(least(CAST(total AS DOUBLE) / (n_langs * n_docs), 3.0D) * n_docs) AS BIGINT)")
            .as("expected_docs"))
        .orderBy(col("lang"))
    },

    // ---- two-pass EXACT heavy hitters: pass 1 is a Misra-Gries summary
    // per partition (a mapPartitions — NO shuffle of the stream), whose
    // union is a guaranteed superset of every key with count > n/64; pass 2
    // recounts exactly, but only for candidate keys, via a BROADCAST semi
    // join — so the only aggregation shuffle that ever runs is over the
    // tiny candidate subset. At 100 TB this is the shape that works when
    // the key domain (tokens, URLs) is too large to groupBy: the full
    // groupBy the oracle runs is exactly what this plan avoids. The final
    // answer is partitioning-independent (MG is a superset; the recount is
    // exact), which is why a plain SQL oracle can gate it.
    "q84_heavy_hitters" -> { (s, dir) => implicit val sp = s
      import s.implicits._
      val stream = hhStream(dir)
      // Chunked MG: buffer up to 8*Cap exact local counts, then shrink by
      // subtracting the (Cap+1)-th largest count from everything (== that
      // many simultaneous MG decrements — the standard summary-merge step).
      // Amortized O(1)/row vs O(Cap)/miss for textbook MG; memory stays
      // bounded at 9*Cap entries regardless of the key domain.
      val cands = stream.select(col("k")).as[String].mapPartitions { it =>
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        val buf = 8 * MgCap
        def shrink(): Unit = {
          val vs = counts.values.toArray
          java.util.Arrays.sort(vs)
          val t = vs(vs.length - MgCap - 1)
          counts.filterInPlace((_, c) => c > t)
          counts.mapValuesInPlace((_, c) => c - t)
        }
        it.foreach { k =>
          counts.update(k, counts.getOrElse(k, 0L) + 1L)
          if (counts.size >= MgCap + buf) shrink()
        }
        // no final shrink: a larger candidate superset only grows the (tiny)
        // broadcast — the exact recount pass makes the answer identical.
        // No distinct() either: a semi-join build side tolerates duplicate
        // keys, so deduping the candidates would buy nothing but a shuffle.
        counts.keysIterator
      }.toDF("k")
      // total = 2x the lineitem row count (the stream is a 2-way union of
      // one row per lineitem row) — parquet metadata, not a third stream scan
      val total = t(dir, "lineitem").count() * 2
      stream.join(broadcast(cands), Seq("k"), "left_semi")
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .filter(col("n") * HhRatio > total)
        .select(col("k"), col("n"),
          round(col("n").cast("double") / total, 6).as("share"))
        .orderBy(desc("n"), col("k"))
    },

    // ---- cohort retention: users cohorted by their first active epoch-week
    // (integer week math — no date_trunc WEEK-start divergence), retention
    // as the share of the cohort active at each week offset. The event
    // stream is sampled (every 7th event) so activity is sparse enough for
    // non-trivial retention. Two exchanges: min-week per user (window), then
    // the (cohort, offset) rollup — both on small keys; at 100 TB the
    // per-user min is a partial agg, not a window, and the rest is tiny.
    "q85_cohort_retention" -> { (s, dir) => implicit val sp = s
      val ev = Rel.events(dir).filter(col("event_id") % 7 === 0)
        .select(col("user_id"), expr("ts_us div 604800000000").as("wk"))
        .distinct()
      val cohort = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
      val active = ev.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("offset_wk"))
        .agg(countDistinct(col("user_id")).as("n_users"))
      val w = Window.partitionBy(col("cohort_wk"))
      active
        .withColumn("cohort_size", max(when(col("offset_wk") === 0, col("n_users"))).over(w))
        .select(col("cohort_wk"), col("offset_wk"), col("n_users"),
          round(col("n_users").cast("double") / col("cohort_size"), 4).as("retention"))
        .orderBy(col("cohort_wk"), col("offset_wk"))
    },

    // ---- TPC-H Q3 shape (shipping-priority revenue): the canonical
    // dim ⋈ fact ⋈ fact OLAP join. The customer dimension (filtered to one
    // segment) is explicitly BROADCAST — at 100 TB lineitem⋈orders is the
    // real shuffle and AQE handles its skew; the dim never shuffles. Dates
    // compared as epoch-micros integers (identical on both engines for
    // TIMESTAMP_NTZ parquet under a UTC session).
    "q86_ship_priority" -> { (s, dir) => implicit val sp = s
      val cut = 852076800000000L       // 1997-01-01
      val shipCut = 859852800000000L   // 1997-04-01
      val cust = t(dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = t(dir, "orders")
        .withColumn("o_date_us", unix_micros(col("o_orderdate").cast("timestamp")))
        .filter(col("o_date_us") < cut)
        .select(col("o_orderkey"), col("o_custkey"), col("o_date_us"))
      val li = t(dir, "lineitem")
        .filter(unix_micros(col("l_shipdate").cast("timestamp")) >= shipCut)
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_date_us"))
        .agg(round(sum(col("rev")), 2).as("revenue"))
        .orderBy(desc("revenue"), col("o_orderkey"))
        .limit(10)
    },

    // ---- SCD Type-2 history from the shared CDC log ([[CdcFixture]] —
    // bit-identical to q76's merge input): each upsert opens a version
    // interval, the next change (update OR delete) closes it; deletes close
    // without opening. One window exchange on the key — the same shuffle
    // the latest-wins merge needs, so at 100 TB SCD2 costs no more than
    // MERGE. Restricted to the keys the fixture actually changes (v1/v2
    // waves + negative-space inserts) to keep the history non-degenerate.
    "q87_scd2_history" -> { (s, dir) => implicit val sp = s
      val log = CdcFixture.log(dir)
        .filter(col("k") % 10 === 0 || col("k") < 0)
      val w = Window.partitionBy(col("k")).orderBy(col("version"))
      log
        .withColumn("ver_to", lead(col("version"), 1).over(w))
        .withColumn("next_op", lead(col("op"), 1).over(w))
        .filter(col("op") === "U")
        .select(col("k"), col("version").as("ver_from"), col("ver_to"),
          when(col("ver_to").isNull, 1L).otherwise(0L).as("is_current"),
          when(col("next_op") === "D", 1L).otherwise(0L).as("closed_by_delete"),
          col("price"), col("prio"))
        .orderBy(col("k"), col("ver_from"))
    },

    // ---- incremental aggregate maintenance: yesterday's partial aggregates
    // merged with today's delta partials must equal a full recompute — the
    // algebraic-aggregate (count/sum/min/max) merge law that makes
    // incremental view maintenance work. Money is exact integer cents
    // (FLOOR(price*100)) so the merge is bit-exact, not merely close. The
    // oracle recomputes from scratch: passing means the merge path IS the
    // full answer. At 100 TB only the delta is scanned — the base partials
    // are a 5-row state table.
    "q88_incremental_agg" -> { (s, dir) => implicit val sp = s
      val withCents = t(dir, "orders")
        .withColumn("cents", expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)"))
      def partial(df: DataFrame): DataFrame =
        df.groupBy(col("o_orderpriority").as("prio"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
            min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
      val base = partial(withCents.filter(col("o_orderkey") % 7 =!= 0))
      val delta = partial(withCents.filter(col("o_orderkey") % 7 === 0))
      base.unionByName(delta)
        .groupBy(col("prio"))
        .agg(sum(col("n")).as("n_rows"),
          sum(col("sum_cents")).as("sum_cents"),
          min(col("min_cents")).as("min_cents"),
          max(col("max_cents")).as("max_cents"))
        .select(col("prio"), col("n_rows"), col("sum_cents"), col("min_cents"),
          col("max_cents"),
          round(col("sum_cents").cast("double") / (col("n_rows") * 100), 4)
            .as("avg_price"))
        .orderBy(col("prio"))
    },

    // ---- KMV distinct sketch, oracle-gated: per group, keep the k=64
    // smallest DISTINCT hash values of the key ([[graft.functions
    // .MinKDistinct]], a bounded typed UDAF) and estimate the distinct
    // count as (k-1) * 2^28 div h_k — integer math on a deterministic
    // md5-derived 28-bit hash, so the APPROXIMATE sketch is bit-reproducible
    // by the SQL oracle. The sketch is a pure partial aggregation (k longs
    // of state per group, map-side bounded, merge = min-k of union): at
    // 100 TB this replaces the full distinct shuffle that the exact
    // validation column (and the oracle) pays. Contrast q35, whose HLL
    // internals are engine-specific and only rows-gated.
    "q90_kmv_distinct" -> { (s, dir) => implicit val sp = s
      val k = 64
      val minK = udaf(new graft.functions.MinKDistinct.MinK(k),
        org.apache.spark.sql.Encoders.scalaLong)
      val hashed = t(dir, "lineitem").select(col("l_returnflag").as("flag"),
        TextOps.portableHash28(concat(lit("kmv:"), col("l_partkey").cast("string"))).as("h"))
      hashed.groupBy(col("flag"))
        .agg(minK(col("h")).as("mins"), countDistinct(col("h")).as("exact_distinct"))
        .select(col("flag"), col("exact_distinct"),
          when(size(col("mins")) < k, col("exact_distinct"))
            .otherwise(expr(s"(${k - 1} * 268435456L) div element_at(mins, $k)"))
            .as("kmv_est"))
        .withColumn("rel_err",
          round(abs(col("kmv_est") - col("exact_distinct")).cast("double")
            / col("exact_distinct"), 4))
        .orderBy(col("flag"))
    },

    // ---- PageRank over the part co-purchase graph, integer-quantized so
    // three power iterations are bit-exact on both engines: ranks live in
    // micro-units, each step is rank div outdeg summed over in-edges, then
    // 150000 + (85 * sum) div 100 (d = 0.85). The co-purchase edge set is
    // QUADRATIC in basket size and is never materialized: within an order
    // o, part p receives S_o - c(p) where S_o = sum of contributions of the
    // order's parts — summing that per part over orders is bit-identical to
    // summing c(src) over the explicit edge multiset (duplicate pairs from
    // shared orders included, all integer adds). Each round is therefore
    // ONE pass over the linear (order, part) relation — cached repartitioned
    // + sorted by order, so the per-order window needs no exchange and no
    // sort (broadcast joins preserve the streamed side's partitioning and
    // ordering) — instead of a pass over the materialized pair expansion
    // (measured 4.0s -> 1.6s at sf0.1; at 100 TB the gap is the difference
    // between |basket|^2 blowup and linear). The rank loop lives in
    // [[graft.operators.PageRank]] with ClusterOps-style hybrid dispatch:
    // below 1M graph nodes the rank vector is driver-localized per round
    // (a lazy rank DataFrame would drag its lineage into every broadcast,
    // re-running round k-1 inside round k); above it, ranks stay a
    // distributed DataFrame localCheckpointed per round. PageRankSpec
    // proves both paths bit-identical on the same fixture.
    "q91_part_pagerank" -> { (s, dir) => implicit val sp = s
      // distinct (order, part) FIRST: per-order part sets, no multiplicity.
      // No o-clustering and no cache here (r17): the fully-local arm's
      // LIMIT probe collects the pairs in ONE action, and partRanks caches
      // internally only when a cluster arm will actually re-scan — caching
      // (or pre-shuffling) for a path that may never run was wasted work.
      val li = t(dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      PageRank.partRanks(li)
        .orderBy(col("rank").desc, col("part")).limit(20)
        .localCheckpoint()
    },

    // ---- product quantization (PQ) encode: 64-dim quantized vectors split
    // into 4 subspaces x 16 dims; each subvector maps to the nearest of 16
    // seeded codewords (the subvectors of vec_id 0..15 — training the
    // codebook per subspace is q78's k-means applied per slice). Distances
    // are exact integer SSD computed as |a|^2 + |b|^2 - 2ab with the native
    // codegen'd [[graft.functions.LongArrayDot]] kernel; argmin ties break
    // to the smallest codeword via min(struct(ssd, c)). The codebook
    // (64 rows) is BROADCAST; encoding is one map-side join + one
    // aggregation per vector — at 100 TB this is the standard shape that
    // turns a 256-byte float vector into 4 codes, and ADC search reuses the
    // same broadcast codebook against query subvectors.
    "q92_pq_encode" -> { (s, dir) => implicit val sp = s
      val sub = pqSub(dir)
      pqBest(sub, pqCodebook(sub)).groupBy(col("vec_id"))
        .agg(max(when(col("s") === 0, col("c"))).as("c0"),
          max(when(col("s") === 1, col("c"))).as("c1"),
          max(when(col("s") === 2, col("c"))).as("c2"),
          max(when(col("s") === 3, col("c"))).as("c3"),
          sum(col("ssd")).as("recon_err"))
        .orderBy(col("vec_id"))
    },

    // ---- ADC (asymmetric distance) search over the PQ codes: each query
    // keeps its RAW subvectors and builds a 4x16 lookup table of exact
    // integer SSDs to every codeword (the LUT is 64 rows per query,
    // BROADCAST); a candidate's distance is then 4 LUT lookups summed —
    // the codes relation never touches raw vectors. At 100 TB this is the
    // memory shape that makes billion-scale ANN work: the scan side carries
    // 4 small ints per vector, and the only join is a broadcast equi-join
    // on (subspace, code). Top-5 per query, integer-exact end to end.
    "q93_pq_adc_search" -> { (s, dir) => implicit val sp = s
      import graft.functions.LongArrayDot.longDot
      val sub = pqSub(dir)
      val cb = pqCodebook(sub)
      val lut = sub.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("s"), col("subv"), col("self_v"))
        .join(broadcast(cb), Seq("s"))
        .select(col("query_id"), col("s"), col("c"),
          (col("self_v") + col("self_c") - lit(2L) * longDot(col("subv"), col("cent"))).as("ssd"))
      val codes = pqBest(sub, cb).select(col("vec_id").as("neighbor_id"), col("s"), col("c"))
      val adc = codes.join(broadcast(lut), Seq("s", "c"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .groupBy(col("query_id"), col("neighbor_id"))
        .agg(sum(col("ssd")).as("adc_dist"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("adc_dist"), col("neighbor_id"))
      adc.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"), col("adc_dist"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    },

    // ---- sketch-based join-cardinality estimation: the optimizer-statistics
    // use of the KMV sketch. Two key sets (distinct (part, supp) pairs
    // shipped in 1996 vs 1997) are sketched with min-128; the union sketch
    // is the min-k of the concatenated streams (mergeability again), the
    // union cardinality comes from the k-th minimum, and the intersection —
    // the join size a planner wants BEFORE running the join — is the
    // Jaccard fraction of the union sketch present in both side sketches.
    // Every estimate is integer math over deterministic hashes, so the
    // approximate statistics are oracle-gated exactly; the exact columns
    // (via inclusion-exclusion — no join anywhere) gate the error. At
    // 100 TB each sketch is one partial agg over its scan: 128 longs per
    // relation buys a join-size estimate without shuffling either side.
    "q94_join_cardinality_sketch" -> { (s, dir) => implicit val sp = s
      val k = 128
      val minK = udaf(new graft.functions.MinKDistinct.MinK(k),
        org.apache.spark.sql.Encoders.scalaLong)
      def pairsOf(y0: Long, y1: Long): DataFrame =
        t(dir, "lineitem")
          .withColumn("ship_us", unix_micros(col("l_shipdate").cast("timestamp")))
          .filter(col("ship_us") >= y0 && col("ship_us") < y1)
          .select(TextOps.portableHash28(concat(lit("jc:"),
            col("l_partkey").cast("string"), lit(":"),
            col("l_suppkey").cast("string"))).as("h"))
      val y96 = 820454400000000L; val y97 = 852076800000000L; val y98 = 883612800000000L
      val ha = pairsOf(y96, y97); val hb = pairsOf(y97, y98)
      val skA = ha.agg(minK(col("h")).as("sa"), countDistinct(col("h")).as("exact_a"))
      val skB = hb.agg(minK(col("h")).as("sb"), countDistinct(col("h")).as("exact_b"))
      val skU = ha.union(hb).agg(minK(col("h")).as("su"),
        countDistinct(col("h")).as("exact_union"))
      skA.crossJoin(skB).crossJoin(skU)
        .withColumn("exact_inter", col("exact_a") + col("exact_b") - col("exact_union"))
        .withColumn("est_union",
          when(size(col("su")) < k, col("exact_union"))
            .otherwise(expr(s"(${k - 1} * 268435456L) div element_at(su, $k)")))
        .withColumn("m",
          size(array_intersect(array_intersect(col("su"), col("sa")), col("sb"))).cast("long"))
        // when the union fits in the sketch, all three sketches are complete
        // and m IS the exact intersection — scaling by est_union/k would
        // underestimate by |su|/k
        .withColumn("est_inter",
          when(size(col("su")) < k, col("m")).otherwise(expr(s"m * est_union div $k")))
        .select(col("exact_a"), col("exact_b"), col("exact_union"), col("exact_inter"),
          col("est_union"), col("est_inter"),
          round(abs(col("est_union") - col("exact_union")).cast("double")
            / col("exact_union"), 4).as("err_union"),
          when(col("exact_inter") === 0, lit(0.0))
            .otherwise(round(abs(col("est_inter") - col("exact_inter")).cast("double")
              / col("exact_inter"), 4)).as("err_inter"))
    },

    // ---- equi-depth histogram (optimizer statistics, pairing q94): 8
    // equal-count buckets over price with a full tie-break, then
    // per-bucket bounds — the histogram shape planners use for selectivity.
    // NOT an unpartitioned ntile window (Exchange SinglePartition — one
    // task sorts the corpus): the global rank comes from
    // [[StatOps.rangeCumsum]] (range exchange → parallel per-partition
    // scans → broadcast offsets), and the bucket is the SQL-standard ntile
    // arithmetic over (rank, n) — first n%8 buckets one row larger — so
    // the output hash is bit-identical to the window formulation while the
    // plan survives a 100× scale-up.
    "q95_equidepth_histogram" -> { (s, dir) => implicit val sp = s
      val ranked = StatOps.rangeCumsum(
        t(dir, "lineitem")
          .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")),
        Nil, Seq("l_extendedprice", "l_orderkey", "l_linenumber"),
        Seq("rk" -> lit(1L)),
        // floor-cents is monotone in price, so octave buckets respect the
        // (price, ...) order; ties spread by the tie-break INSIDE a bucket
        StatOps.octaveBucket16(floor(col("l_extendedprice") * 100)))
      ranked
        .withColumn("bucket", expr(
          """CAST(CASE WHEN rk <= (rk_total % 8) * (rk_total DIV 8 + 1)
            |  THEN (rk - 1) DIV (rk_total DIV 8 + 1) + 1
            |  ELSE (rk_total % 8)
            |    + (rk - 1 - (rk_total % 8) * (rk_total DIV 8 + 1))
            |      DIV greatest(rk_total DIV 8, 1) + 1
            |END AS BIGINT)""".stripMargin))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("l_extendedprice")).as("lo"), max(col("l_extendedprice")).as("hi"))
        .orderBy(col("bucket"))
    },

    // ---- TPC-H Q18 shape (large-volume customers): orders whose lineitem
    // quantity total clears a threshold, joined back to customer. The
    // HAVING set is tiny, so it broadcasts into both enrichment joins —
    // the aggregate-then-broadcast-back pattern that keeps the fact table
    // to ONE shuffle (the groupBy) at any scale.
    "q96_large_volume_customers" -> { (s, dir) => implicit val sp = s
      // l_quantity is an integral-valued DOUBLE in the parquet: the sum is
      // exact, FLOOR-cast to BIGINT per the oracle-parity rule
      val bigOrders = t(dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(expr("CAST(FLOOR(sum(l_quantity)) AS BIGINT)").as("total_qty"))
        .filter(col("total_qty") > 150L)
      val enriched = t(dir, "orders")
        .join(broadcast(bigOrders), col("o_orderkey") === col("l_orderkey"))
        .join(t(dir, "customer"), col("o_custkey") === col("c_custkey"))
      enriched
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("total_qty"), col("o_totalprice"))
        .orderBy(desc("total_qty"), col("o_orderkey"))
        .limit(100)
    },

    // ---- as-of join with a staleness tolerance (feature-store semantics):
    // each purchase matches its user's latest prior signup ONLY if that
    // signup is at most 1 day old — q31's single-shuffle union+window
    // as-of, with the tolerance as a post-predicate (both the match id and
    // its timestamp ride the same last(ignoreNulls) window). No range join
    // at any scale; staleness bounds are what keep point-in-time training
    // features honest.
    "q97_asof_tolerance" -> { (s, dir) => implicit val sp = s
      val tol = 86400000000L // 1 day in micros
      val ev = Rel.events(dir)
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"), col("ts_us"))
        .agg(max(col("event_id")).as("signup_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), col("event_id"))
      val tagged = signups.select(col("user_id"), col("ts_us"), lit(0).as("tag"),
          col("signup_id"), lit(null).cast("long").as("event_id"))
        .unionByName(purchases.select(col("user_id"), col("ts_us"), lit(1).as("tag"),
          lit(null).cast("long").as("signup_id"), col("event_id")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("tag"), col("signup_id").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("asof_id", last(col("signup_id"), ignoreNulls = true).over(w))
        .withColumn("asof_ts",
          last(when(col("tag") === 0, col("ts_us")), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          when(col("ts_us") - col("asof_ts") <= tol, col("asof_id"))
            .as("fresh_signup_id"),
          when(col("ts_us") - col("asof_ts") <= tol, col("ts_us") - col("asof_ts"))
            .as("gap_us"))
        .orderBy(col("event_id"))
    },

    // ---- the flagship multi-table fan-in, oracle-gated: THREE derived
    // file relations (different partition keys, sizes, delete-file mixes)
    // plus one EMPTY-snapshot table run through the metrics pipeline as a
    // single union-all DAG — one wide shuffle keyed (table, partition),
    // one per-table rollup, no driver-side loop over tables. This is
    // exactly the 100 TB / thousands-of-tables design SURVEY §3.2 claims;
    // t0 (no file entries, manifests only) additionally gates the
    // reference's empty-iterator behavior (full outer join on the
    // authoritative manifest list; overhead seeded from manifest count).
    "q98_multi_table_metrics" -> { (s, dir) => implicit val sp = s
      val li = t(dir, "lineitem")
      def derived(pk: Column, bucket: Column, sizeExpr: String, nContent: Int): DataFrame =
        li.groupBy(pk.as("pk"), bucket.cast("int").as("bucket"))
          .agg(expr(sizeExpr).as("size"))
          .withColumn("content", (col("bucket") % nContent).cast("int"))
      val t1 = FileEntrySource.fromDataFrame(
        derived(col("l_returnflag").cast("string"), col("l_orderkey") % 200,
          "CAST(FLOOR(avg(l_extendedprice) * 1000) AS BIGINT)", 3),
        "t1", col("pk"), col("size"), col("content"))
      val t2 = FileEntrySource.fromDataFrame(
        derived(col("l_linestatus").cast("string"), col("l_orderkey") % 120,
          "CAST(FLOOR(avg(l_quantity) * 50000) AS BIGINT)", 2),
        "t2", col("pk"), col("size"), col("content"))
      val t3 = FileEntrySource.fromDataFrame(
        derived((col("l_partkey") % 5).cast("string"), col("l_suppkey") % 80,
          "CAST(FLOOR(avg(l_discount) * 1000000000) AS BIGINT)", 1),
        "t3", col("pk"), col("size"), col("content"))
      val files = t1.union(t2).union(t3)
      val manifests = s.createDataset(Seq(("t0", 5L), ("t1", 3L), ("t2", 0L), ("t3", 7L)))(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.scalaLong))
      MetricsCalculator.computeMetricsWide(files, manifests, EngineConfig.default)
        .toDF()
        .select(col("table").as("tbl"),
          col("fullScanOverheadBefore").as("full_scan_before"),
          col("fullScanOverheadAfter").as("full_scan_after"),
          col("worstScanOverheadBefore").as("worst_scan_before"),
          col("worstScanOverheadAfter").as("worst_scan_after"),
          col("fileCountBefore").as("file_count_before"),
          col("fileCountAfter").as("file_count_after"),
          col("worstFileCountBefore").as("worst_fc_before"),
          col("worstFileCountAfter").as("worst_fc_after"),
          round(col("avgFileSize"), 4).as("avg_data_size"),
          round(col("worstAvgFileSize"), 4).as("worst_avg_size"),
          col("totalTableSize").as("total_size"),
          col("largestPartitionSize").as("largest_partition"),
          col("totalPartitions").as("n_partitions"))
        .orderBy(col("tbl"))
    },

    // ---- time-series resampling with forward fill: every user's event
    // stream re-sampled onto a 6-hour grid (generated with sequence(), no
    // driver loop), each grid point carrying the value of the latest event
    // at or before it. The fill is the q31 as-of shape — grid and events
    // tagged, unioned, ONE window per user — not a range join; the grid is
    // bounded per user by its own event span (ceil/floor integer period
    // math). At 100 TB this is the standard gap-fill before feature
    // extraction: one shuffle on user, state one row per open value.
    "q99_resample_ffill" -> { (s, dir) => implicit val sp = s
      val P = 21600000000L // 6 hours in micros
      val ev = Rel.events(dir)
        .groupBy(col("user_id"), col("ts_us"))
        .agg(max_by(col("value"), col("event_id")).as("value"))
      val grid = ev.groupBy(col("user_id"))
        .agg(expr(s"(min(ts_us) + $P - 1) div $P").as("h0"),
          expr(s"max(ts_us) div $P").as("h1"))
        // a user whose events all land inside one period has h0 = h1 + 1;
        // Spark sequence(h0, h1) would go DESCENDING there (DuckDB range is
        // empty) — filter the degenerate span instead of relying on the data.
        .filter(col("h0") <= col("h1"))
        .select(col("user_id"), explode(expr("sequence(h0, h1)")).as("h"))
        .select(col("user_id"), (col("h") * P).as("ts_us"))
      val tagged = ev.select(col("user_id"), col("ts_us"), lit(0).as("tag"), col("value"))
        .unionByName(grid.select(col("user_id"), col("ts_us"), lit(1).as("tag"),
          lit(null).cast("double").as("value")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("filled", last(col("value"), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("user_id"), col("ts_us").as("grid_us"), col("filled"))
        .orderBy(col("user_id"), col("grid_us"))
    },

    // ---- deterministic train/val/test split: a pure hash of the doc key
    // (no RNG, no ordering dependence) assigns every doc to exactly one
    // split — reproducible across engines, runs, and cluster sizes, which
    // is the property that matters when the split must survive re-sharding
    // at 100 TB. Map-only assignment + one small rollup.
    "q89_split_assignment" -> { (s, dir) => implicit val sp = s
      val assigned = t(dir, "documents")
        .select(col("lang"), col("n_chars"), splitName(col("doc_id")).as("split"))
      val w = Window.partitionBy(col("lang"))
      assigned.groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .withColumn("lang_share",
          round(col("n_docs").cast("double") / sum(col("n_docs")).over(w), 4))
        .orderBy(col("lang"), col("split"))
    }
  )

  def oracles: Map[String, String] = Map(

    "q82_sequence_packing" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
         |         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
         |  FROM documents),
         |rec AS (
         |  SELECT lang, rn, tok AS cum, CAST(1 AS BIGINT) AS seq FROM d WHERE rn = 1
         |  UNION ALL
         |  SELECT d.lang, d.rn,
         |    CASE WHEN rec.cum + d.tok > $SeqBudget THEN d.tok ELSE rec.cum + d.tok END,
         |    CASE WHEN rec.cum + d.tok > $SeqBudget THEN rec.seq + 1 ELSE rec.seq END
         |  FROM rec JOIN d ON d.lang = rec.lang AND d.rn = rec.rn + 1)
         |SELECT lang, seq AS seq_id, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(max(cum) AS BIGINT) AS n_tokens,
         |  round(CAST(max(cum) AS DOUBLE) / $SeqBudget, 4) AS fill_frac
         |FROM rec GROUP BY lang, seq ORDER BY lang, seq_id""".stripMargin,

    "q83_mixture_weights" ->
      """WITH per_lang AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang),
        |totals AS (
        |  SELECT CAST(count(*) AS BIGINT) AS total,
        |         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs FROM documents)
        |SELECT lang, n_docs,
        |  round(CAST(n_docs AS DOUBLE) / total, 6) AS corpus_share,
        |  round(least(CAST(total AS DOUBLE) / (n_langs * n_docs), 3.0), 6) AS weight,
        |  CAST(FLOOR(least(CAST(total AS DOUBLE) / (n_langs * n_docs), 3.0) * n_docs) AS BIGINT)
        |    AS expected_docs
        |FROM per_lang CROSS JOIN totals ORDER BY lang""".stripMargin,

    "q84_heavy_hitters" ->
      s"""WITH stream AS ($hhStreamSql),
         |totals AS (SELECT CAST(count(*) AS BIGINT) AS total FROM stream),
         |counts AS (SELECT k, CAST(count(*) AS BIGINT) AS n FROM stream GROUP BY k)
         |SELECT k, n, round(CAST(n AS DOUBLE) / total, 6) AS share
         |FROM counts CROSS JOIN totals WHERE n * $HhRatio > total
         |ORDER BY n DESC, k""".stripMargin,

    "q85_cohort_retention" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk
        |  FROM events WHERE event_id % 7 = 0),
        |cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY user_id),
        |active AS (
        |  SELECT c.cohort_wk, e.wk - c.cohort_wk AS offset_wk,
        |         CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        |  FROM ev e JOIN cohort c ON e.user_id = c.user_id
        |  GROUP BY 1, 2)
        |SELECT cohort_wk, offset_wk, n_users,
        |  round(CAST(n_users AS DOUBLE) / max(CASE WHEN offset_wk = 0 THEN n_users END)
        |    OVER (PARTITION BY cohort_wk), 4) AS retention
        |FROM active ORDER BY cohort_wk, offset_wk""".stripMargin,

    "q86_ship_priority" ->
      """SELECT o.o_orderkey, epoch_us(o.o_orderdate) AS o_date_us,
        |  round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue
        |FROM customer c
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND epoch_us(o.o_orderdate) < 852076800000000
        |  AND epoch_us(l.l_shipdate) >= 859852800000000
        |GROUP BY 1, 2 ORDER BY revenue DESC, o.o_orderkey LIMIT 10""".stripMargin,

    "q87_scd2_history" ->
      s"""WITH log AS (${CdcFixture.logSql}),
        |changed AS (SELECT * FROM log WHERE k % 10 = 0 OR k < 0),
        |v AS (
        |  SELECT changed.*,
        |    lead(version) OVER (PARTITION BY k ORDER BY version) AS ver_to,
        |    lead(op) OVER (PARTITION BY k ORDER BY version) AS next_op
        |  FROM changed)
        |SELECT k, version AS ver_from, ver_to,
        |  CAST(CASE WHEN ver_to IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current,
        |  CAST(CASE WHEN next_op = 'D' THEN 1 ELSE 0 END AS BIGINT) AS closed_by_delete,
        |  price, prio
        |FROM v WHERE op = 'U' ORDER BY k, ver_from""".stripMargin,

    "q88_incremental_agg" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS prio,
        |         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
        |SELECT prio, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(min(cents) AS BIGINT) AS min_cents,
        |  CAST(max(cents) AS BIGINT) AS max_cents,
        |  round(CAST(sum(cents) AS DOUBLE) / (count(*) * 100), 4) AS avg_price
        |FROM o GROUP BY prio ORDER BY prio""".stripMargin,

    "q92_pq_encode" ->
      s"""WITH $pqBestSql
        |SELECT vec_id,
        |  max(CASE WHEN s = 0 THEN c END) AS c0,
        |  max(CASE WHEN s = 1 THEN c END) AS c1,
        |  max(CASE WHEN s = 2 THEN c END) AS c2,
        |  max(CASE WHEN s = 3 THEN c END) AS c3,
        |  CAST(sum(ssd) AS BIGINT) AS recon_err
        |FROM best GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "q93_pq_adc_search" ->
      s"""WITH $pqBestSql,
        |lut AS (
        |  SELECT p.vec_id AS query_id, p.s, cb.c,
        |    CAST(list_sum(list_apply(range(1, 17),
        |      i -> (p.subv[i] - cb.cent[i]) * (p.subv[i] - cb.cent[i]))) AS BIGINT) AS ssd
        |  FROM sub p JOIN cb ON p.s = cb.s WHERE p.vec_id < 10),
        |adc AS (
        |  SELECT lut.query_id, best.vec_id AS neighbor_id,
        |    CAST(sum(lut.ssd) AS BIGINT) AS adc_dist
        |  FROM best JOIN lut ON best.s = lut.s AND best.c = lut.c
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT query_id, neighbor_id, adc_dist,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY adc_dist, neighbor_id) AS rnk
        |  FROM adc WHERE neighbor_id <> query_id)
        |SELECT query_id, neighbor_id, adc_dist, CAST(rnk AS BIGINT) AS rank
        |FROM ranked WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin,

    "q94_join_cardinality_sketch" ->
      """WITH a AS (
        |  SELECT DISTINCT CAST('0x' || substring(md5('jc:' || CAST(l_partkey AS VARCHAR)
        |    || ':' || CAST(l_suppkey AS VARCHAR)), 1, 7) AS BIGINT) AS h
        |  FROM lineitem WHERE epoch_us(l_shipdate) >= 820454400000000
        |    AND epoch_us(l_shipdate) < 852076800000000),
        |b AS (
        |  SELECT DISTINCT CAST('0x' || substring(md5('jc:' || CAST(l_partkey AS VARCHAR)
        |    || ':' || CAST(l_suppkey AS VARCHAR)), 1, 7) AS BIGINT) AS h
        |  FROM lineitem WHERE epoch_us(l_shipdate) >= 852076800000000
        |    AND epoch_us(l_shipdate) < 883612800000000),
        |u AS (SELECT h FROM a UNION SELECT h FROM b),
        |ska AS (SELECT list(h ORDER BY h) AS sa FROM (SELECT h FROM a ORDER BY h LIMIT 128)),
        |skb AS (SELECT list(h ORDER BY h) AS sb FROM (SELECT h FROM b ORDER BY h LIMIT 128)),
        |sku AS (SELECT list(h ORDER BY h) AS su FROM (SELECT h FROM u ORDER BY h LIMIT 128)),
        |ex AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS exact_a,
        |              (SELECT CAST(count(*) AS BIGINT) FROM b) AS exact_b,
        |              (SELECT CAST(count(*) AS BIGINT) FROM u) AS exact_union),
        |base AS (
        |  SELECT exact_a, exact_b, exact_union,
        |    exact_a + exact_b - exact_union AS exact_inter,
        |    len(su) AS len_su,
        |    CAST(CASE WHEN len(su) < 128 THEN exact_union
        |         ELSE (127 * CAST(268435456 AS BIGINT)) // su[128] END AS BIGINT) AS est_union,
        |    CAST(len(list_filter(su, x -> list_contains(sa, x) AND list_contains(sb, x)))
        |      AS BIGINT) AS m
        |  FROM ex CROSS JOIN ska CROSS JOIN skb CROSS JOIN sku),
        |withest AS (
        |  SELECT *, CAST(CASE WHEN complete THEN m
        |       ELSE m * est_union // 128 END AS BIGINT) AS est_inter
        |  FROM (SELECT *, len_su < 128 AS complete FROM base))
        |SELECT exact_a, exact_b, exact_union, exact_inter, est_union, est_inter,
        |  round(CAST(abs(est_union - exact_union) AS DOUBLE) / exact_union, 4) AS err_union,
        |  CASE WHEN exact_inter = 0 THEN 0.0
        |       ELSE round(CAST(abs(est_inter - exact_inter) AS DOUBLE)
        |         / exact_inter, 4) END AS err_inter
        |FROM withest""".stripMargin,

    "q95_equidepth_histogram" ->
      """WITH b AS (
        |  SELECT l_extendedprice,
        |    CAST(ntile(8) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
        |      AS BIGINT) AS bucket
        |  FROM lineitem)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |  min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q96_large_volume_customers" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(FLOOR(sum(l_quantity)) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(FLOOR(sum(l_quantity)) AS BIGINT) > 150)
        |SELECT c.c_custkey, c.c_name, o.o_orderkey, b.total_qty, o.o_totalprice
        |FROM big b
        |JOIN orders o ON o.o_orderkey = b.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |ORDER BY b.total_qty DESC, o.o_orderkey LIMIT 100""".stripMargin,

    "q97_asof_tolerance" ->
      """WITH signups AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS signup_id
        |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2),
        |purchases AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts_us,
        |  CASE WHEN p.ts_us - s.ts_us <= 86400000000 THEN s.signup_id END
        |    AS fresh_signup_id,
        |  CASE WHEN p.ts_us - s.ts_us <= 86400000000 THEN p.ts_us - s.ts_us END
        |    AS gap_us
        |FROM purchases p
        |ASOF LEFT JOIN signups s
        |  ON p.user_id = s.user_id AND s.ts_us <= p.ts_us
        |ORDER BY p.event_id""".stripMargin,

    "q98_multi_table_metrics" -> {
      val cap = EngineConfig.default.maxGroupBytes
      val fetch = EngineConfig.default.fetchSize
      val ms = EngineConfig.default.msPerScan
      s"""WITH RECURSIVE files AS (
         |  SELECT 't1' AS tbl, pk, bucket, CAST(bucket % 3 AS INT) AS content, size FROM (
         |    SELECT CAST(l_returnflag AS VARCHAR) AS pk, CAST(l_orderkey % 200 AS INT) AS bucket,
         |           CAST(FLOOR(avg(l_extendedprice) * 1000) AS BIGINT) AS size
         |    FROM lineitem GROUP BY 1, 2)
         |  UNION ALL
         |  SELECT 't2', pk, bucket, CAST(bucket % 2 AS INT), size FROM (
         |    SELECT CAST(l_linestatus AS VARCHAR) AS pk, CAST(l_orderkey % 120 AS INT) AS bucket,
         |           CAST(FLOOR(avg(l_quantity) * 50000) AS BIGINT) AS size
         |    FROM lineitem GROUP BY 1, 2)
         |  UNION ALL
         |  SELECT 't3', pk, bucket, CAST(0 AS INT), size FROM (
         |    SELECT CAST(l_partkey % 5 AS VARCHAR) AS pk, CAST(l_suppkey % 80 AS INT) AS bucket,
         |           CAST(FLOOR(avg(l_discount) * 1000000000) AS BIGINT) AS size
         |    FROM lineitem GROUP BY 1, 2)),
         |datafiles AS (
         |  SELECT tbl, pk, size,
         |    row_number() OVER (PARTITION BY tbl, pk ORDER BY size, bucket) AS rn
         |  FROM files WHERE content = 0),
         |rec AS (
         |  SELECT tbl, pk, rn, size AS cur_sum, 1 AS group_id FROM datafiles WHERE rn = 1
         |  UNION ALL
         |  SELECT d.tbl, d.pk, d.rn,
         |    CASE WHEN rec.cur_sum > $cap THEN d.size ELSE rec.cur_sum + d.size END,
         |    CASE WHEN rec.cur_sum > $cap THEN rec.group_id + 1 ELSE rec.group_id END
         |  FROM rec JOIN datafiles d
         |    ON d.tbl = rec.tbl AND d.pk = rec.pk AND d.rn = rec.rn + 1),
         |groups_ AS (
         |  SELECT tbl, pk, group_id, max(cur_sum) AS gsum FROM rec GROUP BY tbl, pk, group_id),
         |after_pk AS (
         |  SELECT tbl, pk, max(group_id) AS n_groups,
         |         sum(gsum // $fetch + 2) AS after_overhead
         |  FROM groups_ GROUP BY tbl, pk),
         |before_pk AS (
         |  SELECT tbl, pk, count(*) AS fc, sum(size) AS tsz,
         |         sum(size // $fetch + 2) AS ovh,
         |         count(CASE WHEN content = 0 THEN 1 END) AS dc,
         |         sum(CASE WHEN content = 0 THEN size END) AS dsz
         |  FROM files GROUP BY tbl, pk),
         |per_pk AS (
         |  SELECT b.*, coalesce(a.n_groups, 0) AS n_groups,
         |         coalesce(a.after_overhead, 0) AS after_overhead
         |  FROM before_pk b LEFT JOIN after_pk a ON a.tbl = b.tbl AND a.pk = b.pk),
         |per_tbl AS (
         |  SELECT tbl, sum(ovh) AS ovh_sum, sum(after_overhead) AS after_sum,
         |         sum(fc) AS fc_sum, sum(n_groups) AS ng_sum,
         |         sum(dsz) AS dsz_sum, sum(dc) AS dc_sum,
         |         min(CAST(tsz AS DOUBLE) / fc) AS wavg,
         |         max(tsz) AS max_tsz, sum(tsz) AS tsz_sum, count(*) AS n_pk
         |  FROM per_pk GROUP BY tbl),
         |wfc AS (
         |  SELECT tbl, fc, n_groups, red FROM (
         |    SELECT tbl, fc, n_groups, fc - n_groups AS red,
         |      row_number() OVER (PARTITION BY tbl ORDER BY fc - n_groups DESC, pk DESC) AS rn
         |    FROM per_pk) WHERE rn = 1),
         |wso AS (
         |  SELECT tbl, ovh, after_overhead, red FROM (
         |    SELECT tbl, ovh, after_overhead, ovh - after_overhead AS red,
         |      row_number() OVER (PARTITION BY tbl ORDER BY ovh - after_overhead DESC, pk DESC) AS rn
         |    FROM per_pk) WHERE rn = 1),
         |mani AS (SELECT * FROM (VALUES ('t0', 5), ('t1', 3), ('t2', 0), ('t3', 7)) AS v(tbl, mc))
         |SELECT m.tbl,
         |  CAST(coalesce(p.ovh_sum, 0) + m.mc * $ms AS BIGINT) AS full_scan_before,
         |  CAST(coalesce(p.after_sum, 0) AS BIGINT) AS full_scan_after,
         |  CAST(CASE WHEN coalesce(so.red, 0) > 0 THEN so.ovh ELSE 0 END AS BIGINT) AS worst_scan_before,
         |  CAST(CASE WHEN coalesce(so.red, 0) > 0 THEN so.after_overhead ELSE 0 END AS BIGINT) AS worst_scan_after,
         |  CAST(coalesce(p.fc_sum, 0) AS BIGINT) AS file_count_before,
         |  CAST(coalesce(p.ng_sum, 0) AS BIGINT) AS file_count_after,
         |  CAST(CASE WHEN coalesce(fc.red, 0) > 0 THEN fc.fc ELSE 0 END AS BIGINT) AS worst_fc_before,
         |  CAST(CASE WHEN coalesce(fc.red, 0) > 0 THEN fc.n_groups ELSE 0 END AS BIGINT) AS worst_fc_after,
         |  round(CASE WHEN coalesce(p.dc_sum, 0) = 0 THEN 0.0
         |        ELSE CAST(p.dsz_sum AS DOUBLE) / p.dc_sum END, 4) AS avg_data_size,
         |  round(coalesce(p.wavg, 0.0), 4) AS worst_avg_size,
         |  CAST(coalesce(p.tsz_sum, 0) AS BIGINT) AS total_size,
         |  CAST(coalesce(p.max_tsz, 0) AS BIGINT) AS largest_partition,
         |  CAST(coalesce(p.n_pk, 0) AS BIGINT) AS n_partitions
         |FROM mani m
         |LEFT JOIN per_tbl p ON p.tbl = m.tbl
         |LEFT JOIN wfc fc ON fc.tbl = m.tbl
         |LEFT JOIN wso so ON so.tbl = m.tbl
         |ORDER BY m.tbl""".stripMargin
    },

    "q99_resample_ffill" ->
      """WITH dedup AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, max_by(value, event_id) AS value
        |  FROM events GROUP BY 1, 2),
        |bounds AS (
        |  SELECT user_id, (min(ts_us) + 21600000000 - 1) // 21600000000 AS h0,
        |         max(ts_us) // 21600000000 AS h1
        |  FROM dedup GROUP BY user_id),
        |grid AS (
        |  SELECT user_id, CAST(unnest(range(h0, h1 + 1)) * 21600000000 AS BIGINT) AS grid_us
        |  FROM bounds)
        |SELECT g.user_id, g.grid_us, s.value AS filled
        |FROM grid g
        |ASOF LEFT JOIN dedup s
        |  ON s.user_id = g.user_id AND s.ts_us <= g.grid_us
        |ORDER BY g.user_id, g.grid_us""".stripMargin,

    "q90_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT l_returnflag AS flag,
        |    CAST('0x' || substring(md5('kmv:' || CAST(l_partkey AS VARCHAR)), 1, 7) AS BIGINT) AS h
        |  FROM lineitem),
        |r AS (SELECT flag, h, row_number() OVER (PARTITION BY flag ORDER BY h) AS rn FROM h),
        |ex AS (SELECT flag, CAST(count(*) AS BIGINT) AS exact_distinct FROM h GROUP BY flag),
        |kth AS (SELECT flag, h AS hk FROM r WHERE rn = 64)
        |SELECT ex.flag, ex.exact_distinct,
        |  CAST(CASE WHEN kth.hk IS NULL THEN ex.exact_distinct
        |       ELSE (63 * CAST(268435456 AS BIGINT)) // kth.hk END AS BIGINT) AS kmv_est,
        |  round(CAST(abs((CASE WHEN kth.hk IS NULL THEN ex.exact_distinct
        |       ELSE (63 * CAST(268435456 AS BIGINT)) // kth.hk END) - ex.exact_distinct) AS DOUBLE)
        |    / ex.exact_distinct, 4) AS rel_err
        |FROM ex LEFT JOIN kth ON ex.flag = kth.flag ORDER BY ex.flag""".stripMargin,

    "q91_part_pagerank" ->
      """WITH e AS (
        |  SELECT DISTINCT a.l_orderkey AS o, a.l_partkey AS src, b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |  WHERE a.l_partkey <> b.l_partkey),
        |edges AS (SELECT src, dst FROM e),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
        |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
        |c1 AS (SELECT dst, sum(r // deg) AS s FROM edges
        |       JOIN deg USING (src) JOIN r0 ON r0.node = edges.src GROUP BY dst),
        |r1 AS (SELECT node, 150000 + (85 * coalesce(s, 0)) // 100 AS r
        |       FROM r0 LEFT JOIN c1 ON c1.dst = r0.node),
        |c2 AS (SELECT dst, sum(r // deg) AS s FROM edges
        |       JOIN deg USING (src) JOIN r1 ON r1.node = edges.src GROUP BY dst),
        |r2 AS (SELECT node, 150000 + (85 * coalesce(s, 0)) // 100 AS r
        |       FROM r1 LEFT JOIN c2 ON c2.dst = r1.node),
        |c3 AS (SELECT dst, sum(r // deg) AS s FROM edges
        |       JOIN deg USING (src) JOIN r2 ON r2.node = edges.src GROUP BY dst),
        |r3 AS (SELECT node, 150000 + (85 * coalesce(s, 0)) // 100 AS r
        |       FROM r2 LEFT JOIN c3 ON c3.dst = r2.node)
        |SELECT node AS part, CAST(r AS BIGINT) AS rank
        |FROM r3 ORDER BY rank DESC, part LIMIT 20""".stripMargin,

    "q89_split_assignment" ->
      """WITH assigned AS (
        |  SELECT lang, n_chars,
        |    CASE WHEN h < 8 THEN 'train' WHEN h = 8 THEN 'val' ELSE 'test' END AS split
        |  FROM (SELECT lang, n_chars,
        |          CAST('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) % 10 AS h
        |        FROM documents)),
        |g AS (
        |  SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |  FROM assigned GROUP BY lang, split)
        |SELECT lang, split, n_docs, sum_chars,
        |  round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (PARTITION BY lang), 4)
        |    AS lang_share
        |FROM g ORDER BY lang, split""".stripMargin
  )
}
