package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-2 operator families: clustering dedup, deterministic sampling,
  * hopping windows, funnel/sequence analysis, corpus top-k, histograms, and
  * IVF-style ANN — same oracle-parity conventions as [[Queries]].
  */
object Queries2 {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    Rel.t(dir, name)

  private def events(dir: String)(implicit s: SparkSession): DataFrame =
    Rel.events(dir)

  /** Same dedup corpus as q21/q22 ([[DedupCorpus]]) — shared, because q42's
    * oracle parity depends on identical twins and permutations. */
  private def corpus(dir: String)(implicit s: SparkSession): DataFrame =
    DedupCorpus.corpus(dir)

  private val P = DedupCorpus.P
  private val A = DedupCorpus.A
  private val B = DedupCorpus.B

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- near-dup CLUSTERS: connected components over LSH candidate pairs.
    // The full dedup pipeline a training corpus needs: LSH prefilter (q22)
    // gives pairwise edges; components give transitive duplicate groups; one
    // canonical doc (min id) survives per group. Min-label propagation:
    // each round is one distributed join+agg, state truncated per round
    // (localCheckpoint) so lineage stays bounded at any scale; rounds =
    // O(component diameter), which for dedup graphs is small.
    "q42_dedup_clusters" -> { (s, dir) => implicit val sp = s
      val sigs = TextOps.minhashSignatures(corpus(dir), "doc_id", "text", A.zip(B), P)
      val pairs = TextOps.lshCandidatePairs(sigs, "doc_id", nPerms = A.size, rowsPerBand = 4)
      val labels = ClusterOps.connectedComponents(pairs, "id_a", "id_b")
      // cluster size as a window count: one exchange on cluster_id instead
      // of the groupBy+join double-shuffle of the same tiny relation
      labels.select(col("id").as("doc_id"), col("cluster_id"),
          count(lit(1)).over(Window.partitionBy(col("cluster_id"))).as("cluster_size"))
        .orderBy(col("doc_id"))
    },

    // ---- deterministic stratified sampling: EXACT ceil(10%) per stratum,
    // rank-by-portable-hash inside each stratum (reproducible across
    // engines/runs, unlike Bernoulli rand()). One window pass per stratum.
    "q43_stratified_sample" -> { (s, dir) => implicit val sp = s
      val h = TextOps.portableHash28(concat(lit("s:"), col("doc_id")))
      val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
      t(dir, "documents")
        .select(col("doc_id"), col("lang"), h.as("h"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n_stratum", count(lit(1)).over(Window.partitionBy(col("lang"))))
        .filter(col("rn") <= ceil(col("n_stratum") / 10.0))
        .select(col("doc_id"), col("lang"), col("rn"))
        .orderBy(col("doc_id"))
    },

    // ---- hopping (sliding) event-time windows: 1h length, 30m hop — each
    // event lands in 2 windows. The batch twin of the streaming hop window.
    "q44_sliding_windows" -> { (s, dir) => implicit val sp = s
      events(dir)
        .groupBy(window(col("tsx"), "1 hour", "30 minutes").as("win"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(unix_micros(col("win.start")).as("window_start_us"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy(col("window_start_us"), col("event_type"))
    },

    // ---- funnel / sequence analysis: per user, first signup, then first
    // purchase at-or-after it; converted = within 1h. Two aggregations over
    // the same shuffle key (user_id) — AQE coalesces; no windows needed.
    "q45_funnel" -> { (s, dir) => implicit val sp = s
      val ev = events(dir)
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("signup_us"))
      val firstPurchase = ev.filter(col("event_type") === "purchase")
        .join(signups, "user_id")
        .filter(col("ts_us") >= col("signup_us"))
        .groupBy(col("user_id"), col("signup_us"))
        .agg(min(col("ts_us")).as("purchase_us"))
      signups.join(firstPurchase.drop("signup_us"), Seq("user_id"), "left")
        .withColumn("converted_1h",
          when(col("purchase_us").isNotNull &&
            col("purchase_us") - col("signup_us") <= 3600000000L, 1L).otherwise(0L))
        .select(col("user_id"), col("signup_us"), col("purchase_us"), col("converted_1h"))
        .orderBy(col("user_id"))
    },

    // ---- corpus top-k: top-5 tokens per lang by occurrence count. The
    // explode is irreducible (corpus-level aggregation); partial (map-side)
    // aggregation collapses the token stream before the one shuffle.
    "q46_token_topk" -> { (s, dir) => implicit val sp = s
      val tf = t(dir, "documents")
        .select(col("lang"), explode(split(col("text"), lit(" "))).as("tok"))
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("tok"))
      tf.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("lang"), col("tok"), col("n"), col("rank"))
        .orderBy(col("lang"), col("rank"))
    },

    // ---- histogram: fixed-width price buckets (floor division — identical
    // IEEE double op on both engines; no width_bucket dependence).
    "q47_histogram" -> { (s, dir) => implicit val sp = s
      t(dir, "orders")
        .withColumn("bucket",
          expr("CAST(FLOOR(o_totalprice / 50000) AS BIGINT)"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min(col("o_totalprice")), 2).as("min_price"),
          round(max(col("o_totalprice")), 2).as("max_price"))
        .orderBy(col("bucket"))
    },

    // ---- IVF-style ANN: coarse quantizer = 4 deterministic hyperplane
    // signs => 16 cells; search only the query's own cell (nprobe=1). The
    // 100 TB scale path: candidate generation becomes an equi-join on the
    // cell id; recall < 1 by design and the oracle models the IDENTICAL
    // search, so results still hash-match.
    "q49_ivf_topk" -> { (s, dir) => implicit val sp = s
      val cell = AnnOps.signatureColumns("qe", bands = 1, planesPerBand = 4, dims = 64).head
      val e = t(dir, "embeddings")
        .select(col("vec_id"), AnnOps.quantize(col("embedding")).as("qe"))
        .withColumn("cell", cell)
      val probes = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("qe").as("qa"), col("cell"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("dot").desc, col("neighbor_id"))
      e.select(col("vec_id").as("neighbor_id"), col("qe").as("qb"), col("cell"))
        .join(broadcast(probes), Seq("cell"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("dot", AnnOps.dotQ(col("qa"), col("qb")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("neighbor_id"), col("dot"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    },

    // ---- partial-overlap containment: |fp(A) ∩ fp(B)| / |fp(A)| over
    // winnowing fingerprints — detects docs CONTAINED in others (plagiarism/
    // quote detection), which symmetric Jaccard misses. Directed pairs.
    "q50_containment" -> { (s, dir) => implicit val sp = s
      val sub = corpus(dir).filter(col("doc_id") % 100000 < 150)
      val fps = sub.select(col("doc_id"),
        explode(graft.functions.TextHashExprs.winnowFingerprints(
          split(col("text"), " "))).as("wmin"))
      val counts = fps.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = fps.select(col("doc_id").as("doc_a"), col("wmin"))
        .join(fps.select(col("doc_id").as("doc_b"), col("wmin")), Seq("wmin"))
        .filter(col("doc_a") =!= col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      inter
        .join(counts.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
        .withColumn("containment", round(col("inter").cast("double") / col("na"), 4))
        .filter(col("containment") >= 0.6)
        .select(col("doc_a"), col("doc_b"), col("containment"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // ---- RANGE-frame window: per customer, orders within the PRECEDING
    // 30 days (value-based frame over an epoch-day axis — the window family
    // ROWS frames can't express).
    "q51_range_frame" -> { (s, dir) => implicit val sp = s
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("day_num"))
        .rangeBetween(-30, Window.currentRow)
      t(dir, "orders")
        .filter(col("o_custkey") <= 100)
        .withColumn("day_num", datediff(col("o_orderdate"), lit("1992-01-01")).cast("long"))
        .withColumn("n_30d", count(lit(1)).over(w))
        .withColumn("sum_30d", round(sum(col("o_totalprice")).over(w), 2))
        .select(col("o_custkey"), col("o_orderkey"), col("day_num"),
          col("n_30d"), col("sum_30d"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // ---- top-k per group via a typed UDAF (bounded-buffer Aggregator):
    // same result as q9's window formulation, but the PARTIAL aggregate
    // already caps each map partition at k rows per group before the
    // shuffle — the window version shuffles and sorts EVERY row. Same
    // oracle as q9 modulo k.
    "q54_topk_agg" -> { (s, dir) => implicit val sp = s
      val topk = udaf(new graft.functions.TopKAggregator.TopK(3))
      t(dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
        .select(col("o_custkey"), posexplode(col("top")).as(Seq("idx", "t")))
        .select(col("o_custkey"), col("t.tiebreak").as("o_orderkey"),
          round(col("t.value"), 2).as("totalprice"),
          (col("idx") + 1).cast("long").as("rank"))
        .orderBy(col("o_custkey"), col("rank"))
    },

    // ---- skewed aggregation via explicit salting: 50% of rows land on one
    // hot key; the two-phase (key, salt) -> (key) rollup spreads the hot
    // key across partitions. Result identical to the plain GROUP BY — the
    // oracle gate proves it.
    "q58_skew_agg" -> { (s, dir) => implicit val sp = s
      val skewed = t(dir, "orders")
        .withColumn("key", when(col("o_custkey") % 10 < 5, 0L).otherwise(col("o_custkey")))
      JoinOps.saltedCountSum(skewed, "key", "o_totalprice", col("o_orderkey"))
        .select(col("key"), col("cnt"), round(col("sum"), 2).as("sum_price"))
        .orderBy(col("key"))
    },

    // ---- range (interval) join via bucketed equi-join: point-in-interval
    // as an equi-join on covering bucket ids + residual predicate — the
    // theta join never materializes.
    "q59_range_join" -> { (s, dir) => implicit val sp = s
      val points = t(dir, "customer")
        .select(col("c_custkey"), (col("c_custkey") % 1000).cast("long").as("p"))
      val iv = t(dir, "supplier")
        .select(col("s_suppkey"), ((col("s_suppkey") * 37) % 900).cast("long").as("lo"))
        .withColumn("hi", col("lo") + 25)
      JoinOps.rangeJoin(points, "p", iv, "lo", "hi", bucket = 16)
        .groupBy(col("s_suppkey")).agg(count(lit(1)).as("n_points"))
        .orderBy(col("s_suppkey"))
    },

    // ---- the capstone cleaning pipeline: quality gate + language gate +
    // token bounds + exact dedup (keep lowest id per content hash), one
    // query — the composition a training corpus actually ships through.
    // One scan, one narrow shuffle (the dedup window on content_hash).
    "q57_corpus_clean" -> { (s, dir) => implicit val sp = s
      val withFeatures = t(dir, "documents")
        .withColumn("p", concat(lit(" "), col("text"), lit(" ")))
        .withColumn("n_tokens", TextOps.tokenCount(col("text")))
        .withColumn("stop_hits", TextOps.occurrences(col("p"), " the "))
        .withColumn("quality", round(
          least(lit(1.0), col("n_tokens").cast("double") / 50.0) * 0.5 +
          least(lit(1.0), col("stop_hits").cast("double") * 5.0 / col("n_tokens")) * 0.5, 4))
        .withColumn("en_hits", TextOps.englishStopwordHits(col("text")))
      val w = Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))
      withFeatures
        .filter(col("quality") >= 0.3 && col("en_hits") >= 1 &&
          col("n_tokens").between(10, 500))
        .withColumn("content_hash", md5(col("text")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("n_tokens"), col("quality"))
        .orderBy(col("doc_id"))
    },

    // ---- CUBE: the remaining grouping-set family (q11 covers ROLLUP) —
    // all four (returnflag × linestatus) marginal combinations in one pass.
    "q55_cube" -> { (s, dir) => implicit val sp = s
      t(dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // ---- inverted index: token → (df, sorted posting list). Postings as a
    // STRING (not array — arrays break the gate's row sort) built
    // deterministically; the index is the retrieval-side core of a corpus
    // pipeline. Map-side combine collapses (token, doc) dups pre-shuffle.
    "q56_inverted_index" -> { (s, dir) => implicit val sp = s
      t(dir, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"), explode(split(col("text"), lit(" "))).as("token"))
        .distinct()
        .groupBy(col("token"))
        .agg(count(lit(1)).as("df"),
          concat_ws(",", transform(sort_array(collect_list(col("doc_id"))),
            x => x.cast("string"))).as("postings"))
        .orderBy(col("token"))
    },

    // ---- snapshot diff (CDC shape): row-level Inserted/Deleted/Updated
    // between two table snapshots via ONE full-outer join on the key.
    // Snapshot B is derived deterministically from A inside the query
    // (deletes %97, updates %101, inserts %103) on both engines.
    "q52_snapshot_diff" -> { (s, dir) => implicit val sp = s
      val a = t(dir, "orders")
        .select(col("o_orderkey").as("key"), round(col("o_totalprice"), 2).as("price"))
      val b = a.filter(col("key") % 97 =!= 0)
        .withColumn("price",
          when(col("key") % 101 === 0, round(col("price") + 1, 2)).otherwise(col("price")))
        .unionByName(a.filter(col("key") % 103 === 0)
          .select((col("key") + 1000000000L).as("key"), col("price")))
      a.select(col("key"), col("price").as("price_a"))
        .join(b.select(col("key"), col("price").as("price_b")), Seq("key"), "full_outer")
        .withColumn("change",
          when(col("price_b").isNull, lit("D"))
            .when(col("price_a").isNull, lit("I"))
            .when(col("price_a") =!= col("price_b"), lit("U")))
        .filter(col("change").isNotNull)
        .select(col("key"), col("change"))
        .orderBy(col("key"))
    },

    // ---- min/max file pruning estimate: the data-lake scan optimization
    // the metrics engine models — per-"file" (bucket) min/max stats decide
    // which files a predicate can skip without reading.
    "q53_pruning_estimate" -> { (s, dir) => implicit val sp = s
      val stats = t(dir, "lineitem")
        .groupBy(col("l_returnflag").as("pk"), (col("l_orderkey") % 50).as("bucket"))
        .agg(max(col("l_extendedprice")).as("max_price"),
          min(col("l_extendedprice")).as("min_price"))
      stats.groupBy(col("pk"))
        .agg(count(lit(1)).as("n_files"),
          count(when(col("max_price") <= 80000.0, 1)).as("n_skipped"))
        .withColumn("skip_ratio",
          round(col("n_skipped").cast("double") / col("n_files"), 4))
        .orderBy(col("pk"))
    },

    // ---- multimodal binary columns: documents as opaque BLOBs with typed
    // metadata extracted portably (size, head bytes, tail checksum). Decode
    // beyond metadata lives in graft.multimodal (stub codec, real plumbing).
    "q48_media_stats" -> { (s, dir) => implicit val sp = s
      t(dir, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .select(col("doc_id"),
          length(col("payload")).cast("long").as("n_bytes"),
          lower(substring(hex(col("payload")), 1, 8)).as("head_hex"),
          expr("ascii(substring(text, length(text), 1))").cast("long").as("tail_byte"))
        .orderBy(col("doc_id"))
    })

  private def minhashAggsSql = DedupCorpus.minhashAggsSql

  private val corpusSql = DedupCorpus.corpusSql

  private val shingleHashesSql = DedupCorpus.shingleHashesSql

  def oracles: Map[String, String] = Map(
    "q42_dedup_clusters" ->
      s"""WITH RECURSIVE corpus AS ($corpusSql),
         |sigs AS (SELECT doc_id, $minhashAggsSql
         |         FROM ($shingleHashesSql) GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, 0 AS band,
         |    concat(mh0, '_', mh1, '_', mh2, '_', mh3) AS bkey FROM sigs
         |  UNION ALL
         |  SELECT doc_id, 1 AS band,
         |    concat(mh4, '_', mh5, '_', mh6, '_', mh7) AS bkey FROM sigs),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
         |    AND a.doc_id < b.doc_id),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach AS (
         |  SELECT id, id AS r FROM nodes
         |  UNION
         |  SELECT e.dst AS id, reach.r FROM reach JOIN edges e ON e.src = reach.id),
         |comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
         |sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id)
         |SELECT comp.id AS doc_id, comp.cluster_id, sizes.cluster_size
         |FROM comp JOIN sizes USING (cluster_id)
         |ORDER BY doc_id""".stripMargin,
    "q43_stratified_sample" ->
      """SELECT doc_id, lang, rn FROM (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS BIGINT) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n_stratum
        |  FROM (SELECT doc_id, lang,
        |          CAST('0x' || substring(md5('s:' || doc_id), 1, 7) AS BIGINT) AS h
        |        FROM documents))
        |WHERE rn <= ceil(n_stratum / 10.0) ORDER BY doc_id""".stripMargin,
    "q44_sliding_windows" ->
      """WITH starts AS (
        |  SELECT event_type, value,
        |    unnest(ARRAY[time_bucket(INTERVAL '30 minutes', ts),
        |                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws
        |  FROM events)
        |SELECT epoch_us(ws) AS window_start_us, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM starts GROUP BY 1, 2 ORDER BY window_start_us, event_type""".stripMargin,
    "q45_funnel" ->
      """WITH signups AS (
        |  SELECT user_id, min(epoch_us(ts)) AS signup_us
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |fp AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS purchase_us
        |  FROM events e JOIN signups s ON e.user_id = s.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.signup_us
        |  GROUP BY e.user_id)
        |SELECT s.user_id, s.signup_us, fp.purchase_us,
        |  CAST(CASE WHEN fp.purchase_us IS NOT NULL
        |            AND fp.purchase_us - s.signup_us <= 3600000000
        |       THEN 1 ELSE 0 END AS BIGINT) AS converted_1h
        |FROM signups s LEFT JOIN fp ON s.user_id = fp.user_id
        |ORDER BY s.user_id""".stripMargin,
    "q46_token_topk" ->
      """WITH tf AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        |cnt AS (SELECT lang, tok, count(*) AS n FROM tf GROUP BY 1, 2),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY lang
        |        ORDER BY n DESC, tok) AS BIGINT) AS rank FROM cnt)
        |SELECT lang, tok, n, rank FROM r WHERE rank <= 5
        |ORDER BY lang, rank""".stripMargin,
    "q47_histogram" ->
      """SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
        |  count(*) AS n,
        |  round(min(o_totalprice), 2) AS min_price,
        |  round(max(o_totalprice), 2) AS max_price
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q49_ivf_topk" -> {
      val planeValues = AnnOps.planeWeights(4, 64)
        .map { case (p, d, w) => s"($p,$d,$w)" }.mkString(", ")
      s"""WITH q AS (
         |  SELECT vec_id, list_transform(embedding,
         |    v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000) AS BIGINT)) AS qe
         |  FROM embeddings),
         |planes(p, d, w) AS (VALUES $planeValues),
         |dims AS (
         |  SELECT vec_id, CAST(i - 1 AS INT) AS d, qe[i] AS x
         |  FROM (SELECT vec_id, qe, unnest(range(1, len(qe) + 1)) AS i FROM q)),
         |proj AS (
         |  SELECT vec_id, p, sum(x * w) AS s
         |  FROM dims JOIN planes USING (d) GROUP BY vec_id, p),
         |cells AS (
         |  SELECT vec_id, sum(CASE WHEN s >= 0 THEN 1 << p ELSE 0 END) AS cell
         |  FROM proj GROUP BY vec_id),
         |pairs AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |    CAST(list_sum(list_apply(range(1, len(qa.qe) + 1),
         |      i -> qa.qe[i] * qb.qe[i])) AS BIGINT) AS dot
         |  FROM cells a JOIN cells b ON a.cell = b.cell AND b.vec_id <> a.vec_id
         |  JOIN q qa ON qa.vec_id = a.vec_id
         |  JOIN q qb ON qb.vec_id = b.vec_id
         |  WHERE a.vec_id < 20),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY dot DESC, neighbor_id) AS rank FROM pairs)
         |SELECT query_id, neighbor_id, dot, CAST(rank AS BIGINT) AS rank
         |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
    },
    "q50_containment" ->
      s"""WITH corpus AS ($corpusSql),
         |sub AS (SELECT * FROM corpus WHERE doc_id % 100000 < 150),
         |shs AS (
         |  SELECT doc_id, list_transform(
         |    range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
         |    i -> string_split(text, ' ')[i] || ' ' ||
         |      string_split(text, ' ')[i+1] || ' ' ||
         |      string_split(text, ' ')[i+2]) AS shl
         |  FROM sub),
         |hashed AS (
         |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS idx,
         |    CAST('0x' || substring(md5(shl[i]), 1, 7) AS BIGINT) AS h
         |  FROM (SELECT doc_id, shl, unnest(range(1, len(shl) + 1)) AS i FROM shs)),
         |win AS (
         |  SELECT doc_id, idx,
         |    min(h) OVER (PARTITION BY doc_id ORDER BY idx
         |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
         |    count(*) OVER (PARTITION BY doc_id) AS n
         |  FROM hashed),
         |fps AS (SELECT DISTINCT doc_id, wmin FROM win WHERE idx <= n - 4),
         |counts AS (SELECT doc_id, count(*) AS n FROM fps GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM fps a JOIN fps b ON a.wmin = b.wmin AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  round(CAST(inter AS DOUBLE) / ca.n, 4) AS containment
         |FROM inter JOIN counts ca ON ca.doc_id = doc_a
         |WHERE round(CAST(inter AS DOUBLE) / ca.n, 4) >= 0.6
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q51_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(date_diff('day', TIMESTAMP '1992-01-01', o_orderdate) AS BIGINT) AS day_num,
        |  count(*) OVER w AS n_30d,
        |  round(sum(o_totalprice) OVER w, 2) AS sum_30d
        |FROM orders WHERE o_custkey <= 100
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY CAST(date_diff('day', TIMESTAMP '1992-01-01', o_orderdate) AS BIGINT)
        |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q58_skew_agg" ->
      """SELECT key, count(*) AS cnt, round(sum(o_totalprice), 2) AS sum_price
        |FROM (SELECT CASE WHEN o_custkey % 10 < 5 THEN 0 ELSE o_custkey END AS key,
        |             o_totalprice
        |      FROM orders)
        |GROUP BY key ORDER BY key""".stripMargin,
    "q59_range_join" ->
      """WITH points AS (
        |  SELECT c_custkey, CAST(c_custkey % 1000 AS BIGINT) AS p FROM customer),
        |iv AS (
        |  SELECT s_suppkey, CAST((s_suppkey * 37) % 900 AS BIGINT) AS lo,
        |         CAST((s_suppkey * 37) % 900 + 25 AS BIGINT) AS hi
        |  FROM supplier)
        |SELECT s_suppkey, count(*) AS n_points
        |FROM points JOIN iv ON p >= lo AND p < hi
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin,
    "q57_corpus_clean" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
        |    CAST((length(' ' || text || ' ') -
        |          length(replace(' ' || text || ' ', ' the ', ''))) // 5 AS BIGINT) AS stop_hits,
        |    CAST((length(' ' || text || ' ') -
        |          length(replace(' ' || text || ' ', ' the ', ''))) // 5 +
        |         (length(' ' || text || ' ') -
        |          length(replace(' ' || text || ' ', ' a ', ''))) // 3 AS BIGINT) AS en_hits
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, text, n_tokens, en_hits,
        |    round(least(1.0, CAST(n_tokens AS DOUBLE) / 50.0) * 0.5 +
        |          least(1.0, CAST(stop_hits AS DOUBLE) * 5.0 / n_tokens) * 0.5, 4) AS quality
        |  FROM f),
        |gated AS (
        |  SELECT doc_id, n_tokens, quality, md5(text) AS content_hash
        |  FROM scored
        |  WHERE quality >= 0.3 AND en_hits >= 1 AND n_tokens BETWEEN 10 AND 500),
        |deduped AS (
        |  SELECT doc_id, n_tokens, quality,
        |    row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
        |  FROM gated)
        |SELECT doc_id, n_tokens, quality FROM deduped WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,
    "q55_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q56_inverted_index" ->
      """SELECT token, count(*) AS df,
        |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        |FROM (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents WHERE doc_id < 50)
        |GROUP BY token ORDER BY token""".stripMargin,
    "q54_topk_agg" ->
      """SELECT o_custkey, o_orderkey, totalprice, rank FROM (
        |  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |  FROM orders) WHERE rank <= 3 ORDER BY o_custkey, rank""".stripMargin,
    "q52_snapshot_diff" ->
      """WITH a AS (
        |  SELECT o_orderkey AS key, round(o_totalprice, 2) AS price FROM orders),
        |b AS (
        |  SELECT key,
        |    CASE WHEN key % 101 = 0 THEN round(price + 1, 2) ELSE price END AS price
        |  FROM a WHERE key % 97 <> 0
        |  UNION ALL
        |  SELECT key + 1000000000, price FROM a WHERE key % 103 = 0),
        |d AS (
        |  SELECT coalesce(a.key, b.key) AS key,
        |    CASE WHEN b.key IS NULL THEN 'D'
        |         WHEN a.key IS NULL THEN 'I'
        |         WHEN a.price <> b.price THEN 'U' END AS change
        |  FROM a FULL OUTER JOIN b ON a.key = b.key)
        |SELECT key, change FROM d WHERE change IS NOT NULL ORDER BY key""".stripMargin,
    "q53_pruning_estimate" ->
      """WITH stats AS (
        |  SELECT l_returnflag AS pk, l_orderkey % 50 AS bucket,
        |    max(l_extendedprice) AS max_price, min(l_extendedprice) AS min_price
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT pk, count(*) AS n_files,
        |  count(CASE WHEN max_price <= 80000.0 THEN 1 END) AS n_skipped,
        |  round(CAST(count(CASE WHEN max_price <= 80000.0 THEN 1 END) AS DOUBLE)
        |        / count(*), 4) AS skip_ratio
        |FROM stats GROUP BY pk ORDER BY pk""".stripMargin,
    "q48_media_stats" ->
      """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  lower(substring(hex(CAST(text AS BLOB)), 1, 8)) AS head_hex,
        |  CAST(ascii(substring(text, length(text), 1)) AS BIGINT) AS tail_byte
        |FROM documents ORDER BY doc_id""".stripMargin)
}
