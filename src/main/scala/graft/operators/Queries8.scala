package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 batch 4: the set-similarity join done the AllPairs/PPJoin way
  * (prefix filtering turns an exact Jaccard-threshold join into an
  * equi-join on each document's RAREST tokens), n-gram language-model
  * statistics, sequence-length bucketing for training batches, hard-negative
  * mining for contrastive training, the TPC-H Q2 correlated-min shape,
  * session path mining, and content-defined chunking (the byte-level dedup
  * signal exact/MinHash dedup can't see).
  *
  * Oracle-parity conventions as in [[Queries]]: identical aliases both
  * sides, integer math where exactness matters, any double produced by ONE
  * division of exact integers (bit-equal across engines), full ORDER BY
  * tie-breaks.
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
    "q105_set_similarity_join" -> { (s, dir) => implicit val sp = s
      val dt = t(dir, "documents")
        .select(col("doc_id"), explode(TextOps.shingles(col("text"), 3)).as("w"))
      val df = dt.groupBy(col("w")).agg(count(lit(1)).as("dfc"))
      val docToks = dt.join(broadcast(df), "w")
        .groupBy(col("doc_id"))
        .agg(expr("transform(sort_array(collect_list(struct(dfc, w))), x -> x.w)").as("toks"))
        .withColumn("n", size(col("toks")).cast("long"))
        // prefix len = n - ceil(3n/5) + 1; ceil via (3n + 4) DIV 5 (n > 0)
        .withColumn("plen", expr(s"CAST(n - (n * $JacNum + ${JacDen - 1}) DIV $JacDen + 1 AS INT)"))
      val prefix = docToks.select(col("doc_id"), col("toks"), col("n"),
        explode(slice(col("toks"), lit(1), col("plen"))).as("w"))
      val cand = prefix.as("a").join(prefix.as("b"),
          col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          col("a.toks").as("ta"), col("b.toks").as("tb"),
          col("a.n").as("n_a"), col("b.n").as("n_b"))
        .dropDuplicates("id_a", "id_b")
      cand
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
    "q111_cdc_chunks" -> { (s, dir) => implicit val sp = s
      val docs = t(dir, "documents").select(col("doc_id"), col("text"))
      val cuts = docs
        .select(col("doc_id"), col("text"),
          // guard: Spark sequence(2, x) DESCENDS for x < 2 where DuckDB
          // range(2, x+1) is empty — emit no positions for texts under 9 chars
          explode(when(length(col("text")) >= 9,
            sequence(lit(2), length(col("text")) - 7))
            .otherwise(array().cast("array<int>"))).as("i"))
        .filter(TextOps.portableHash28(substring(col("text"), col("i"), lit(8))) % 16 === 0)
        .select(col("doc_id"), col("i").as("start"))
      val starts = docs.select(col("doc_id"), lit(1).as("start")).unionByName(cuts)
      val wd = Window.partitionBy(col("doc_id")).orderBy(col("start"))
      val chunks = starts.join(docs, Seq("doc_id"))
        .withColumn("nxt", lead(col("start"), 1).over(wd))
        .select(col("doc_id"),
          when(col("nxt").isNull, expr("substring(text, start)"))
            .otherwise(expr("substring(text, start, nxt - start)")).as("chunk"))
      chunks
        .groupBy(TextOps.portableHash28(col("chunk")).as("chunk_hash"))
        .agg(count(lit(1)).as("n_occ"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(length(col("chunk")).cast("long")).as("chunk_len"))
        .filter(col("n_docs") > 1)
        .orderBy(desc("n_occ"), col("chunk_hash"))
        .limit(50)
    })

  def oracles: Map[String, String] = Map(
    "q105_set_similarity_join" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |dt AS (
        |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS w
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
        |ORDER BY n_occ DESC, chunk_hash LIMIT 50""".stripMargin)
}
