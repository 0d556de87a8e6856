package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-3 operator families: benchmark decontamination (n-gram overlap
  * against an eval set + clean-corpus anti-join), Gopher-style repetition
  * quality metrics, deterministic weighted sampling, event-transition
  * (Markov) analysis, GROUPING SETS, rank-family windows, and sketch
  * accuracy validation. Same oracle-parity conventions as [[Queries]]:
  * identical column aliases on both sides, CAST integer sums to BIGINT,
  * FLOOR before int casts, full ORDER BY tie-breaks.
  */
object Queries3 {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    Rel.t(dir, name)

  private def events(dir: String)(implicit s: SparkSession): DataFrame =
    Rel.events(dir)

  // ---------------------------------------------------------------- shared
  // Decontamination fixture: the corpus has no real eval-set leakage, so
  // (like the dedup twins) contamination is SYNTHESIZED deterministically —
  // see [[DecontFixture]] (one definition shared with q74/q75/q80). The
  // detector must not know the fixture — it finds overlap purely via
  // 8-gram shingle-hash equi-join.
  private val NGram = DecontFixture.NGram
  private val OverlapMin = DecontFixture.OverlapMin

  private def evalSet(dir: String)(implicit s: SparkSession): DataFrame =
    DecontFixture.evalDocs(dir)

  private def trainSet(dir: String)(implicit s: SparkSession): DataFrame =
    DecontFixture.trainDocs(dir)

  private def shingleHashes(df: DataFrame): DataFrame =
    DecontFixture.shingleHashes(df)

  private val evalSql = DecontFixture.evalSql
  private val trainSql = DecontFixture.trainSql

  private def shingleHashesSql(rel: String): String =
    DecontFixture.shingleHashesSql(rel)

  /** Shared contamination-pairs SQL (train_doc_id, eval_doc_id, n_overlap). */
  private val overlapSql =
    s"""SELECT tr.doc_id AS train_doc_id, ev.doc_id AS eval_doc_id,
       |    CAST(count(*) AS BIGINT) AS n_overlap
       |  FROM (${shingleHashesSql("train")}) tr
       |  JOIN (${shingleHashesSql("eval")}) ev ON tr.h = ev.h
       |  GROUP BY 1, 2 HAVING count(*) >= $OverlapMin""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- benchmark decontamination: which training docs leak eval-set
    // content? 8-gram shingle-hash equi-join (never a cross join). No explicit
    // broadcast hint: the eval side is 1/97 of the corpus, which at fixture
    // scale AQE broadcasts on its own, but at 100 TB is ~1 TB of shingle
    // hashes — far past the 8 GB broadcast-relation limit — so the plan must
    // be allowed to fall back to a shuffled hash join.
    "q60_decontamination" -> { (s, dir) => implicit val sp = s
      val tr = shingleHashes(trainSet(dir))
      val ev = shingleHashes(evalSet(dir))
      tr.join(ev.withColumnRenamed("doc_id", "eval_doc_id"), "h")
        .groupBy(col("doc_id").as("train_doc_id"), col("eval_doc_id"))
        .agg(count(lit(1)).as("n_overlap"))
        .filter(col("n_overlap") >= OverlapMin)
        .orderBy(col("train_doc_id"), col("eval_doc_id"))
    },

    // ---- Gopher-style repetition/quality metrics, entirely as projections
    // over the token array (type-token ratio, duplicate-bigram fraction)
    // plus ONE token-level aggregation for the top-token share. The array
    // metrics never shuffle; the top-token agg is the only exchange.
    "q61_repetition_quality" -> { (s, dir) => implicit val sp = s
      val docs = t(dir, "documents")
        .withColumn("toks", split(col("text"), lit(" ")))
        .withColumn("bigrams", TextOps.shinglesFromTokens(col("toks"), 2))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          size(array_distinct(col("toks"))).cast("long").as("n_types"),
          greatest(size(col("toks")) - 1, lit(0)).cast("long").as("n_bigrams"),
          size(col("bigrams")).cast("long").as("n_distinct_bigrams"))
      val top = t(dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), lit(" "))).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("n"))
        .groupBy(col("doc_id")).agg(max(col("n")).as("top_tok_n"))
      docs.join(top, "doc_id")
        .select(col("doc_id"), col("n_tokens"),
          round(col("n_types").cast("double") / col("n_tokens"), 4).as("ttr"),
          round(lit(1.0) - col("n_distinct_bigrams").cast("double")
            / greatest(col("n_bigrams"), lit(1L)), 4).as("dup_bigram_frac"),
          round(col("top_tok_n").cast("double") / col("n_tokens"), 4).as("top_tok_frac"))
        .orderBy(col("doc_id"))
    },

    // ---- deterministic weighted sampling: Bernoulli keep with probability
    // proportional to doc length (capped), driven by a portable hash instead
    // of rand() — reproducible across engines, runs, and partitionings; at
    // scale this is a stateless filter (no shuffle at all).
    "q62_weighted_sample" -> { (s, dir) => implicit val sp = s
      t(dir, "documents")
        .withColumn("n_tokens", TextOps.tokenCount(col("text")))
        .withColumn("w", least(col("n_tokens"), lit(400L)))
        .withColumn("u", TextOps.portableHash28(
          concat(lit("w:"), col("doc_id").cast("string"))) % 1000000L)
        .filter(col("u") < col("w") * 2000L)
        .select(col("doc_id"), col("lang"), col("n_tokens"))
        .orderBy(col("doc_id"))
    },

    // ---- event-transition (Markov) analysis: per user the event sequence
    // ordered by time, transition counts and per-source probabilities. One
    // window pass (shuffle on user_id) + one aggregation.
    "q63_transitions" -> { (s, dir) => implicit val sp = s
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      events(dir)
        .withColumn("dst_type", lead(col("event_type"), 1).over(w))
        .filter(col("dst_type").isNotNull)
        .groupBy(col("event_type").as("src_type"), col("dst_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p", round(col("n").cast("double")
          / sum(col("n")).over(Window.partitionBy(col("src_type"))), 4))
        .orderBy(col("src_type"), col("dst_type"))
    },

    // ---- GROUPING SETS beyond rollup/cube hierarchies: region×priority,
    // region-only, and priority-only marginals in one pass (Spark expands to
    // a single Expand + hash aggregate — one shuffle for all three sets).
    "q64_grouping_sets" -> { (s, dir) => implicit val sp = s
      val joined = t(dir, "orders")
        .join(t(dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(dir, "region")), col("n_regionkey") === col("r_regionkey"))
      joined.groupingSets(
          Seq(Seq(col("r_name"), col("o_orderpriority")), Seq(col("r_name")),
            Seq(col("o_orderpriority"))),
          col("r_name"), col("o_orderpriority"))
        .agg((grouping(col("r_name")) * 2 + grouping(col("o_orderpriority")))
            .cast("long").as("gid"),
          count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("revenue"))
        .select(col("gid"), col("r_name"), col("o_orderpriority"), col("n"), col("revenue"))
        .orderBy(col("gid"), col("r_name").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // ---- rank-family windows: percent_rank / cume_dist / lag delta over
    // the high-value order stratum, partitioned by priority. Raw doubles, no
    // round(): (rank-1)/(n-1), rank/n, and a-b are single IEEE ops with
    // identical operand order on both engines so they compare bit-exactly,
    // whereas round() HALF_UP on the shortest decimal repr (Spark) vs
    // binary-double rounding (DuckDB) diverges at the rounded digit.
    "q65_rank_windows" -> { (s, dir) => implicit val sp = s
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(dir, "orders").filter(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice").as("price"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("prev_diff"))
        .orderBy(col("o_orderkey"))
    },

    // ---- sketch accuracy validation: minhash Jaccard estimate vs exact
    // 3-gram Jaccard on the synthesized twin pairs — the quality gate a
    // production dedup pipeline runs before trusting LSH parameters.
    "q66_minhash_accuracy" -> { (s, dir) => implicit val sp = s
      val sub = DedupCorpus.corpus(dir).filter(col("doc_id") % 100000 < 300)
      val sigs = TextOps.minhashSignatures(sub, "doc_id", "text",
        DedupCorpus.A.zip(DedupCorpus.B), DedupCorpus.P)
      val a = sigs.select(col("doc_id") +:
        DedupCorpus.A.indices.map(j => col(s"mh$j").as(s"a$j")): _*)
      val b = sigs.select((col("doc_id") - 100000).as("doc_id") +:
        DedupCorpus.A.indices.map(j => col(s"mh$j").as(s"b$j")): _*)
      val est = a.join(b, "doc_id").select(col("doc_id"),
        (DedupCorpus.A.indices.map(j =>
          when(col(s"a$j") === col(s"b$j"), 1).otherwise(0): Column)
          .reduce(_ + _).cast("double") / lit(DedupCorpus.A.size.toDouble)).as("est0"))
      val sh = sub
        .withColumn("toks", split(col("text"), lit(" ")))
        .select(col("doc_id"), explode(TextOps.shinglesFromTokens(col("toks"), 3)).as("sh"))
      val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = sh.join(
          sh.select((col("doc_id") - 100000).as("doc_id"), col("sh")), Seq("doc_id", "sh"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("inter"))
      est.join(inter, "doc_id")
        .join(counts.select(col("doc_id"), col("n").as("na")), "doc_id")
        .join(counts.select((col("doc_id") - 100000).as("doc_id"), col("n").as("nb")), "doc_id")
        .withColumn("jac0", col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
        .select(col("doc_id"),
          round(col("est0"), 4).as("est_jaccard"),
          round(col("jac0"), 4).as("jaccard"),
          round(abs(col("est0") - col("jac0")), 4).as("abs_err"))
        .orderBy(col("doc_id"))
    },

    // ---- the decontaminated corpus: training set minus every doc the q60
    // detector flagged, reported per language (left anti-join shape). As in
    // q60, no broadcast hints: AQE broadcasts the eval/flagged sides at
    // fixture scale, and at 100 TB (where the eval shingle relation is ~1 TB)
    // the plan falls back to a shuffled hash join instead of OOMing.
    "q67_decontaminated_corpus" -> { (s, dir) => implicit val sp = s
      val tr = shingleHashes(trainSet(dir))
      val ev = shingleHashes(evalSet(dir))
      val flagged = tr
        .join(ev.withColumnRenamed("doc_id", "eval_doc_id"), "h")
        .groupBy(col("doc_id"), col("eval_doc_id")).agg(count(lit(1)).as("n_overlap"))
        .filter(col("n_overlap") >= OverlapMin)
        .select(col("doc_id")).distinct()
        .withColumn("flagged", lit(1L))
      trainSet(dir).join(flagged, Seq("doc_id"), "left_outer")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_total"),
          coalesce(sum(col("flagged")), lit(0L)).as("n_removed"))
        .withColumn("n_clean", col("n_total") - col("n_removed"))
        .select(col("lang"), col("n_total"), col("n_removed"), col("n_clean"))
        .orderBy(col("lang"))
    })

  def oracles: Map[String, String] = Map(
    "q60_decontamination" ->
      s"""WITH eval AS ($evalSql),
         |train AS ($trainSql),
         |overlap AS ($overlapSql)
         |SELECT train_doc_id, eval_doc_id, n_overlap FROM overlap
         |ORDER BY train_doc_id, eval_doc_id""".stripMargin,
    "q61_repetition_quality" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
        |    CAST(greatest(len(toks) - 1, 0) AS BIGINT) AS n_bigrams,
        |    CAST(len(list_distinct(list_transform(
        |      range(1, greatest(len(toks), 1)),
        |      i -> toks[i] || ' ' || toks[i+1]))) AS BIGINT) AS n_distinct_bigrams
        |  FROM base),
        |top AS (
        |  SELECT doc_id, max(n) AS top_tok_n FROM (
        |    SELECT doc_id, tok, count(*) AS n
        |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |    GROUP BY 1, 2)
        |  GROUP BY doc_id)
        |SELECT m.doc_id, n_tokens,
        |  round(CAST(n_types AS DOUBLE) / n_tokens, 4) AS ttr,
        |  round(1.0 - CAST(n_distinct_bigrams AS DOUBLE) / greatest(n_bigrams, 1), 4)
        |    AS dup_bigram_frac,
        |  round(CAST(top_tok_n AS DOUBLE) / n_tokens, 4) AS top_tok_frac
        |FROM m JOIN top ON m.doc_id = top.doc_id
        |ORDER BY m.doc_id""".stripMargin,
    "q62_weighted_sample" ->
      """SELECT doc_id, lang, n_tokens FROM (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST('0x' || substring(md5('w:' || doc_id), 1, 7) AS BIGINT) % 1000000
        |      AS u
        |  FROM documents)
        |WHERE u < least(n_tokens, 400) * 2000
        |ORDER BY doc_id""".stripMargin,
    "q63_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS src_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS dst_type
        |  FROM events),
        |cnt AS (
        |  SELECT src_type, dst_type, CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE dst_type IS NOT NULL GROUP BY 1, 2)
        |SELECT src_type, dst_type, n,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY src_type), 4) AS p
        |FROM cnt ORDER BY src_type, dst_type""".stripMargin,
    "q64_grouping_sets" ->
      """SELECT CAST(GROUPING(r_name) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
        |  r_name, o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name, o_orderpriority), (r_name), (o_orderpriority))
        |ORDER BY gid, r_name NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q65_rank_windows" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice AS price,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  o_totalprice - lag(o_totalprice) OVER w AS prev_diff
        |FROM orders WHERE o_totalprice > 400000
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q66_minhash_accuracy" -> {
      val eqSum = DedupCorpus.A.indices
        .map(j => s"(CASE WHEN a.mh$j = b.mh$j THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH corpus AS (${DedupCorpus.corpusSql}),
         |sub AS (SELECT * FROM corpus WHERE doc_id % 100000 < 300),
         |sigs AS (SELECT doc_id, ${DedupCorpus.minhashAggsSql}
         |         FROM (${DedupCorpus.shingleHashesSql.replace("FROM corpus", "FROM sub")})
         |         GROUP BY doc_id),
         |est AS (
         |  SELECT a.doc_id, CAST($eqSum AS DOUBLE) / ${DedupCorpus.A.size}.0 AS est0
         |  FROM sigs a JOIN sigs b ON b.doc_id = a.doc_id + 100000),
         |sh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
         |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
         |         || ' ' || string_split(text, ' ')[i+2]))) AS sh
         |  FROM sub),
         |counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id, count(*) AS inter
         |  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 100000 AND a.sh = b.sh
         |  GROUP BY a.doc_id)
         |SELECT est.doc_id,
         |  round(est0, 4) AS est_jaccard,
         |  round(CAST(inter AS DOUBLE) / (ca.n + cb.n - inter), 4) AS jaccard,
         |  round(abs(est0 - CAST(inter AS DOUBLE) / (ca.n + cb.n - inter)), 4) AS abs_err
         |FROM est
         |JOIN inter ON inter.doc_id = est.doc_id
         |JOIN counts ca ON ca.doc_id = est.doc_id
         |JOIN counts cb ON cb.doc_id = est.doc_id + 100000
         |ORDER BY est.doc_id""".stripMargin
    },
    "q67_decontaminated_corpus" ->
      s"""WITH eval AS ($evalSql),
         |train AS ($trainSql),
         |overlap AS ($overlapSql),
         |flagged AS (SELECT DISTINCT train_doc_id AS doc_id, 1 AS flagged FROM overlap)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_total,
         |  CAST(coalesce(sum(flagged), 0) AS BIGINT) AS n_removed,
         |  CAST(count(*) - coalesce(sum(flagged), 0) AS BIGINT) AS n_clean
         |FROM train LEFT JOIN flagged USING (doc_id)
         |GROUP BY lang ORDER BY lang""".stripMargin)
}
