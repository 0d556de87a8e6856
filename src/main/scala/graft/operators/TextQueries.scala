package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.PolyHash64
import graft.metrics.MetricsCalculator
import graft.model.EngineConfig
import graft.sources.FileEntrySource

/** Training-data pipeline operators (dedup, similarity, text analysis) plus
  * the end-to-end metadata-metrics pipeline, each with a DuckDB oracle.
  *
  * Portability rules that make these oracle-checkable:
  *   - token hash = first 7 hex digits of md5 -> int (28 bits), so every
  *     permutation `(a*h + b) % p` with a < 2^31 stays < 2^59: no int64
  *     overflow, identical in ANSI Spark and DuckDB;
  *   - all similarity scores derive from INTEGER dots/norms (quantized
  *     embeddings), so cross-engine float summation order can't bite;
  *   - near-dup corpora are made non-degenerate by synthesizing twins
  *     (drop-first-token texts, +1-perturbed vectors) deterministically
  *     inside the query on BOTH sides.
  */
object TextQueries {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    Rel.t(dir, name)

  // MinHash permutation constants ([[DedupCorpus]]): (a*h + b) % p over
  // 28-bit token hashes. 8 permutations -> 2 bands of 4 rows: on a
  // low-entropy vocabulary, 2-row bands collide pathologically (one bucket
  // held 76% of docs at sf0.1 => 35M candidate pairs); 4-row bands keep
  // buckets near-unique while twins (Jaccard ~ 1) still collide with
  // probability ~ J^4 per band.
  private val P = DedupCorpus.P
  private val A = DedupCorpus.A
  private val B = DedupCorpus.B
  private val SimBits = 16

  /** Deterministic hyperplane weights for sign-LSH over quantized
    * embeddings ([[AnnOps.planeWeights]]): w(p, d) = md5-28bit("p:d") % 2001
    * - 1000. Computed driver-side; the oracle receives the SAME values as an
    * inline VALUES table, so both engines bucket identically. */
  private lazy val planes: Seq[(Int, Int, Long)] = AnnOps.planeWeights(16, 64)

  /** Dedup corpus: originals + near-dup twins (first token dropped). */
  private def corpus(dir: String)(implicit s: SparkSession): DataFrame =
    DedupCorpus.corpus(dir)

  private val corpusSql = DedupCorpus.corpusSql

  /** doc_id, h: 28-bit portable hashes of the doc's DISTINCT 3-gram token
    * shingles (via [[TextOps.shingles]]/[[TextOps.portableHash28]]).
    * Shingles, not single tokens: on a small vocabulary every doc contains
    * the same frequent tokens, so token-level minhashes collapse to one
    * global signature (at sf0.1 that put 76% of docs in one LSH bucket);
    * 3-gram shingles give |V|^3 effective vocabulary and discriminative
    * minima. Docs with < 3 tokens yield no shingles (consistently absent on
    * both engines). */
  private def shingleHashes(c: DataFrame): DataFrame =
    c.select(col("doc_id"), split(col("text"), " ").as("__toks"))
      .select(col("doc_id"), explode(TextOps.shinglesFromTokens(col("__toks"))).as("sh"))
      .select(col("doc_id"), TextOps.portableHash28(col("sh")).as("h"))

  private val shingleHashesSql = DedupCorpus.shingleHashesSql

  private def minhashAggsSql = DedupCorpus.minhashAggsSql

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- the full metadata-metrics pipeline as one query ----
    "q20_table_metrics" -> { (s, dir) => implicit val sp = s
      // Derived file relation: one "file" per (returnflag, orderkey%200)
      // bucket, size = floor(avg(price)*1000), content cycles 0/1/2.
      val filesDf = t(dir, "lineitem")
        .groupBy(col("l_returnflag").cast("string").as("pk"),
          (col("l_orderkey") % 200).cast("int").as("bucket"))
        .agg(expr("CAST(FLOOR(avg(l_extendedprice) * 1000) AS BIGINT)").as("size"))
        .withColumn("content", (col("bucket") % 3).cast("int"))
      val files = FileEntrySource.fromDataFrame(filesDf, "files", col("pk"), col("size"), col("content"))
      val manifests = s.createDataset(Seq(("files", 0L)))(
        org.apache.spark.sql.Encoders.tuple(org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.scalaLong))
      MetricsCalculator.computeMetricsWide(files, manifests, EngineConfig.default)
        .toDF()
        .select(
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
    },

    // ---- dedup: MinHash, LSH, SimHash, n-gram Jaccard ----
    "q21_minhash_signatures" -> { (s, dir) => implicit val sp = s
      TextOps.minhashSignatures(corpus(dir), "doc_id", "text", A.zip(B), P)
        .orderBy(col("doc_id"))
    },
    "q22_lsh_candidate_pairs" -> { (s, dir) => implicit val sp = s
      // bands of 4 minhashes; same band key => candidate pair
      val sigs = TextOps.minhashSignatures(corpus(dir), "doc_id", "text", A.zip(B), P)
      TextOps.lshCandidatePairs(sigs, "doc_id", nPerms = A.size, rowsPerBand = 4)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    "q23_simhash" -> { (s, dir) => implicit val sp = s
      // 16-bit SimHash over ALL token occurrences (frequency-weighted)
      TextOps.simhash(corpus(dir), "doc_id", "text", SimBits)
        .orderBy(col("doc_id"))
    },
    "q24_ngram_jaccard_pairs" -> { (s, dir) => implicit val sp = s
      // 3-gram shingle Jaccard >= 0.5 among docs 0..199 and their twins.
      // Jaccard is computed in the HASH domain (28-bit shingle hashes via
      // the native ShingleHashes kernel): the intersection join shuffles
      // longs instead of shingle strings, which is the shape that matters
      // at corpus scale; parity with the oracle is exact because both
      // engines hash identically, so collisions (if any) are shared.
      val sub = corpus(dir).filter(col("doc_id") % 100000 < 200)
      val sh = sub.select(col("doc_id"),
        explode(graft.functions.TextHashExprs.shingleHashes(
          split(col("text"), lit(" ")), 3)).as("h"))
      val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = sh.select(col("doc_id").as("doc_a"), col("h"))
        .join(sh.select(col("doc_id").as("doc_b"), col("h")), Seq("h"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      inter
        .join(counts.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
        .join(counts.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
        .withColumn("jaccard", round(col("inter").cast("double")
          / (col("na") + col("nb") - col("inter")), 4))
        .filter(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    "q36_dedup_keep" -> { (s, dir) => implicit val sp = s
      // operational dedup: return the CLEANED corpus — one survivor (lowest
      // doc_id) per distinct content hash, via window rank over md5
      val w = Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))
      corpus(dir)
        .withColumn("content_hash", md5(col("text")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("content_hash"))
        .orderBy(col("doc_id"))
    },
    "q37_winnowing" -> { (s, dir) => implicit val sp = s
      // MOSS-style winnowing fingerprints: per doc, the DISTINCT minima of a
      // sliding window (w=4) over the ordered 3-gram shingle hash sequence.
      // Robust content fingerprints for partial-overlap detection. A per-doc
      // computation => one native-expression projection + explode; the former
      // posexplode → two-windows → distinct shape paid a shuffle and sort
      // for what never leaves the row.
      corpus(dir)
        .select(col("doc_id"),
          explode(graft.functions.TextHashExprs.winnowFingerprints(
            split(col("text"), " "))).as("wmin"))
        .orderBy(col("doc_id"), col("wmin"))
    },

    "q40_simhash_neardup" -> { (s, dir) => implicit val sp = s
      // SimHash near-dup pairs: hamming <= 3 over 16-bit signatures, found
      // EXACTLY via hamming-ball LSH: with 4 nibbles and <= 3 differing
      // bits, pigeonhole guarantees one intact nibble — so banding on the 4
      // nibbles is a lossless equi-join prefilter (no O(n^2) cross join).
      // Dedup by construction: band b counts only if no earlier nibble
      // matched.
      // bounded subset: 16-bit signatures on a ~50-word vocabulary make
      // near-dups genuinely dense (30%+ of pairs), so the OUTPUT is O(n^2)
      // regardless of algorithm — cap the corpus, keep the operator exact
      val sub = corpus(dir).filter(col("doc_id") % 100000 < 250)
      val sh = TextOps.simhash(sub, "doc_id", "text", SimBits)
        .select(col("doc_id") +: col("simhash") +:
          (0 until 4).map(i => expr(s"shiftright(simhash, ${4 * i}) & 15").as(s"nib$i")): _*)
      def side(tag: String) = sh.select(
        col("doc_id").as(s"doc_$tag"), col("simhash").as(s"sh_$tag"),
        col("nib0").as(s"n0_$tag"), col("nib1").as(s"n1_$tag"),
        col("nib2").as(s"n2_$tag"), col("nib3").as(s"n3_$tag"))
      val (a, b) = (side("a"), side("b"))
      val cands = (0 until 4).map { bd =>
        val earlierDiffer = (0 until bd)
          .map(i => col(s"n${i}_a") =!= col(s"n${i}_b"))
          .foldLeft(lit(true))(_ && _)
        a.join(b, col(s"n${bd}_a") === col(s"n${bd}_b") && earlierDiffer
          && col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b"))
      }.reduce(_ union _)
      cands
        .withColumn("hamming", TextOps.hammingDistance(col("sh_a"), col("sh_b")).cast("long"))
        .filter(col("hamming") <= 3)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    "q41_tfidf" -> { (s, dir) => implicit val sp = s
      // TF-IDF: top-3 terms per doc (docs 0..99), idf = ln(N/df), ties by
      // term asc. All inputs integer-derived => doubles identical x-engine.
      val docs = t(dir, "documents").filter(col("doc_id") < 100)
      val nDocs = 100L
      val terms = docs.select(col("doc_id"), explode(split(col("text"), lit(" "))).as("term"))
      val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
      tf.join(df, Seq("term"))
        .withColumn("tfidf", round(col("tf") * log(lit(nDocs.toDouble) / col("df")), 6))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("term"), col("tfidf"), col("rank"))
        .orderBy(col("doc_id"), col("rank"))
    },

    // ---- text analysis ----
    "q25_lang_id" -> { (s, dir) => implicit val sp = s
      // n-gram/stopword heuristic language ID (the corpus is synthetic
      // word-salad, so this checks the OPERATOR, not corpus ground truth)
      t(dir, "documents")
        .withColumn("en_hits", TextOps.englishStopwordHits(col("text")))
        .withColumn("pred_lang", when(col("en_hits") >= 1, lit("en")).otherwise(lit("unk")))
        .select(col("doc_id"), col("lang"), col("en_hits"), col("pred_lang"))
        .orderBy(col("doc_id"))
    },
    "q26_quality_score" -> { (s, dir) => implicit val sp = s
      t(dir, "documents")
        .withColumn("p", concat(lit(" "), col("text"), lit(" ")))
        .withColumn("n_tokens", TextOps.tokenCount(col("text")))
        .withColumn("stop_hits", TextOps.occurrences(col("p"), " the "))
        .withColumn("avg_tok_len", round(
          (length(regexp_replace(col("text"), lit(" "), lit(""))).cast("double")) / col("n_tokens"), 4))
        .withColumn("quality", round(
          least(lit(1.0), col("n_tokens").cast("double") / 50.0) * 0.5 +
          least(lit(1.0), col("stop_hits").cast("double") * 5.0 / col("n_tokens")) * 0.5, 4))
        .select(col("doc_id"), col("n_tokens"), col("stop_hits"), col("avg_tok_len"), col("quality"))
        .orderBy(col("doc_id"))
    },
    "q27_fingerprint" -> { (s, dir) => implicit val sp = s
      // content fingerprint via the native codegen'd PolyHash64 expression
      PolyHash64.register(s)
      t(dir, "documents")
        .select(col("doc_id"), expr("poly_hash(text)").as("fingerprint"))
        .orderBy(col("doc_id"))
    },

    // ---- embedding near-dup: sign-LSH prebucket + exact verify ----
    // The scale path: instead of the O(n^2) cross join (which is 100M pairs
    // at sf0.1), each vector gets 2 sign-LSH band keys (8 deterministic
    // integer hyperplanes each); only same-bucket pairs are exact-verified.
    // A cos>=0.999 pair flips a plane with prob ~theta/pi = 0.45%, so the
    // miss probability per 8-plane band is ~3.5%, ~0.1% for both — and the
    // oracle runs the IDENTICAL bucketing, so results match bit-for-bit.
    "q28_embedding_neardup" -> { (s, dir) => implicit val sp = s
      // assembled from AnnOps building blocks; filter applies to the ROUNDED
      // cosine so the oracle's round-then-compare matches exactly
      val q = t(dir, "embeddings").select(col("vec_id"),
        AnnOps.quantize(col("embedding")).as("qe"))
      val twins = q.select((col("vec_id") + 100000).as("vec_id"),
        transform(col("qe"), x => x + 1).as("qe"))
      val c = q.union(twins).withColumn("nrm", AnnOps.dotQ(col("qe"), col("qe")))
      // signatures appended inline: one projection, no shuffle, no join
      val vecs = c.select(col("*") +:
        AnnOps.signatureColumns("qe", bands = 2, planesPerBand = 8, dims = 64): _*)
      // dedup BY CONSTRUCTION, no distinct: a band-1 match only counts when
      // the pair did NOT already match in band 0 (sig0 differs)
      def side(tag: String) = vecs.select(
        col("vec_id").as(s"vec_$tag"), col("qe").as(s"q$tag"), col("nrm").as(s"n$tag"),
        col("sig0").as(s"sig0_$tag"), col("sig1").as(s"sig1_$tag"))
      val (a, b) = (side("a"), side("b"))
      val cand0 = a.join(b, col("sig0_a") === col("sig0_b") && col("vec_a") < col("vec_b"))
      val cand1 = a.join(b, col("sig1_a") === col("sig1_b") && col("sig0_a") =!= col("sig0_b")
        && col("vec_a") < col("vec_b"))
      cand0.union(cand1)
        .select(col("vec_a"), col("vec_b"), col("qa"), col("qb"),
          col("na").as("na"), col("nb").as("nb"))
        .withColumn("dot", AnnOps.dotQ(col("qa"), col("qb")))
        .withColumn("cos_q", round(col("dot").cast("double")
          / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))), 4))
        .filter(col("cos_q") >= 0.999)
        .select(col("vec_a"), col("vec_b"), col("cos_q"))
        .orderBy(col("vec_a"), col("vec_b"))
    },

    // ---- true-float ANN baseline (no oracle: float-order dependent) ----
    "q29_cosine_topk" -> { (s, dir) => implicit val sp = s
      val e = t(dir, "embeddings").select(col("vec_id"),
        expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("v"))
        .withColumn("nrm", sqrt(graft.functions.DoubleArrayDot.doubleDot(col("v"), col("v"))))
      val probes = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
      e.join(broadcast(probes), col("vec_id") =!= col("query_id"))
        .withColumn("cos", graft.functions.DoubleArrayDot.doubleDot(col("v"), col("qv"))
          / (col("nrm") * col("qn")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          round(col("cos"), 4).as("cos"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    })

  def oracles: Map[String, String] = Map(
    // Float cosine IS oracle-checkable: float32 values cast to double are
    // exact, DuckDB's list_sum folds left-to-right like DoubleArrayDot, and
    // *, /, sqrt are IEEE-deterministic — identical bits on both engines.
    "q29_cosine_topk" ->
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
        |  WHERE q.vec_id < 10),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY cos DESC, neighbor_id) AS rank FROM pairs)
        |SELECT query_id, neighbor_id, round(cos, 4) AS cos, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q20_table_metrics" -> {
      val cap = EngineConfig.default.maxGroupBytes
      val fetch = EngineConfig.default.fetchSize
      s"""WITH RECURSIVE files AS (
         |  SELECT pk, bucket, CAST(bucket % 3 AS INT) AS content,
         |         CAST(FLOOR(avgp * 1000) AS BIGINT) AS size
         |  FROM (SELECT CAST(l_returnflag AS VARCHAR) AS pk,
         |               CAST(l_orderkey % 200 AS INT) AS bucket,
         |               avg(l_extendedprice) AS avgp
         |        FROM lineitem GROUP BY 1, 2)),
         |datafiles AS (
         |  SELECT pk, size, row_number() OVER (PARTITION BY pk ORDER BY size, bucket) AS rn
         |  FROM files WHERE content = 0),
         |rec AS (
         |  SELECT pk, rn, size AS cur_sum, 1 AS group_id FROM datafiles WHERE rn = 1
         |  UNION ALL
         |  SELECT d.pk, d.rn,
         |    CASE WHEN rec.cur_sum > $cap THEN d.size ELSE rec.cur_sum + d.size END,
         |    CASE WHEN rec.cur_sum > $cap THEN rec.group_id + 1 ELSE rec.group_id END
         |  FROM rec JOIN datafiles d ON d.pk = rec.pk AND d.rn = rec.rn + 1),
         |groups_ AS (
         |  SELECT pk, group_id, max(cur_sum) AS gsum FROM rec GROUP BY pk, group_id),
         |after_pk AS (
         |  SELECT pk, max(group_id) AS n_groups,
         |         sum(gsum // $fetch + 2) AS after_overhead
         |  FROM groups_ GROUP BY pk),
         |before_pk AS (
         |  SELECT pk, count(*) AS fc, sum(size) AS tsz,
         |         sum(size // $fetch + 2) AS ovh,
         |         count(CASE WHEN content = 0 THEN 1 END) AS dc,
         |         sum(CASE WHEN content = 0 THEN size END) AS dsz
         |  FROM files GROUP BY pk),
         |per_pk AS (
         |  SELECT b.*, coalesce(a.n_groups, 0) AS n_groups,
         |         coalesce(a.after_overhead, 0) AS after_overhead
         |  FROM before_pk b LEFT JOIN after_pk a USING (pk)),
         |worst_fc AS (
         |  SELECT fc, n_groups, fc - n_groups AS red FROM per_pk
         |  ORDER BY red DESC, pk DESC LIMIT 1),
         |worst_so AS (
         |  SELECT ovh, after_overhead, ovh - after_overhead AS red FROM per_pk
         |  ORDER BY red DESC, pk DESC LIMIT 1)
         |SELECT
         |  (SELECT CAST(sum(ovh) AS BIGINT) FROM per_pk) AS full_scan_before,
         |  (SELECT CAST(sum(after_overhead) AS BIGINT) FROM per_pk) AS full_scan_after,
         |  (SELECT CAST(CASE WHEN red > 0 THEN ovh ELSE 0 END AS BIGINT) FROM worst_so) AS worst_scan_before,
         |  (SELECT CAST(CASE WHEN red > 0 THEN after_overhead ELSE 0 END AS BIGINT) FROM worst_so) AS worst_scan_after,
         |  (SELECT CAST(sum(fc) AS BIGINT) FROM per_pk) AS file_count_before,
         |  (SELECT CAST(sum(n_groups) AS BIGINT) FROM per_pk) AS file_count_after,
         |  (SELECT CAST(CASE WHEN red > 0 THEN fc ELSE 0 END AS BIGINT) FROM worst_fc) AS worst_fc_before,
         |  (SELECT CAST(CASE WHEN red > 0 THEN n_groups ELSE 0 END AS BIGINT) FROM worst_fc) AS worst_fc_after,
         |  (SELECT round(CAST(sum(dsz) AS DOUBLE) / sum(dc), 4) FROM per_pk) AS avg_data_size,
         |  (SELECT round(min(CAST(tsz AS DOUBLE) / fc), 4) FROM per_pk) AS worst_avg_size,
         |  (SELECT CAST(sum(tsz) AS BIGINT) FROM per_pk) AS total_size,
         |  (SELECT CAST(max(tsz) AS BIGINT) FROM per_pk) AS largest_partition,
         |  (SELECT count(*) FROM per_pk) AS n_partitions""".stripMargin
    },
    "q21_minhash_signatures" ->
      s"""WITH corpus AS ($corpusSql)
         |SELECT doc_id, $minhashAggsSql
         |FROM ($shingleHashesSql) GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q22_lsh_candidate_pairs" ->
      s"""WITH corpus AS ($corpusSql),
         |sigs AS (SELECT doc_id, $minhashAggsSql
         |         FROM ($shingleHashesSql) GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, 0 AS band,
         |    concat(mh0, '_', mh1, '_', mh2, '_', mh3) AS bkey FROM sigs
         |  UNION ALL
         |  SELECT doc_id, 1 AS band,
         |    concat(mh4, '_', mh5, '_', mh6, '_', mh7) AS bkey FROM sigs)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
         |  AND a.doc_id < b.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q23_simhash" -> {
      val bitSums = (0 until SimBits).map(i =>
        s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i").mkString(", ")
      val simhashExpr = (0 until SimBits)
        .map(i => s"(CASE WHEN b$i >= 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")
      s"""WITH corpus AS ($corpusSql),
         |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM corpus),
         |h AS (SELECT doc_id, CAST('0x' || substring(md5(tok), 1, 7) AS BIGINT) AS h FROM toks),
         |bits AS (SELECT doc_id, $bitSums FROM h GROUP BY doc_id)
         |SELECT doc_id, CAST($simhashExpr AS BIGINT) AS simhash
         |FROM bits ORDER BY doc_id""".stripMargin
    },
    "q24_ngram_jaccard_pairs" ->
      s"""WITH corpus AS ($corpusSql),
         |sub AS (SELECT * FROM corpus WHERE doc_id % 100000 < 200),
         |shs AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
         |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
         |         || ' ' || string_split(text, ' ')[i+2]))) AS sh
         |  FROM sub),
         |sh AS (
         |  SELECT doc_id, CAST('0x' || substring(md5(sh), 1, 7) AS BIGINT) AS h
         |  FROM shs),
         |counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  round(CAST(inter AS DOUBLE) / (ca.n + cb.n - inter), 4) AS jaccard
         |FROM inter
         |JOIN counts ca ON ca.doc_id = doc_a
         |JOIN counts cb ON cb.doc_id = doc_b
         |WHERE round(CAST(inter AS DOUBLE) / (ca.n + cb.n - inter), 4) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q40_simhash_neardup" -> {
      val bitSums = (0 until SimBits).map(i =>
        s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i").mkString(", ")
      val simhashExpr = (0 until SimBits)
        .map(i => s"(CASE WHEN b$i >= 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")
      s"""WITH corpus AS ($corpusSql),
         |sub AS (SELECT * FROM corpus WHERE doc_id % 100000 < 250),
         |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM sub),
         |h AS (SELECT doc_id, CAST('0x' || substring(md5(tok), 1, 7) AS BIGINT) AS h FROM toks),
         |bits AS (SELECT doc_id, $bitSums FROM h GROUP BY doc_id),
         |sh AS (SELECT doc_id, CAST($simhashExpr AS BIGINT) AS simhash,
         |         (CAST($simhashExpr AS BIGINT) >> 0) & 15 AS nib0,
         |         (CAST($simhashExpr AS BIGINT) >> 4) & 15 AS nib1,
         |         (CAST($simhashExpr AS BIGINT) >> 8) & 15 AS nib2,
         |         (CAST($simhashExpr AS BIGINT) >> 12) & 15 AS nib3
         |       FROM bits),
         |cand AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.simhash AS sh_a, b.simhash AS sh_b
         |  FROM sh a JOIN sh b ON a.nib0 = b.nib0 AND a.doc_id < b.doc_id
         |  UNION ALL
         |  SELECT a.doc_id, b.doc_id, a.simhash, b.simhash
         |  FROM sh a JOIN sh b ON a.nib1 = b.nib1 AND a.nib0 <> b.nib0 AND a.doc_id < b.doc_id
         |  UNION ALL
         |  SELECT a.doc_id, b.doc_id, a.simhash, b.simhash
         |  FROM sh a JOIN sh b ON a.nib2 = b.nib2 AND a.nib0 <> b.nib0 AND a.nib1 <> b.nib1
         |    AND a.doc_id < b.doc_id
         |  UNION ALL
         |  SELECT a.doc_id, b.doc_id, a.simhash, b.simhash
         |  FROM sh a JOIN sh b ON a.nib3 = b.nib3 AND a.nib0 <> b.nib0 AND a.nib1 <> b.nib1
         |    AND a.nib2 <> b.nib2 AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    "q41_tfidf" ->
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
        |terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM docs),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |x AS (SELECT doc_id, term, round(tf * ln(100.0 / df), 6) AS tfidf
        |      FROM tf JOIN df USING (term)),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY tfidf DESC, term) AS rank FROM x)
        |SELECT doc_id, term, tfidf, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q36_dedup_keep" ->
      s"""WITH corpus AS ($corpusSql)
         |SELECT doc_id, content_hash FROM (
         |  SELECT doc_id, md5(text) AS content_hash,
         |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |  FROM corpus) WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q37_winnowing" ->
      s"""WITH corpus AS ($corpusSql),
         |shs AS (
         |  SELECT doc_id, list_transform(
         |    range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
         |    i -> string_split(text, ' ')[i] || ' ' ||
         |      string_split(text, ' ')[i+1] || ' ' ||
         |      string_split(text, ' ')[i+2]) AS shl
         |  FROM corpus),
         |hashed AS (
         |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS idx,
         |    CAST('0x' || substring(md5(shl[i]), 1, 7) AS BIGINT) AS h
         |  FROM (SELECT doc_id, shl, unnest(range(1, len(shl) + 1)) AS i FROM shs)),
         |win AS (
         |  SELECT doc_id, idx,
         |    min(h) OVER (PARTITION BY doc_id ORDER BY idx
         |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
         |    count(*) OVER (PARTITION BY doc_id) AS n
         |  FROM hashed)
         |SELECT DISTINCT doc_id, wmin FROM win WHERE idx <= n - 4
         |ORDER BY doc_id, wmin""".stripMargin,
    "q25_lang_id" ->
      """SELECT doc_id, lang,
        |  CAST((length(p) - length(replace(p, ' the ', ''))) // 5 +
        |       (length(p) - length(replace(p, ' a ', ''))) // 3 AS BIGINT) AS en_hits,
        |  CASE WHEN (length(p) - length(replace(p, ' the ', ''))) // 5 +
        |            (length(p) - length(replace(p, ' a ', ''))) // 3 >= 1
        |       THEN 'en' ELSE 'unk' END AS pred_lang
        |FROM (SELECT doc_id, lang, ' ' || text || ' ' AS p FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q26_quality_score" ->
      """SELECT doc_id, n_tokens, stop_hits,
        |  round(CAST(nosp AS DOUBLE) / n_tokens, 4) AS avg_tok_len,
        |  round(least(1.0, CAST(n_tokens AS DOUBLE) / 50.0) * 0.5 +
        |        least(1.0, CAST(stop_hits AS DOUBLE) * 5.0 / n_tokens) * 0.5, 4) AS quality
        |FROM (
        |  SELECT doc_id,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
        |    CAST((length(' ' || text || ' ') -
        |          length(replace(' ' || text || ' ', ' the ', ''))) // 5 AS BIGINT) AS stop_hits,
        |    length(replace(text, ' ', '')) AS nosp
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q27_fingerprint" ->
      """SELECT doc_id,
        |  CAST(list_reduce(list_transform(range(1, length(text) + 1),
        |    i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)),
        |    (acc, c) -> (acc * 131 + c) % 1000000007) AS BIGINT) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q28_embedding_neardup" -> {
      val planeValues = planes.map { case (p, d, w) => s"($p,$d,$w)" }.mkString(", ")
      s"""WITH q AS (
         |  SELECT vec_id, list_transform(embedding,
         |    v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000) AS BIGINT)) AS qe
         |  FROM embeddings),
         |c AS (
         |  SELECT vec_id, qe FROM q
         |  UNION ALL
         |  SELECT vec_id + 100000, list_transform(qe, x -> x + 1) FROM q),
         |n AS (
         |  SELECT vec_id, qe,
         |    CAST(list_sum(list_apply(range(1, len(qe) + 1), i -> qe[i] * qe[i])) AS BIGINT) AS nrm
         |  FROM c),
         |planes(p, d, w) AS (VALUES $planeValues),
         |dims AS (
         |  SELECT vec_id, CAST(i - 1 AS INT) AS d, qe[i] AS x
         |  FROM (SELECT vec_id, qe, unnest(range(1, len(qe) + 1)) AS i FROM c)),
         |proj AS (
         |  SELECT vec_id, p, sum(x * w) AS s
         |  FROM dims JOIN planes USING (d) GROUP BY vec_id, p),
         |sigs AS (
         |  SELECT vec_id,
         |    sum(CASE WHEN p < 8 AND s >= 0 THEN 1 << p ELSE 0 END) AS sig0,
         |    sum(CASE WHEN p >= 8 AND s >= 0 THEN 1 << (p - 8) ELSE 0 END) AS sig1
         |  FROM proj GROUP BY vec_id),
         |cand AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM sigs a JOIN sigs b ON a.sig0 = b.sig0 AND a.vec_id < b.vec_id
         |  UNION ALL
         |  SELECT a.vec_id, b.vec_id
         |  FROM sigs a JOIN sigs b ON a.sig1 = b.sig1 AND a.sig0 <> b.sig0
         |    AND a.vec_id < b.vec_id),
         |pairs AS (
         |  SELECT vec_a, vec_b,
         |    CAST(list_sum(list_apply(range(1, len(x.qe) + 1),
         |      i -> x.qe[i] * y.qe[i])) AS BIGINT) AS dot,
         |    x.nrm AS na, y.nrm AS nb
         |  FROM cand
         |  JOIN n x ON x.vec_id = vec_a
         |  JOIN n y ON y.vec_id = vec_b)
         |SELECT vec_a, vec_b,
         |  round(CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 4) AS cos_q
         |FROM pairs
         |WHERE round(CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 4) >= 0.999
         |ORDER BY vec_a, vec_b""".stripMargin
    })
}
