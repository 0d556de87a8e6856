package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-4 operator families: document chunking (the tokenize-and-window
  * step of an LLM training pipeline), embedding-centroid outlier detection,
  * robust (IQR) outlier fences, funnel timing percentiles, and running
  * z-score anomaly detection over an event stream's history.
  *
  * Oracle-parity notes (same conventions as [[Queries]]): every float
  * reduction is either (a) an integer sum in disguise (quantized values —
  * order-independent, exact) or (b) a chain of single IEEE ops written in
  * identical operand order on both engines. round() appears only on
  * order-dependent double sums per the repo-wide rule.
  */
object Queries4 {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    Rel.t(dir, name)

  private def events(dir: String)(implicit s: SparkSession): DataFrame =
    Rel.events(dir)

  /** Chunk window (tokens) and stride for q68. Stride < window ⇒ overlap,
    * the standard training-data shape; the tail chunk may be shorter. */
  private val ChunkW = 32
  private val ChunkS = 24

  /** Embedding quantization scale for q69: ×512 (2^9) keeps float→double→
    * multiply exact, and makes every downstream reduction an integer sum. */
  private val QScale = 512

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- document chunking: fixed token windows (W=32) with stride 24 —
    // the slice step before tokenization in a training pipeline. Pure
    // per-row projection + one explode of the start-offset sequence: no
    // shuffle at all (the ORDER BY is the verify sink's, not the
    // operator's), so at 100 TB this is a single map-only scan whose output
    // feeds the tokenizer. The token array is materialized once per doc and
    // sliced per chunk (never re-split per element).
    "q68_chunking" -> { (s, dir) => implicit val sp = s
      t(dir, "documents")
        .select(col("doc_id"), split(col("text"), lit(" ")).as("toks"))
        .select(col("doc_id"), col("toks"),
          posexplode(sequence(lit(1), greatest(size(col("toks")), lit(1)),
            lit(ChunkS))).as(Seq("chunk_id", "start")))
        .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
          col("start").cast("long").as("start_tok"),
          least(lit(ChunkW), size(col("toks")) - col("start") + 1)
            .cast("long").as("n_chunk_tokens"),
          TextOps.portableHash28(
            concat_ws(" ", slice(col("toks"), col("start"), lit(ChunkW))))
            .as("chunk_hash"))
        .orderBy(col("doc_id"), col("chunk_id"))
    },

    // ---- embedding-centroid outliers: per-label centroid of the quantized
    // vectors, then each vector's squared distance to its label centroid,
    // top-3 farthest per label. All reductions are INTEGER sums (quantize
    // ×512 first): d² = Σ(q·n − s)²/n² needs no float accumulation, so the
    // result is engine- and partitioning-exact. Scale: the centroid
    // relation is (labels × dims) rows — thousands at most — so the join
    // back to the exploded vectors is a broadcast; one shuffle for the
    // per-(label,pos) partial-aggregated sums, one for the per-vector
    // distance sum, both map-side combined. Exactness bound (analogous to
    // q72's ss limit): |d| = |qv·n − s| ≤ ~1024·n, so sum(d²) over 64 dims
    // stays under 2^63 only while a label holds ≲4e5 vectors; beyond that,
    // trade exactness for d = (qv − s/n) computed once in double.
    "q69_centroid_outliers" -> { (s, dir) => implicit val sp = s
      val qd = t(dir, "embeddings")
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("pos0", "x")))
        .select(col("vec_id"), col("label"), (col("pos0") + 1).as("pos"),
          floor(col("x").cast("double") * QScale).cast("long").as("qv"))
      val cent = qd.groupBy(col("label"), col("pos"))
        .agg(sum(col("qv")).as("s"), count(lit(1)).as("n"))
      val dist = qd.join(broadcast(cent), Seq("label", "pos"))
        .withColumn("d", col("qv") * col("n") - col("s"))
        .groupBy(col("vec_id"), col("label"))
        .agg(sum(col("d") * col("d")).as("num"), max(col("n")).as("n"))
      dist
        .withColumn("d2", col("num").cast("double") / (col("n") * col("n")))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("label")).orderBy(col("num").desc, col("vec_id")))
          .cast("long"))
        .filter(col("rk") <= 3)
        .select(col("label"), col("rk"), col("vec_id"), col("d2"))
        .orderBy(col("label"), col("rk"))
    },

    // ---- robust (IQR) outlier fence per order priority. The corpus is
    // uniform (no real outliers), so — like the dedup twins — a heavy tail
    // is SYNTHESIZED deterministically: every 997th order is 10×. The
    // detector doesn't know that; it computes Tukey fences from exact
    // quartiles. The 5-row fence relation broadcasts (group count is
    // bounded by the priority domain, not data size); the quartile pass is
    // the only wide aggregation.
    "q70_iqr_outliers" -> { (s, dir) => implicit val sp = s
      val amt = t(dir, "orders").select(col("o_orderkey"), col("o_orderpriority"),
        when(col("o_orderkey") % 997 === 0, col("o_totalprice") * 10)
          .otherwise(col("o_totalprice")).as("amt"))
      val f = amt.groupBy(col("o_orderpriority"))
        .agg(percentile(col("amt"), lit(0.25)).as("p25"),
          percentile(col("amt"), lit(0.75)).as("p75"))
        .withColumn("hi", col("p75") + lit(1.5) * (col("p75") - col("p25")))
      amt.join(broadcast(f), "o_orderpriority")
        .groupBy(col("o_orderpriority"), col("p25"), col("p75"), col("hi"))
        .agg(count(when(col("amt") > col("hi"), 1)).as("n_outliers"),
          coalesce(max(when(col("amt") > col("hi"), col("amt"))), lit(0.0))
            .as("max_outlier"))
        .orderBy(col("o_orderpriority"))
    },

    // ---- funnel timing: among converted users (q45's signup→purchase
    // funnel), the distribution of time-to-convert per cohort — count,
    // min/median/p90/max. Exact interpolated percentiles over integer
    // microsecond deltas (quantile_cont parity). Two narrow aggregations
    // on user_id (partial-agg'd) + one tiny percentile pass.
    "q71_funnel_timing" -> { (s, dir) => implicit val sp = s
      val ev = events(dir)
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("signup_us"))
      val fp = ev.filter(col("event_type") === "purchase")
        .join(signups, "user_id")
        .filter(col("ts_us") >= col("signup_us"))
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("purchase_us"))
      signups.join(fp, "user_id")
        .select((col("user_id") % 3).as("cohort"),
          (col("purchase_us") - col("signup_us")).as("delta_us"))
        .groupBy(col("cohort"))
        .agg(count(lit(1)).as("n_conv"),
          min(col("delta_us")).as("min_us"),
          percentile(col("delta_us"), lit(0.5)).as("med_us"),
          percentile(col("delta_us"), lit(0.9)).as("p90_us"),
          max(col("delta_us")).as("max_us"))
        .orderBy(col("cohort"))
    },

    // ---- running z-score anomaly detection: each event scored against the
    // mean/stddev of its event_type's ENTIRE history so far (expanding
    // window, current row excluded). Values are quantized to integer
    // thousandths so the running sums are order-independent integer sums —
    // the moments are then derived with identical scalar op chains on both
    // engines (sum(v)² stays a double: as a long it would overflow at
    // scale). One shuffle on event_type; state per partition is O(1)
    // (count/sum/sum-of-squares), which is also exactly the state the
    // streaming twin keeps per key. ss stays an exact long up to ~9e15,
    // i.e. ~40M rows per type at this value range.
    "q72_anomaly_zscore" -> { (s, dir) => implicit val sp = s
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val base = events(dir)
        .select(col("event_id"), col("event_type"), col("ts_us"),
          floor(col("value") * 1000).cast("long").as("v"))
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("s", sum(col("v")).over(w))
        .withColumn("ss", sum(col("v") * col("v")).over(w))
      val mean = col("s").cast("double") / col("n")
      val varr = (col("ss").cast("double") - col("s").cast("double") * col("s") / col("n")) /
        (col("n") - 1)
      val z = (col("v") - mean) / sqrt(varr)
      base.filter(col("n") >= 30 && varr > 0 && abs(z) > 3)
        .select(col("event_id"), col("event_type"), col("v"),
          col("n").as("n_prior"), z.as("z"))
        .orderBy(col("event_id"))
    })

  def oracles: Map[String, String] = Map(
    "q68_chunking" ->
      s"""WITH base AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |chunks AS (
         |  SELECT doc_id, toks,
         |    unnest(range(1, greatest(len(toks), 1) + 1, $ChunkS)) AS start
         |  FROM base)
         |SELECT doc_id, CAST((start - 1) / $ChunkS AS BIGINT) AS chunk_id,
         |  CAST(start AS BIGINT) AS start_tok,
         |  CAST(least($ChunkW, len(toks) - start + 1) AS BIGINT) AS n_chunk_tokens,
         |  CAST('0x' || substring(md5(
         |    array_to_string(toks[start:start+${ChunkW - 1}], ' ')), 1, 7) AS BIGINT)
         |    AS chunk_hash
         |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin,
    "q69_centroid_outliers" ->
      s"""WITH pe AS (
         |  SELECT vec_id, label, unnest(range(1, len(embedding) + 1)) AS pos,
         |    embedding
         |  FROM embeddings),
         |qd AS (
         |  SELECT vec_id, label, pos,
         |    CAST(FLOOR(CAST(embedding[pos] AS DOUBLE) * $QScale) AS BIGINT) AS qv
         |  FROM pe),
         |cent AS (
         |  SELECT label, pos, CAST(sum(qv) AS BIGINT) AS s,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM qd GROUP BY 1, 2),
         |dist AS (
         |  SELECT qd.vec_id, qd.label,
         |    CAST(sum((qd.qv * cent.n - cent.s) * (qd.qv * cent.n - cent.s)) AS BIGINT)
         |      AS num,
         |    max(cent.n) AS n
         |  FROM qd JOIN cent ON qd.label = cent.label AND qd.pos = cent.pos
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT label, vec_id, CAST(num AS DOUBLE) / (n * n) AS d2,
         |    row_number() OVER (PARTITION BY label ORDER BY num DESC, vec_id) AS rk
         |  FROM dist)
         |SELECT label, CAST(rk AS BIGINT) AS rk, vec_id, d2
         |FROM ranked WHERE rk <= 3 ORDER BY label, rk""".stripMargin,
    "q70_iqr_outliers" ->
      """WITH amt AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    CASE WHEN o_orderkey % 997 = 0 THEN o_totalprice * 10
        |         ELSE o_totalprice END AS amt
        |  FROM orders),
        |s AS (
        |  SELECT o_orderpriority, quantile_cont(amt, 0.25) AS p25,
        |         quantile_cont(amt, 0.75) AS p75
        |  FROM amt GROUP BY 1),
        |f AS (SELECT o_orderpriority, p25, p75,
        |        p75 + 1.5 * (p75 - p25) AS hi FROM s)
        |SELECT f.o_orderpriority, f.p25, f.p75, f.hi,
        |  CAST(count(CASE WHEN a.amt > f.hi THEN 1 END) AS BIGINT) AS n_outliers,
        |  coalesce(max(CASE WHEN a.amt > f.hi THEN a.amt END), 0.0) AS max_outlier
        |FROM f JOIN amt a ON a.o_orderpriority = f.o_orderpriority
        |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin,
    "q71_funnel_timing" ->
      """WITH signups AS (
        |  SELECT user_id, min(epoch_us(ts)) AS signup_us
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |fp AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS purchase_us
        |  FROM events e JOIN signups s ON e.user_id = s.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.signup_us
        |  GROUP BY e.user_id),
        |conv AS (
        |  SELECT s.user_id % 3 AS cohort, fp.purchase_us - s.signup_us AS delta_us
        |  FROM signups s JOIN fp ON s.user_id = fp.user_id)
        |SELECT cohort, CAST(count(*) AS BIGINT) AS n_conv,
        |  CAST(min(delta_us) AS BIGINT) AS min_us,
        |  quantile_cont(delta_us, 0.5) AS med_us,
        |  quantile_cont(delta_us, 0.9) AS p90_us,
        |  CAST(max(delta_us) AS BIGINT) AS max_us
        |FROM conv GROUP BY cohort ORDER BY cohort""".stripMargin,
    "q72_anomaly_zscore" ->
      """WITH v AS (
        |  SELECT event_id, event_type, epoch_us(ts) AS ts_us,
        |    CAST(FLOOR(value * 1000) AS BIGINT) AS v
        |  FROM events),
        |r AS (
        |  SELECT event_id, event_type, v,
        |    count(*) OVER w AS n, sum(v) OVER w AS s, sum(v*v) OVER w AS ss
        |  FROM v
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id, event_type, v, CAST(n AS BIGINT) AS n_prior,
        |  (v - CAST(s AS DOUBLE)/n)
        |    / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)*s/n) / (n-1)) AS z
        |FROM r
        |WHERE n >= 30
        |  AND (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)*s/n) / (n-1) > 0
        |  AND abs((v - CAST(s AS DOUBLE)/n)
        |    / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)*s/n) / (n-1))) > 3
        |ORDER BY event_id""".stripMargin)
}
