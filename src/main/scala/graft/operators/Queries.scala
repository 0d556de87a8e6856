package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The engine's query surface over the driver's parquet corpus: every
  * operator family from SURVEY §2 re-expressed as a declarative Spark plan,
  * each paired (in [[Oracles]]) with ANSI/DuckDB SQL computing the same
  * result for the driver's hash-compare gate.
  *
  * Conventions for oracle parity:
  *   - every computed column is aliased identically on both sides;
  *   - doubles that pass through engine-order-dependent summation are
  *     round()ed on both sides;
  *   - double->int conversions always FLOOR first (DuckDB CAST rounds,
  *     Spark CAST truncates);
  *   - timestamps compare as epoch microseconds (bigint);
  *   - every query ends in a deterministic ORDER BY.
  *
  * Scale notes are per-query; the common ones: aggregates are partial
  * (map-side combine) by construction, filters/projections push to the
  * parquet scan, and small dimension tables are broadcast.
  */
object Queries {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    Rel.t(dir, name)

  /** Events with ts_us/tsx derived from the nanos timestamp ([[Rel]]). */
  private def events(dir: String)(implicit s: SparkSession): DataFrame =
    Rel.events(dir)

  /** Derived file-entry relation used by the metadata-engine queries: one
    * "file" per lineitem row — partition = l_returnflag, content cycles
    * 0/1/2 from l_linenumber, size from the price. Mirrors the reference's
    * input relation shape at oracle-checkable scale. */
  private def fileRel(dir: String)(implicit s: SparkSession): DataFrame =
    t(dir, "lineitem").select(
      col("l_orderkey"),
      col("l_linenumber"),
      col("l_returnflag").as("pk"),
      (col("l_linenumber") % 3).cast("int").as("content"),
      expr("CAST(FLOOR(l_extendedprice * 1000) AS BIGINT)").as("size"))

  val fetchSize = 33554432L

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference-core: projections, cost model, aggregates ----
    "q1_pricing_summary" -> { (s, dir) => implicit val sp = s
      t(dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    "q2_file_stats" -> { (s, dir) => implicit val sp = s
      // A1-A4,A6,A7: one fused aggregate pass (single HashAggregateExec)
      fileRel(dir).agg(
        count(lit(1)).as("file_count"),
        sum(col("size")).as("total_size"),
        sum(expr(s"size div $fetchSize") + lit(2)).as("scan_overhead"),
        count(when(col("content") === 0, 1)).as("data_count"),
        sum(when(col("content") === 0, col("size"))).as("data_size"),
        countDistinct(col("pk")).as("n_partitions"))
        .withColumn("avg_data_size",
          round(col("data_size").cast("double") / col("data_count"), 4))
    },
    "q3_partition_stats" -> { (s, dir) => implicit val sp = s
      // A5: the engine's one wide shuffle, keyed by partition
      fileRel(dir)
        .groupBy(col("pk"))
        .agg(
          count(lit(1)).as("file_count"),
          sum(col("size")).as("total_size"),
          sum(expr(s"size div $fetchSize") + lit(2)).as("scan_overhead"),
          min(col("size")).as("min_size"),
          max(col("size")).as("max_size"))
        .orderBy(col("pk"))
    },
    "q4_worst_partition" -> { (s, dir) => implicit val sp = s
      // A8/A9 argmax with deterministic tie-break (size desc, pk asc)
      fileRel(dir)
        .groupBy(col("pk"))
        .agg(count(lit(1)).as("file_count"), sum(col("size")).as("total_size"))
        .orderBy(col("total_size").desc, col("pk"))
        .limit(1)
    },
    "q5_read_costs" -> { (s, dir) => implicit val sp = s
      // P1/P2 projection — stays inside one WholeStageCodegen span
      fileRel(dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("size"),
          (expr(s"size div $fetchSize") + lit(2)).as("read_cost"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ---- joins ----
    "q6_revenue_by_region" -> { (s, dir) => implicit val sp = s
      // shuffle join on the fact side; nation/region broadcast (tiny dims)
      t(dir, "orders")
        .join(t(dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          round(sum(col("o_totalprice")), 2).as("revenue"),
          countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("r_name"))
    },
    "q7_customers_with_orders" -> { (s, dir) => implicit val sp = s
      t(dir, "customer")
        .join(t(dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    "q8_customers_no_big_order" -> { (s, dir) => implicit val sp = s
      t(dir, "customer")
        .join(t(dir, "orders").filter(col("o_totalprice") > 350000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // ---- windows / top-k ----
    "q9_top_orders_per_customer" -> { (s, dir) => implicit val sp = s
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(dir, "orders")
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("totalprice"), col("rank"))
        .orderBy(col("o_custkey"), col("rank"))
    },
    "q10_sessionize" -> { (s, dir) => implicit val sp = s
      // gap-based sessionization (30 min): the batch shape of the streaming
      // mapGroupsWithState sessionizer in graft.streaming
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      events(dir)
        .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_us").isNull || col("ts_us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },

    "q30_running_total" -> { (s, dir) => implicit val sp = s
      // explicit frame spec: cumulative revenue per customer in order-date
      // order (rowsBetween unboundedPreceding..current)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(dir, "orders")
        .filter(col("o_custkey") <= 100)
        .withColumn("running_total", round(sum(col("o_totalprice")).over(w), 2))
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("totalprice"), col("running_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    "q31_asof_join" -> { (s, dir) => implicit val sp = s
      // As-of join: for each purchase event, the latest signup of the same
      // user at or before it. Spark-first shape: NO range join — tag both
      // sides, union, one window sort per user, carry the last signup id
      // with last(ignoreNulls). Scales as a single shuffle on user_id.
      val ev = events(dir)
      // dedupe signups to one per (user, ts) so as-of ties are well-defined
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
        .withColumn("asof_signup_id", last(col("signup_id"), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("event_id"), col("user_id"), col("ts_us"), col("asof_signup_id"))
        .orderBy(col("event_id"))
    },
    "q33_regex_tokens" -> { (s, dir) => implicit val sp = s
      // BPE-ish pre-tokenization classes: letter runs / digit runs / other
      // runs, counted per document+props — regexp_extract_all is codegen'd
      // and the simple char classes behave identically across engines
      val ev = events(dir)
      ev.select(col("event_id"),
          size(expr("regexp_extract_all(props, '[A-Za-z]+', 0)")).cast("long").as("n_word"),
          size(expr("regexp_extract_all(props, '[0-9]+', 0)")).cast("long").as("n_num"),
          size(expr("regexp_extract_all(props, '[^A-Za-z0-9 ]+', 0)")).cast("long").as("n_punct"))
        .groupBy(col("n_word"), col("n_num"), col("n_punct"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy(col("n_word"), col("n_num"), col("n_punct"))
    },
    "q34_lead_ntile" -> { (s, dir) => implicit val sp = s
      // remaining window families: lead (next order gap) + ntile quartiles
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      t(dir, "orders")
        .filter(col("o_custkey") <= 50)
        .withColumn("next_key", lead(col("o_orderkey"), 1).over(w))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .select(col("o_custkey"), col("o_orderkey"), col("next_key"), col("quartile"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    "q32_percentiles" -> { (s, dir) => implicit val sp = s
      t(dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"),
          round(expr("percentile(l_discount, 0.25)"), 4).as("p25_disc"))
        .orderBy(col("l_returnflag"))
    },

    // ---- set ops / grouping sets ----
    "q11_rollup" -> { (s, dir) => implicit val sp = s
      t(dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },
    "q12_nation_keys_union" -> { (s, dir) => implicit val sp = s
      t(dir, "customer").select(col("c_nationkey").cast("int").as("nationkey"))
        .union(t(dir, "supplier").select(col("s_nationkey").cast("int").as("nationkey")))
        .distinct()
        .orderBy(col("nationkey"))
    },
    "q13_nation_keys_except" -> { (s, dir) => implicit val sp = s
      t(dir, "nation").select(col("n_nationkey").cast("int").as("nationkey"))
        .except(t(dir, "supplier").select(col("s_nationkey").cast("int").as("nationkey")))
        .orderBy(col("nationkey"))
    },

    "q38_sql_correlated" -> { (s, dir) => implicit val sp = s
      // the engine's SQL surface: temp views + a correlated scalar subquery
      t(dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT o_custkey, count(*) AS n_above
          |FROM orders_v o
          |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders_v i
          |                      WHERE i.o_custkey = o.o_custkey)
          |GROUP BY o_custkey
          |ORDER BY o_custkey""".stripMargin)
    },
    "q39_pivot" -> { (s, dir) => implicit val sp = s
      // pivot = grouped conditional aggregation with value-named columns
      t(dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum(col("l_quantity")), 2))
        .orderBy(col("l_returnflag"))
    },
    "q35_sketches" -> { (s, dir) => implicit val sp = s
      // approximate aggregates, now FULLY oracle-gated (the q90/q103
      // deterministic-sketch discipline): a 64-register HLL over the
      // portable md5-derived 28-bit hash — register = h mod 64, rank =
      // leading-zero count of the remaining 22 bits + 1 via length(bin(w))
      // (integer both engines) — whose harmonic-mean denominator
      // sum(2^(23-M[j])) is an exact INTEGER (absent registers contribute
      // 2^23), so the estimate (709*4096*2^23) div (1000*S) is one integer
      // division: bit-identical to the SQL oracle, no libm anywhere.
      // Quantiles are exact rank-based (rank ceil(p*n) over floor-cents),
      // replacing approx_percentile whose t-digest internals are
      // engine-specific — computed over the per-(flag, cents) HISTOGRAM
      // (the q117 shrink-first rule): the shuffle and the window sort see
      // only distinct prices (vocabulary-sized, map-side combined), never
      // the row count, so the exact quantile holds its shape at 100 TB.
      // value-at-rank k over the multiset == min value whose cumulative
      // count reaches k. The HLL register table is likewise a pure
      // partial aggregation (≤64 ints of state per group map-side).
      val hashed = t(dir, "lineitem").select(col("l_returnflag").as("flag"),
        TextOps.portableHash28(concat(lit("hll:"), col("l_partkey").cast("string"))).as("h"))
      val regs = hashed
        .select(col("flag"), (col("h") % 64).as("idx"), expr("h div 64").as("w"))
        .withColumn("rho", when(col("w") === 0, lit(23))
          .otherwise(lit(23) - length(bin(col("w")))))
        .groupBy(col("flag"), col("idx")).agg(max(col("rho")).as("mreg"))
      val hll = regs.groupBy(col("flag"))
        .agg(sum(expr("shiftleft(1L, cast(23 - mreg AS int))")).as("s_present"),
          count(lit(1)).as("n_regs"))
        .select(col("flag"),
          (col("s_present") + (lit(64L) - col("n_regs")) * 8388608L).as("s_int"))
      val exact = t(dir, "lineitem").groupBy(col("l_returnflag").as("flag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      val pq = StatOps.rankQuantiles(t(dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          floor(col("l_extendedprice") * 100).cast("long").as("cents")))
      // rel error in FLOOR basis points — a pure integer quotient; the
      // round(x, 4) form can land on a half-way 5th decimal where Spark's
      // HALF_UP and DuckDB disagree (the q144 lesson)
      exact.join(hll, Seq("flag")).join(pq, Seq("flag"))
        .select(col("flag").as("l_returnflag"),
          expr("(709L * 4096L * 8388608L) div (1000L * s_int)").as("hll_est"),
          col("exact_parts"),
          expr("""(abs((709L * 4096L * 8388608L) div (1000L * s_int)
                 - exact_parts) * 10000) div exact_parts""").as("rel_err_bp"),
          col("p50_cents"), col("p99_cents"))
        .orderBy(col("l_returnflag"))
    },

    "q138_hll_merge" -> { (s, dir) => implicit val sp = s
      // sketch MERGEABILITY, oracle-visible: registers built at the FINE
      // grain (returnflag × linestatus) then merged upward by per-register
      // max must equal registers built directly at the coarse grain — max
      // is associative, so the q35 HLL is a true partial aggregate:
      // 64 ints per group ship from every executor and merge at any tree
      // depth (the 100 TB property; the exact countDistinct shuffle is
      // what it replaces). est_merged == est_direct by construction, and
      // the oracle recomputes BOTH paths — the equality is hash-gated,
      // not asserted.
      val rho = t(dir, "lineitem").select(col("l_returnflag").as("flag"),
          col("l_linestatus").as("ls"),
          TextOps.portableHash28(concat(lit("hll:"), col("l_partkey").cast("string"))).as("h"))
        .select(col("flag"), col("ls"), (col("h") % 64).as("idx"), expr("h div 64").as("w"))
        .withColumn("rho", when(col("w") === 0, lit(23))
          .otherwise(lit(23) - length(bin(col("w")))))
      val fine = rho.groupBy(col("flag"), col("ls"), col("idx")).agg(max(col("rho")).as("mreg"))
      val merged = fine.groupBy(col("flag"), col("idx")).agg(max(col("mreg")).as("mreg"))
      val direct = rho.groupBy(col("flag"), col("idx")).agg(max(col("rho")).as("mreg"))
      def est(regs: DataFrame, alias: String) = regs.groupBy(col("flag"))
        .agg(sum(expr("shiftleft(1L, cast(23 - mreg AS int))")).as("sp"),
          count(lit(1)).as("nr"))
        .select(col("flag"), expr(
          "(709L * 4096L * 8388608L) div (1000L * (sp + (64 - nr) * 8388608L))").as(alias))
      est(merged, "est_merged").join(est(direct, "est_direct"), Seq("flag"))
        .join(t(dir, "lineitem").groupBy(col("l_returnflag").as("flag"))
          .agg(countDistinct(col("l_partkey")).as("exact_parts")), Seq("flag"))
        .select(col("flag").as("l_returnflag"), col("est_merged"),
          col("est_direct"), col("exact_parts"))
        .orderBy(col("l_returnflag"))
    },

    // ---- text / documents (training-data ops) ----
    "q14_dedup_exact" -> { (s, dir) => implicit val sp = s
      // exact dedup: hash-groupBy on content digest, keep lowest id
      t(dir, "documents")
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("content_hash"))
    },
    "q15_token_stats" -> { (s, dir) => implicit val sp = s
      // whitespace token counting via occurrence arithmetic (identical
      // semantics in Spark and DuckDB, unlike regex splits)
      t(dir, "documents")
        .select(col("doc_id"), col("lang"),
          (length(col("text")) - length(regexp_replace(col("text"), lit(" "), lit(""))) + lit(1))
            .cast("long").as("n_tokens"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy(col("doc_id"))
    },
    "q16_lang_profile" -> { (s, dir) => implicit val sp = s
      t(dir, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), round(avg(col("n_chars")), 4).as("avg_chars"))
        .orderBy(col("lang"), col("source"))
    },

    // ---- vectors / similarity search ----
    "q17_knn_quantized" -> { (s, dir) => implicit val sp = s
      // brute-force top-3 by quantized dot product; the 20-row query side is
      // broadcast so the 5k-row base never shuffles. Quantization (×1000,
      // floor, int64) makes scores exact integers => engine-independent.
      val emb = t(dir, "embeddings").select(col("vec_id"),
        expr("transform(embedding, v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000) AS BIGINT))").as("qe"))
      val probes = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("qe").as("qa"))
      val base = emb.select(col("vec_id").as("neighbor_id"), col("qe").as("qb"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("dot").desc, col("neighbor_id"))
      base.join(broadcast(probes), col("neighbor_id") =!= col("query_id"))
        .withColumn("dot",
          graft.functions.LongArrayDot.longDot(col("qa"), col("qb")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("neighbor_id"), col("dot"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    },

    // ---- events / json ----
    "q18_json_extract" -> { (s, dir) => implicit val sp = s
      events(dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy(col("event_id"))
    },
    "q19_event_windows" -> { (s, dir) => implicit val sp = s
      // tumbling 1 h event-time windows — batch twin of the streaming agg
      events(dir)
        .groupBy(window(col("tsx"), "1 hour").as("win"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(unix_micros(col("win.start")).as("window_start_us"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy(col("window_start_us"), col("event_type"))
    })

  /** DuckDB-runnable SQL oracles, column-name-aligned with [[all]]. */
  def oracles: Map[String, String] = {
    val fileRelSql =
      s"""SELECT l_orderkey, l_linenumber, l_returnflag AS pk,
         |  CAST(l_linenumber % 3 AS INT) AS content,
         |  CAST(FLOOR(l_extendedprice * 1000) AS BIGINT) AS size
         |FROM lineitem""".stripMargin
    Map(
      "q1_pricing_summary" ->
        """SELECT l_returnflag, l_linestatus,
          |  round(sum(l_quantity), 2) AS sum_qty,
          |  round(sum(l_extendedprice), 2) AS sum_base_price,
          |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
          |  round(avg(l_quantity), 4) AS avg_qty,
          |  count(*) AS count_order
          |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
          |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
      // NOTE: DuckDB sum(BIGINT) yields HUGEINT (float64/object in pandas);
      // Spark emits int64 — every integer sum must be CAST back to BIGINT or
      // the driver's dtype-sensitive hash mismatches on equal values.
      "q2_file_stats" ->
        s"""SELECT count(*) AS file_count, CAST(sum(size) AS BIGINT) AS total_size,
           |  CAST(sum(size // $fetchSize + 2) AS BIGINT) AS scan_overhead,
           |  count(CASE WHEN content = 0 THEN 1 END) AS data_count,
           |  CAST(sum(CASE WHEN content = 0 THEN size END) AS BIGINT) AS data_size,
           |  count(DISTINCT pk) AS n_partitions,
           |  round(CAST(sum(CASE WHEN content = 0 THEN size END) AS DOUBLE)
           |        / count(CASE WHEN content = 0 THEN 1 END), 4) AS avg_data_size
           |FROM ($fileRelSql)""".stripMargin,
      "q3_partition_stats" ->
        s"""SELECT pk, count(*) AS file_count, CAST(sum(size) AS BIGINT) AS total_size,
           |  CAST(sum(size // $fetchSize + 2) AS BIGINT) AS scan_overhead,
           |  min(size) AS min_size, max(size) AS max_size
           |FROM ($fileRelSql) GROUP BY pk ORDER BY pk""".stripMargin,
      "q4_worst_partition" ->
        s"""SELECT pk, count(*) AS file_count, CAST(sum(size) AS BIGINT) AS total_size
           |FROM ($fileRelSql) GROUP BY pk
           |ORDER BY total_size DESC, pk LIMIT 1""".stripMargin,
      "q5_read_costs" ->
        s"""SELECT l_orderkey, l_linenumber, size, size // $fetchSize + 2 AS read_cost
           |FROM ($fileRelSql) ORDER BY l_orderkey, l_linenumber""".stripMargin,
      "q6_revenue_by_region" ->
        """SELECT r_name, round(sum(o_totalprice), 2) AS revenue,
          |  count(DISTINCT o_custkey) AS n_customers, count(*) AS n_orders
          |FROM orders
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY r_name ORDER BY r_name""".stripMargin,
      "q7_customers_with_orders" ->
        """SELECT c_custkey, c_name FROM customer
          |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
          |ORDER BY c_custkey""".stripMargin,
      "q8_customers_no_big_order" ->
        """SELECT c_custkey, c_name FROM customer
          |WHERE NOT EXISTS (SELECT 1 FROM orders
          |  WHERE o_custkey = c_custkey AND o_totalprice > 350000)
          |ORDER BY c_custkey""".stripMargin,
      "q9_top_orders_per_customer" ->
        """SELECT o_custkey, o_orderkey, totalprice, rank FROM (
          |  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
          |    row_number() OVER (PARTITION BY o_custkey
          |      ORDER BY o_totalprice DESC, o_orderkey) AS rank
          |  FROM orders) WHERE rank <= 3 ORDER BY o_custkey, rank""".stripMargin,
      "q10_sessionize" ->
        """WITH g AS (
          |  SELECT user_id, epoch_us(ts) AS ts_us,
          |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
          |  FROM events)
          |SELECT user_id,
          |  CAST(sum(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
          |  count(*) AS n_events
          |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
      "q30_running_total" ->
        """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
          |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
          |    ORDER BY o_orderdate, o_orderkey
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
          |FROM orders WHERE o_custkey <= 100
          |ORDER BY o_custkey, o_orderkey""".stripMargin,
      "q31_asof_join" ->
        """WITH signups AS (
          |  SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS signup_id
          |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2),
          |purchases AS (
          |  SELECT user_id, epoch_us(ts) AS ts_us, event_id
          |  FROM events WHERE event_type = 'purchase')
          |SELECT p.event_id, p.user_id, p.ts_us, s.signup_id AS asof_signup_id
          |FROM purchases p
          |ASOF LEFT JOIN signups s
          |  ON p.user_id = s.user_id AND s.ts_us <= p.ts_us
          |ORDER BY p.event_id""".stripMargin,
      "q38_sql_correlated" ->
        """SELECT o_custkey, count(*) AS n_above
          |FROM orders o
          |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders i
          |                      WHERE i.o_custkey = o.o_custkey)
          |GROUP BY o_custkey
          |ORDER BY o_custkey""".stripMargin,
      "q39_pivot" ->
        """SELECT l_returnflag,
          |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F,
          |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      "q33_regex_tokens" ->
        """SELECT n_word, n_num, n_punct, count(*) AS n_events FROM (
          |  SELECT CAST(len(regexp_extract_all(props, '[A-Za-z]+')) AS BIGINT) AS n_word,
          |         CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_num,
          |         CAST(len(regexp_extract_all(props, '[^A-Za-z0-9 ]+')) AS BIGINT) AS n_punct
          |  FROM events)
          |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
      "q34_lead_ntile" ->
        """SELECT o_custkey, o_orderkey,
          |  lead(o_orderkey, 1) OVER w AS next_key,
          |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
          |FROM orders WHERE o_custkey <= 50
          |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
          |ORDER BY o_custkey, o_orderkey""".stripMargin,
      "q35_sketches" ->
        """WITH h AS (
          |  SELECT l_returnflag AS flag,
          |    CAST('0x' || substring(md5('hll:' || CAST(l_partkey AS VARCHAR)), 1, 7) AS BIGINT) AS h
          |  FROM lineitem),
          |rw AS (SELECT flag, h % 64 AS idx, h // 64 AS w FROM h),
          |regs AS (
          |  SELECT flag, idx,
          |    max(CASE WHEN w = 0 THEN 23 ELSE 23 - length(bin(w)) END) AS mreg
          |  FROM rw GROUP BY flag, idx),
          |s AS (
          |  SELECT flag,
          |    sum(CAST(1 AS BIGINT) << CAST(23 - mreg AS INT))
          |      + (64 - count(*)) * 8388608 AS s_int
          |  FROM regs GROUP BY flag),
          |ex AS (
          |  SELECT l_returnflag AS flag,
          |    CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts
          |  FROM lineitem GROUP BY 1),
          |cents AS (
          |  SELECT l_returnflag AS flag,
          |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem),
          |rk AS (
          |  SELECT flag, cents,
          |    row_number() OVER (PARTITION BY flag ORDER BY cents) AS rn,
          |    count(*) OVER (PARTITION BY flag) AS n
          |  FROM cents),
          |pq AS (
          |  SELECT flag,
          |    max(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS p50_cents,
          |    max(CASE WHEN rn = (99 * n + 99) // 100 THEN cents END) AS p99_cents
          |  FROM rk WHERE rn = (n + 1) // 2 OR rn = (99 * n + 99) // 100
          |  GROUP BY flag)
          |SELECT ex.flag AS l_returnflag,
          |  CAST((CAST(709 AS BIGINT) * 4096 * 8388608) // (1000 * s.s_int) AS BIGINT) AS hll_est,
          |  ex.exact_parts,
          |  CAST((abs((CAST(709 AS BIGINT) * 4096 * 8388608) // (1000 * s.s_int)
          |    - ex.exact_parts) * 10000) // ex.exact_parts AS BIGINT) AS rel_err_bp,
          |  pq.p50_cents, pq.p99_cents
          |FROM ex JOIN s ON ex.flag = s.flag JOIN pq ON ex.flag = pq.flag
          |ORDER BY l_returnflag""".stripMargin,
      "q138_hll_merge" ->
        """WITH rho AS (
          |  SELECT l_returnflag AS flag, l_linestatus AS ls,
          |    h % 64 AS idx, h // 64 AS w,
          |    CASE WHEN h // 64 = 0 THEN 23 ELSE 23 - length(bin(h // 64)) END AS rho
          |  FROM (SELECT l_returnflag, l_linestatus,
          |          CAST('0x' || substring(md5('hll:' || CAST(l_partkey AS VARCHAR)), 1, 7) AS BIGINT) AS h
          |        FROM lineitem)),
          |fine AS (SELECT flag, ls, idx, max(rho) AS mreg FROM rho GROUP BY flag, ls, idx),
          |merged AS (SELECT flag, idx, max(mreg) AS mreg FROM fine GROUP BY flag, idx),
          |direct AS (SELECT flag, idx, max(rho) AS mreg FROM rho GROUP BY flag, idx),
          |em AS (
          |  SELECT flag, CAST((CAST(709 AS BIGINT) * 4096 * 8388608)
          |    // (1000 * (sum(CAST(1 AS BIGINT) << CAST(23 - mreg AS INT))
          |        + (64 - count(*)) * 8388608)) AS BIGINT) AS est_merged
          |  FROM merged GROUP BY flag),
          |ed AS (
          |  SELECT flag, CAST((CAST(709 AS BIGINT) * 4096 * 8388608)
          |    // (1000 * (sum(CAST(1 AS BIGINT) << CAST(23 - mreg AS INT))
          |        + (64 - count(*)) * 8388608)) AS BIGINT) AS est_direct
          |  FROM direct GROUP BY flag),
          |ex AS (
          |  SELECT l_returnflag AS flag,
          |    CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts
          |  FROM lineitem GROUP BY 1)
          |SELECT ex.flag AS l_returnflag, em.est_merged, ed.est_direct, ex.exact_parts
          |FROM ex JOIN em ON ex.flag = em.flag JOIN ed ON ex.flag = ed.flag
          |ORDER BY l_returnflag""".stripMargin,
      "q32_percentiles" ->
        """SELECT l_returnflag,
          |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
          |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
          |  round(quantile_cont(l_discount, 0.25), 4) AS p25_disc
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      "q11_rollup" ->
        """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
          |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
          |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
      "q12_nation_keys_union" ->
        """SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
          |UNION SELECT CAST(s_nationkey AS INT) FROM supplier ORDER BY nationkey""".stripMargin,
      "q13_nation_keys_except" ->
        """SELECT CAST(n_nationkey AS INT) AS nationkey FROM nation
          |EXCEPT SELECT CAST(s_nationkey AS INT) FROM supplier ORDER BY nationkey""".stripMargin,
      "q14_dedup_exact" ->
        """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
          |FROM documents GROUP BY md5(text) ORDER BY content_hash""".stripMargin,
      "q15_token_stats" ->
        """SELECT doc_id, lang,
          |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
          |  CAST(length(text) AS BIGINT) AS n_chars
          |FROM documents ORDER BY doc_id""".stripMargin,
      "q16_lang_profile" ->
        """SELECT lang, source, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
          |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
      "q17_knn_quantized" ->
        """WITH q AS (
          |  SELECT vec_id, list_transform(embedding,
          |    v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000) AS BIGINT)) AS qe
          |  FROM embeddings),
          |pairs AS (
          |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
          |    CAST(list_sum(list_apply(range(1, len(a.qe) + 1),
          |      i -> a.qe[i] * b.qe[i])) AS BIGINT) AS dot
          |  FROM q a JOIN q b ON b.vec_id <> a.vec_id
          |  WHERE a.vec_id < 20),
          |ranked AS (
          |  SELECT *, row_number() OVER (PARTITION BY query_id
          |    ORDER BY dot DESC, neighbor_id) AS rank FROM pairs)
          |SELECT query_id, neighbor_id, dot, rank FROM ranked
          |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
      "q18_json_extract" ->
        """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          |FROM events ORDER BY event_id""".stripMargin,
      "q19_event_windows" ->
        """SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, event_type,
          |  count(*) AS n, round(sum(value), 2) AS sum_value
          |FROM events GROUP BY 1, 2 ORDER BY window_start_us, event_type""".stripMargin)
  }
}
