package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the properties that make these queries
  * scale (pushdown, pruning, broadcast strategy, no accidental cartesian)
  * asserted against the actual physical plans. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q1: shipdate filter pushed to parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
  }

  test("q2: column pruning — only 3 columns read") {
    val p = plan("q2_file_stats")
    assert(p.contains("ReadSchema: struct<l_linenumber:int,l_extendedprice:double,l_returnflag:string>"))
  }

  test("q6: all dimension joins broadcast, no sort-merge") {
    val p = plan("q6_revenue_by_region")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q7/q8: semi and anti joins planned") {
    assert(plan("q7_customers_with_orders").contains("LeftSemi"))
    assert(plan("q8_customers_no_big_order").contains("LeftAnti"))
  }

  test("q17: probe side broadcast, base never shuffled before join") {
    val p = plan("q17_knn_quantized")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(p.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,20)]"))
  }

  test("q22: equi-join on band key (no cartesian)") {
    val p = plan("q22_lsh_candidate_pairs")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q28: LSH prebucket join is an equi-join, not a cross join") {
    val p = plan("q28_embedding_neardup")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q49: probes broadcast; cell match is an equi-join") {
    val p = plan("q49_ivf_topk")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q46: token counts partially aggregated before the shuffle") {
    val p = plan("q46_token_topk")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q21/q23/q37: per-row signature queries plan NO exchange before write") {
    // signature computation is a pure projection — the only exchange
    // allowed is the final presentation sort's range partitioning
    for (q <- Seq("q21_minhash_signatures", "q23_simhash", "q37_winnowing")) {
      val p = plan(q)
      assert(!p.contains("hashpartitioning"), s"$q shuffles for a per-row signature:\n$p")
    }
  }

  test("q54: top-k UDAF aggregates partially (k rows per group) before the exchange") {
    val p = plan("q54_topk_agg")
    // partial + final ObjectHashAggregate pair around one exchange —
    // unlike the window formulation, which sorts every row of every group
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q73: PII scrub plans as a map-only scan (no exchange before the sort)") {
    val p = plan("q73_pii_redaction")
    assert(!p.contains("hashpartitioning"), s"q73 shuffles a pure projection:\n$p")
  }

  test("q74/q75: shingle joins are equi-joins, never cartesian") {
    for (q <- Seq("q74_dup_ngram_fraction", "q75_bloom_decontamination")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), q)
      assert(!p.contains("BroadcastNestedLoopJoin"), q)
    }
  }

  test("q75: bloom UDF prefilter present on the train side of the exact semi-join") {
    val p = plan("q75_bloom_decontamination")
    assert(p.contains("LeftSemi"), p)
    // the bloom prefilter is the only UDF in the plan: deleting the
    // .filter(mightHit(...)) line removes every UDF occurrence. (Plans
    // print root-first, so the child Filter appears AFTER the join line —
    // ordering of indexOf is NOT a valid upstream test.)
    assert(p.contains("UDF"), s"bloom prefilter UDF missing from plan:\n$p")
  }

  test("q74: per-hash frequency is a window over the existing partitioning, not a join-back") {
    val p = plan("q74_dup_ngram_fraction")
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), s"q74 should not join the shingle relation against itself:\n$p")
  }

  test("q80: contaminated-id anti-join present; release scoring stays join-free downstream") {
    val p = plan("q80_corpus_release")
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q76: CDC merge is one shuffle on the key (window), partial-agg'd summary") {
    val p = plan("q76_cdc_upsert")
    assert(p.contains("Window"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q79: centroid join broadcast; pair join is an equi-join on (cid, blk)") {
    val p = plan("q79_semdedup")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q82: packing is ONE lang exchange + in-partition sort, no join") {
    val p = plan("q82_sequence_packing")
    assert(p.contains("hashpartitioning(lang"), p)
    assert(!p.contains("Join"), p)
  }

  test("q84: candidate recount joins via BROADCAST semi-join, stream never sort-merged") {
    val p = plan("q84_heavy_hitters")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q86: customer dimension broadcast, no cartesian") {
    val p = plan("q86_ship_priority")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // segment filter reaches the customer parquet scan
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
  }

  test("q88: incremental merge is a union of partial aggs — no join anywhere") {
    val p = plan("q88_incremental_agg")
    assert(p.contains("Union"), p)
    assert(!p.contains("Join"), p)
  }

  test("q90: KMV sketch aggregates partially (ObjectHashAggregate) before the exchange") {
    val p = plan("q90_kmv_distinct")
    // the typed UDAF plans as ObjectHashAggregate with a partial_minik pass
    assert(p.contains("ObjectHashAggregate"), p)
  }

  test("q91: co-purchase self-join and rank iterations are equi-joins, no cartesian") {
    val p = plan("q91_part_pagerank")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q93: codes never touch raw vectors — LUT joins broadcast, no cartesian") {
    val p = plan("q93_pq_adc_search")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("new SQL functions usable from spark.sql") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT minhash_sig(split('a b c d', ' ')) AS mh,
        |       simhash_sig(split('a b c', ' ')) AS sh,
        |       winnow_fingerprints(split('a b c d e f', ' ')) AS wf,
        |       double_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dd
        |""".stripMargin).head()
    assert(r.getSeq[Long](0).length == 8)
    assert(r.getSeq[Long](2).length == 1)
    assert(r.getDouble(3) == 11.0)
  }

  test("aggregates are partial (map-side combine) around the exchange") {
    val p = plan("q3_partition_stats")
    // partial + final HashAggregate pair
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(p.contains("Exchange"))
  }

  test("partitioned write + partition pruning on read-back") {
    import org.apache.spark.sql.functions._
    val out = TestTmp.dir("graft_part")
    try {
      spark.read.parquet(s"$dir/orders.parquet")
        .write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
      val df = spark.read.parquet(out).filter(col("o_orderpriority") === "1-URGENT")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // pruning shows as a PartitionFilters entry on the scan, and the
      // filter must NOT appear as a post-scan data filter
      assert(plan.contains("PartitionFilters: [isnotnull(o_orderpriority"))
      assert(plan.contains("1-URGENT"))
      // the partition predicate must not survive as a post-scan Filter
      assert(!plan.contains("Filter (o_orderpriority"))
      val expected = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT").count()
      assert(df.count() == expected)
    } finally {
      def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
      rm(new java.io.File(out))
    }
  }

  test("bucketed tables join with ZERO exchanges (co-located join)") {
    import org.apache.spark.sql.functions._
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.read.parquet(s"$dir/orders.parquet")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("g_orders_bkt")
      spark.read.parquet(s"$dir/customer.parquet")
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("g_cust_bkt")
      val j = spark.table("g_orders_bkt")
        .join(spark.table("g_cust_bkt"), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // bucket-pruned co-location: the join needs NO shuffle at all
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS g_orders_bkt")
      spark.sql("DROP TABLE IF EXISTS g_cust_bkt")
    }
  }

  test("q100/q101: dimensions broadcast around ONE fact sort-merge join") {
    Seq("q100_local_supplier_volume", "q101_returned_item_losers").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: dimensions must broadcast")
      assert(!p.contains("CartesianProduct"), q)
      // the only non-broadcast join is lineitem⋈orders
      val sm = p.split("\n").count(l => l.contains("SortMergeJoin"))
      assert(sm <= 1, s"$q: more than one sort-merge join:\n$p")
    }
  }

  test("q101/q116: pushed filters reach the lineitem scan") {
    assert(plan("q101_returned_item_losers")
      .contains("EqualTo(l_returnflag,R)"), "returnflag must push down")
    assert(plan("q116_promo_share")
      .contains("PushedFilters: [IsNotNull(l_shipdate)"), "shipdate must push down")
  }

  test("q105: candidate generation is an equi-join, arrays re-attached by key") {
    val p = plan("q105_set_similarity_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"prefix join must stay an equi-join:\n$p")
  }

  test("q109: correlated-min is a partial-aggregated struct-min, not a window") {
    val p = plan("q109_min_cost_supplier")
    assert(!p.contains("Window"), "must not window the fact")
    assert(p.contains("partial_min") || p.contains("HashAggregate"),
      s"expected partial aggregation:\n$p")
  }

  test("q117: day spine broadcast, pre-aggregated input") {
    val p = plan("q117_rolling_distinct")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"spine must broadcast:\n$p")
  }

  test("q123: char-pair expansion runs over the word vocabulary, not the corpus") {
    // the plan aggregates words BEFORE the pair explode: exactly two
    // aggregates (word counts, pair counts) with the generate in between
    val p = plan("q123_bpe_pairs")
    val genIdx = p.indexOf("Generate explode")
    assert(genIdx >= 0, s"expected explode:\n$p")
    assert(p.substring(genIdx).contains("HashAggregate"),
      "pair counts must aggregate after the explode")
    assert(p.substring(0, genIdx).contains("HashAggregate"),
      "word counts must aggregate before the explode")
  }

  test("q139/q140: dims broadcast around ONE fact join, no cartesian") {
    Seq("q139_volume_shipping", "q140_market_share").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: dims must broadcast")
      assert(!p.contains("CartesianProduct"), s"$q: cartesian product leaked")
      // the only non-broadcast join is lineitem⋈orders on orderkey
      assert("SortMergeJoin".r.findAllIn(p).size <= 1, s"$q: extra wide join")
    }
  }

  test("q141: brand IN-list pushed into the part scan") {
    val p = plan("q141_disjunctive_revenue")
    assert(p.contains("In(p_brand"), s"brand filter not pushed:\n$p")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q142: anti join against recent orders is broadcast") {
    val p = plan("q142_dormant_customers")
    assert(p.contains("LeftAnti"))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
  }

  test("q156/q157/q159: TPC-H batch dims broadcast; Q15 max is a broadcast-back, not a window") {
    // Q9: name-filtered part + supplier + nation all broadcast — the fact
    // table's only shuffle is the (nation, year) aggregate
    val p156 = plan("q156_product_profit")
    assert(p156.contains("BroadcastHashJoin") && !p156.contains("SortMergeJoin"))
    // Q11: the 25-row national-totals aggregate broadcasts back; no window
    // re-sorts the (nation, part) aggregate
    val p157 = plan("q157_important_parts")
    assert(p157.contains("BroadcastHashJoin") && !p157.contains("Window"))
    // Q15: the classic max-revenue-view temptation is a global window;
    // this plan must realize it as a 1-row broadcast equality instead
    val p159 = plan("q159_top_supplier")
    assert(p159.contains("BroadcastHashJoin") && !p159.contains("Window"))
  }

  test("q163: Q21's double-EXISTS collapses to one rollup — lineitem scanned once, window keyed by order") {
    val p = plan("q163_waiting_suppliers")
    // no self-join: exactly one lineitem scan in the whole plan
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1, s"lineitem scanned more than once:\n$p")
    // the existentials ride a window PARTITIONED by l_orderkey (never global)
    assert(p.contains("Window") && p.contains("windowspecdefinition(l_orderkey"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q170: df and corpus-stat sides broadcast around the term-filtered scan") {
    val p = plan("q170_bm25")
    // the per-doc score joins tiny df/corpus relations into the tf side —
    // both must broadcast; a sort-merge here would shuffle the corpus
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q171: histogram is window-free — share via broadcast total, not a global window") {
    val p = plan("q171_k_anonymity")
    assert(!p.contains("Window"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("q172: power iterates join matrix-sized relations broadcast") {
    val p = plan("q172_power_iteration")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q177: truncation audit is one expand + agg — no join, no window") {
    val p = plan("q177_matryoshka_audit")
    assert(!p.contains("Join") && !p.contains("Window"))
    assert(p.contains("HashAggregate"))
  }

  test("whole-stage codegen active on the scan-project-agg path") {
    // AQE materializes the final plan only on execution; run, then inspect
    val df = SparkEntry.queries("q2_file_stats")(spark, dir)
    df.collect()
    // codegen'd operators carry the "*(stageId)" prefix in the final plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(") && p.contains("HashAggregate"))
  }

  test("NO catalog query plans a single-partition row-level global window") {
    // an empty-partitionSpec Window plans as Exchange SinglePartition + one
    // task sorting EVERY row — the wrong-shape-at-100× class the q95/q147
    // rangeCumsum rewrites eliminated; this pins the whole catalog against
    // regressing into it. Tiny per-GROUP windows (q145's ≤64 octave rows
    // per flag) and rangeCumsum's ≤1040-row bucket-offsets window (the one
    // structural exemption — see PlanScan.rowLevelGlobalWindows) stay
    // allowed because their state is bounded by construction.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        val globals = graft.tools.PlanScan.rowLevelGlobalWindows(
          fn(spark, dir).queryExecution.executedPlan)
        if (globals.nonEmpty) Seq(name) else Nil
      }
      assert(offenders.isEmpty, s"global-window scale-killers: $offenders")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
