package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partition-count independence: the DuckDB hash gate only works because
  * every query's RESULT is independent of how Spark partitions the work.
  * This spec re-executes the shuffle-sensitive queries under three
  * different shuffle-partition settings and demands identical row sets —
  * the operational form of the exact-integer / fixed-IEEE / full-tie-break
  * discipline the operators document. */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  // queries whose shapes are most exposed to partitioning: multi-stage
  // aggregation (q84), candidate joins (q105), window crossings (q121),
  // iterative propagation (q42), float accumulation would-be hazards
  // (q100 revenue, q118 regression), struct-argmin (q109, q125)
  private val sensitive = Seq(
    "q84_heavy_hitters", "q105_set_similarity_join", "q121_weighted_median",
    "q42_dedup_clusters", "q100_local_supplier_volume", "q118_group_regression",
    "q109_min_cost_supplier", "q125_ohlc_bars", "q131_decay_score",
    // round 6: HLL register builds (max-merge across any partitioning),
    // rank-based quantiles (value-at-rank is tie-order-insensitive),
    // floor-ppm market share, hash-rank sampling, budget-admission cumsum
    "q35_sketches", "q138_hll_merge", "q140_market_share",
    "q143_balanced_sample", "q144_token_budget_trim", "q146_dim_covariance",
    // round 7: the rangeCumsum rewrites (global rank / global CDF /
    // grouped admission cumsum via q144 above) and the bit-packed bloom —
    // bucketed partials + broadcast offsets and bit_or words must not
    // depend on partitioning
    "q95_equidepth_histogram", "q147_ks_test", "q153_bloom_filter_semijoin",
    "q154_time_travel",
    // round 7 late batch: Q21's window-over-rollup existentials, the
    // min-k sketch merges behind the set algebra, and the sweep-line
    // running sum must all be merge-order-free
    "q163_waiting_suppliers", "q164_kmv_set_algebra", "q165_peak_concurrency",
    "q166_label_propagation", "q167_partition_fingerprint_diff",
    // round 8: BM25's fixed-order float assembly, the integer power
    // iterates, the mixed-spec layout profile (fixture written from a
    // grouped collect — its content must not depend on partitioning),
    // and the DP release's modular-arithmetic uniform
    "q170_bm25", "q172_power_iteration", "q173_spec_evolution",
    "q175_dp_release", "q176_manifest_skipping", "q177_matryoshka_audit",
    "q182_perplexity_filter",
    // round 8 batch 2: the MERGE upsert's write-then-MOR-read loop (the
    // update set is computed distributed, then committed), the entropy
    // gate's 27-term integer score, and the bucketed join (result must
    // not depend on the session's shuffle width — the join never
    // shuffles at all)
    "q183_merge_upsert", "q187_char_entropy", "q188_bucketed_join",
    "q190_robust_scaling", "q191_zorder_skipping", "q192_rewrite_data_files",
    "q193_delete_where", "q194_commit_audit", "q195_cdc_merge_commit",
    "q196_intersect", "q198_puffin_bloom_filter", "q199_file_sampling",
    "q200_corpus_release_table", "q201_dsv2_scan", "q202_dsv2_write_roundtrip",
    // round 9 batch 2: the span-key window (first-occurrence order), the
    // two-ranker RRF fusion (fixed two-term double sum), the DSIR
    // rational + TakeOrdered top-k, PSI's pre-floored micro terms, the
    // int8 quantization folds, the pos-delete fold's state equality, the
    // Σ√count fold (sorted-list, grouping-order-proof), the zipf
    // regression sums, and the exact-recall banding joins
    "q221_span_dedup", "q223_rrf_hybrid", "q226_dsir_select",
    "q229_psi_drift", "q231_int8_quant_audit", "q232_rewrite_pos_deletes",
    "q234_temperature_sampling", "q236_zipf_slope", "q237_image_neardup")

  private def run(q: String, parts: String): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      SparkEntry.queries(q)(spark, dir).collect().map(_.toString).sorted.toSeq
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  sensitive.foreach { q =>
    test(s"$q: identical results at 1, 5, and 17 shuffle partitions") {
      val base = run(q, "5")
      assert(base.nonEmpty)
      assert(run(q, "1") == base, s"$q diverges at 1 partition")
      assert(run(q, "17") == base, s"$q diverges at 17 partitions")
    }
  }

  test("AQE on/off does not change results (plan freedom, value identity)") {
    // AQE re-plans joins/partitions at runtime — results must not care
    Seq("q105_set_similarity_join", "q84_heavy_hitters", "q100_local_supplier_volume")
      .foreach { q =>
        val prev = spark.conf.get("spark.sql.adaptive.enabled")
        val on = run(q, "5")
        try {
          spark.conf.set("spark.sql.adaptive.enabled", "false")
          assert(run(q, "5") == on, s"$q diverges with AQE off")
        } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
      }
  }
}
