"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the legislator-bill-counts
pivot analog) at sf0.001. ``queries()``/``oracle_sql()`` expose the full
declared operator inventory from
``legislative_bills_database_spark.plans`` (SURVEY.md §2): every query
with a DuckDB-expressible twin carries oracle SQL; nondeterministic or
non-SQL ops (uuid, xxhash64-based LSH, HLL, pandas-UDF plumbing) are
declared without one → rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from legislative_bills_database_spark.plans import ORACLE, QUERIES
from legislative_bills_database_spark.session import tune_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Passed-order counts per customer pivoted by year — the engine analog
    of the reference's legislator×session passed-bill matrix
    (legislator_bill_counts_run.R:89-124): scan → filter → broadcast join
    → pivot count.
    """
    tune_session(spark)
    return QUERIES["q_pivot_count"](spark, SMOKE_SF_DIR)


# The driver's correctness check caps at the first ~50 registered queries
# (CORRECTNESS_r01 stopped at 50). Every declared query still gates
# locally (tests/test_oracle_parity.py + scripts/preflight.py at driver
# parity); the first-50 window below is rotated each round so queries
# that have never had a driver-verified row get one.
#
# Round-6 rotation: round 5's window gave first driver rows to the
# round-4 phase-5..18 newcomers (44 hash-green + 6 rows-only in
# CORRECTNESS_r05, zero failures). This round the window turns over to
# the remaining driver-blind backlog in the priority order VERDICT r5
# fixed: the 31 oracle-checked round-4 leftovers, the 9 rows-only
# leftovers, then the first 9 of the 25 round-5 phase-19..25 newcomers.
# Kept: the flagship q_pivot_count (entry() twin, anchors driver t1/t2
# parity).
_WINDOW = [
    "q_pivot_count",  # flagship (entry); anchors driver t1/t2 parity
    # -- oracle-checked round-4 leftovers, never driver-windowed --
    "q_basket_lift",
    "q_weighted_sample",
    "q_timed_funnel",
    "q_token_budget_fill",
    "q_rolling_range",
    "q_mad_outliers",
    "q_histogram",
    "q_group_trend",
    "q_percent_rank",
    "q_window_distinct",
    "q_event_trigrams",
    "q_trending",
    "q_chi_square",
    "q_psi",
    "q_geo_rollup",
    "q_sourcing_depth",
    "q_behavior_entropy",
    "q_abc_classification",
    "q_conversion_paths",
    "q_attribution",
    "q_rfm_segments",
    "q_unpivot",
    "q_target_encode",
    "q_growth_accounting",
    "q_label_centroids",
    "q_forecast_backtest",
    "q_seasonality",
    "q_hhi",
    "q_mutual_info",
    "q_interarrival",
    "q_transition_matrix",
    # -- rows-only leftovers (nondeterministic / census by design) --
    "q_approx_quantiles",
    "q_canonical_docs",
    "q_minhash_calibration",
    "q_leakage_safe_split",
    "q_stream_sessions",
    "q_kcore",
    "q_stream_dedup",
    "q_cm_sketch",
    "q_label_prop",
    # -- first 9 of the round-5 phase-19..25 newcomers --
    "q_star_join",
    "q_kmv_distinct",
    "q_interval_coverage",
    "q_cc_labels",  # hash-certified components vs recursive-CTE fixpoint
    "q_sssp",
    "q_survivorship",
    "q_embedding_drift",
    "q_feature_hash",
    "q_fuzzy_decontaminate",
]
# Round-7 rotation queue (still driver-blind after r6, in priority
# order): the remaining 16 round-5 phase-19..25 newcomers --
# q_qq_deciles, q_autocorrelation, q_category_drift, q_xml_roundtrip,
# q_from_xml, q_interval_join, q_domain_cap, q_share_of_parent,
# q_join_card_est, q_bitmap_rollup, q_markov_stationary, q_tree_rollup,
# q_dp_counts, q_string_agg, q_pivot_multi_agg, q_rolling_median; then
# the round-5 phase-26..28 newcomers -- q_epoch_shuffle,
# q_rare_category_merge, q_join_strategy_census, q_ab_srm_check,
# q_funnel_latency, q_revenue_bridge, q_calendar_heatmap; then the
# round-6 phase-29..31 newcomers (all oracle-checked,
# preflight-green) -- q_pagerank_exact, q_dataset_card, q_pii_scrub,
# q_cross_source_overlap, q_vocab_growth, q_ngram_coverage,
# q_customer_ltv, q_scd2_asof_enrich, q_reservoir_sample,
# q_key_skew_audit, q_gdpr_delete_audit, q_embedding_norm_audit,
# q_shard_rollup_merge, q_hash_uniformity, q_rec_coverage,
# q_price_elasticity, q_duplicate_payments, q_cohort_ltv_curve,
# q_ship_latency, q_zorder_stats, q_format_federation; then the
# round-6 phase-34 evaluation-metric newcomers (all oracle-checked) --
# q_auc, q_calibration_bins, q_lorenz_curve, q_tokenizer_fertility,
# q_pca_power; then the phase-35 mixture newcomers (all
# oracle-checked) -- q_l_diversity, q_modularity, q_ipf_raking,
# q_js_divergence; then the phase-36 training-ops newcomers (all
# oracle-checked) -- q_hard_negatives, q_negative_sampling,
# q_dim_truncation_recall, q_quantile_normalize; then the phase-37
# drift newcomers (all oracle-checked) -- q_wasserstein, q_spearman,
# q_burstiness, q_ece; then the phase-38/39 clustering newcomers (all
# oracle-checked) -- q_kmeans_exact, q_dbscan_labels, q_silhouette,
# q_cluster_scatter.


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.10 / §3."""
    assert len(_WINDOW) <= 50, "driver window is 50 queries"
    ordered = [k for k in _WINDOW if k in QUERIES]
    ordered += [k for k in QUERIES if k not in _WINDOW]
    return {k: QUERIES[k] for k in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every value-hash-checkable query."""
    return dict(ORACLE)
