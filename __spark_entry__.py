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
# Round-7 rotation: round 6's window gave first driver rows to the
# round-4 leftovers + early round-5 newcomers (41 hash-green + 9
# rows-only in CORRECTNESS_r06, zero failures). This round the window
# turns over to the 65-query driver-blind backlog VERDICT r6 item #1
# fixed, in its priority order: the 16 remaining round-5 phase-19..25
# newcomers, the 7 phase-26..28 newcomers, then the first 26 round-6
# newcomers (phases 29..34). Kept: the flagship q_pivot_count (entry()
# twin, anchors driver t1/t2 parity).
_WINDOW = [
    "q_pivot_count",  # flagship (entry); anchors driver t1/t2 parity
    # -- remaining round-5 phase-19..25 newcomers, never driver-windowed --
    "q_qq_deciles",
    "q_autocorrelation",
    "q_category_drift",
    "q_xml_roundtrip",
    "q_from_xml",
    "q_interval_join",
    "q_domain_cap",
    "q_share_of_parent",
    "q_join_card_est",
    "q_bitmap_rollup",
    "q_markov_stationary",
    "q_tree_rollup",
    "q_dp_counts",
    "q_string_agg",
    "q_pivot_multi_agg",
    "q_rolling_median",
    # -- round-5 phase-26..28 newcomers --
    "q_epoch_shuffle",
    "q_rare_category_merge",
    "q_join_strategy_census",
    "q_ab_srm_check",
    "q_funnel_latency",
    "q_revenue_bridge",
    "q_calendar_heatmap",
    # -- round-6 phase-29..31 newcomers (all oracle-checked) --
    "q_pagerank_exact",
    "q_dataset_card",
    "q_pii_scrub",
    "q_cross_source_overlap",
    "q_vocab_growth",
    "q_ngram_coverage",
    "q_customer_ltv",
    "q_scd2_asof_enrich",
    "q_reservoir_sample",
    "q_key_skew_audit",
    "q_gdpr_delete_audit",
    "q_embedding_norm_audit",
    "q_shard_rollup_merge",
    "q_hash_uniformity",
    "q_rec_coverage",
    "q_price_elasticity",
    "q_duplicate_payments",
    "q_cohort_ltv_curve",
    "q_ship_latency",
    "q_zorder_stats",
    "q_format_federation",
    # -- round-6 phase-34 evaluation-metric newcomers (oracle-checked) --
    "q_auc",
    "q_calibration_bins",
    "q_lorenz_curve",
    "q_tokenizer_fertility",
    "q_pca_power",
]
# Round-8 rotation queue (still driver-blind after r7, priority order):
# the round-6 phase-35 mixture newcomers -- q_l_diversity, q_modularity,
# q_ipf_raking, q_js_divergence; phase-36 training-ops -- q_hard_negatives,
# q_negative_sampling, q_dim_truncation_recall, q_quantile_normalize;
# phase-37 drift -- q_wasserstein, q_spearman, q_burstiness, q_ece;
# phase-38/39 clustering -- q_kmeans_exact, q_dbscan_labels,
# q_silhouette, q_cluster_scatter; then any round-7 newcomers.


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.10 / §3."""
    assert len(_WINDOW) <= 50, "driver window is 50 queries"
    ordered = [k for k in _WINDOW if k in QUERIES]
    ordered += [k for k in QUERIES if k not in _WINDOW]
    return {k: QUERIES[k] for k in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every value-hash-checkable query."""
    return dict(ORACLE)
