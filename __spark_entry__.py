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
# Round-4 rotation: rounds 1-3 left 39 queries driver-blind (local-pass
# or pytest-only). This round ALL 39 enter the window, displacing the
# r1/r2/r3-stable passers (their green rows are on record in
# CORRECTNESS_r01..r03; re-checking them adds no information). Kept
# in-window besides the 39: the flagship q_pivot_count (entry() twin),
# and the two repaired oracles q_dq_constraints / q_fk_orphans whose
# round-3 HUGEINT dtype defect needs a driver-green row to close.
_WINDOW = [
    "q_pivot_count",  # flagship (entry); anchors driver t1/t2 parity
    "q_dq_constraints",  # r3 hash-FAIL, oracle SUMs now CAST to BIGINT
    "q_fk_orphans",  # same latent defect fixed; first driver row
    # -- never-windowed, oracle-checked (judge-local-pass in r3) --
    "q_rollup_counts",
    "q_cube_counts",
    "q_grouping_sets",
    "q_stats_agg",
    "q_quantiles",
    "q_set_ops",
    "q_window_analytics",
    "q_pack_chunks",
    "q_bm25_rank",
    "q_pii_redact",
    "q_stratified_sample",
    "q_repetition",
    "q_curriculum_buckets",
    "q_zorder_value",
    "q_schema_evolution",
    "q_partitioned_sink",
    "q_train_val_split",
    "q_global_index",
    "q_unigram_score",
    "q_boilerplate_strip",
    "q_upsert_partition",
    "q_orc_roundtrip",
    "q_hopping_window_batch",
    "q_inverted_index",
    "q_zscore_outliers",
    # -- never-windowed, rows-only by design (pytest-pinned invariants) --
    "q_pq_topk",
    "q_seq_pack",
    "q_incremental_neardup",
    "q_compact_files",
    "q_multimodal_resize",
    "q_multimodal_audio",
    "q_kmeans_clusters",
    "q_hll_merge",
    "q_random_projection",
    "q_projection_distortion",
    "q_bpe_vocab",
    "q_bpe_encode",
    "q_pagerank",
    # -- new in round 4 --
    "q_ewma_chunked",  # chunked==sequential proof vs the list_reduce oracle
    "q_stream_parity",  # stream==batch census, driver-visible for the first time
    "q_prefix_jaccard_join",  # prefix-filter completeness vs quadratic oracle
    "q_heavy_hitters",  # pre-join skew audit, TakeOrderedAndProject plan
    "q_stratified_fixed_n",  # exact-N deterministic eval-split sampling
    "q_cdc_apply",  # Delta-MERGE changelog semantics vs relational oracle
    "q_max_concurrency",  # distributed +1/-1 sweep vs window-sum oracle
    "q_bfs_hops",  # iterative BFS vs recursive-CTE oracle — full hash proof
    "q_containment_join",  # probe-prefix completeness vs quadratic oracle
]
# Round-5 rotation queue (driver-blind after r4, in priority order):
# phase-5/6 newcomers — q_bloom_join (bloom pruned==unpruned join
# proof), q_skyline (two-phase frontier vs quadratic NOT EXISTS
# oracle), q_frequent_triples, q_doc_keyphrases, q_graph_jaccard,
# q_winsorize, q_seasonal_anomaly, q_k_anonymity,
# q_time_decay_attribution, q_corr_matrix, q_woe_iv,
# q_closeness (multi-seed BFS vs recursive-CTE oracle), q_streaks,
# q_degree_distribution, q_capped_runsum (chunked clamp == sequential
# list_reduce proof), q_allocation, q_cusum, q_lm_perplexity,
# q_item_cf_recs, q_rolling_corr, q_quarantine, q_partition_gaps,
# q_bootstrap_ci, q_holt_trend (chunked matrix-affine scan vs
# recursive-CTE oracle), q_cdc_extract (extract/apply round-trip),
# q_ndcg, q_bucketed_join (exchange-free co-located join, asserted at
# build), q_did, q_assortativity, q_powerlaw_fit, q_ivf_sweep,
# q_stream_totals (applyInPandasWithState census), q_rrf_fusion,
# q_multimodal_pipeline (staged-funnel census), q_benford,
# q_stl_decompose, q_event_pattern (CEP regex over ordered event
# sequences), q_join_fanout (exact pre-join cardinality audit),
# q_partition_skew, q_fiscal_rollup, q_cumulative_users,
# q_stream_join / q_stream_late (rows-only censuses); then:
# oracle-checked — q_ks_test (exact distributed KS), q_gini,
# q_sparse_cosine, q_weighted_median, q_survival, q_ab_test,
# q_chi_square, q_psi, q_mutual_info, q_target_encode,
# q_growth_accounting, q_label_centroids, q_rolling_range,
# q_mad_outliers, q_histogram, q_group_trend, q_basket_lift,
# q_weighted_sample, q_transition_matrix, q_token_budget_fill,
# q_percent_rank, q_window_distinct, q_event_trigrams, q_trending,
# q_interarrival, q_forecast_backtest, q_seasonality, q_hhi;
# rows-only — q_stream_sessions, q_kcore, q_leakage_safe_split,
# q_approx_quantiles, q_canonical_docs, q_minhash_calibration,
# q_timed_funnel, q_label_prop, q_cm_sketch.


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.10 / §3."""
    assert len(_WINDOW) <= 50, "driver window is 50 queries"
    ordered = [k for k in _WINDOW if k in QUERIES]
    ordered += [k for k in QUERIES if k not in _WINDOW]
    return {k: QUERIES[k] for k in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every value-hash-checkable query."""
    return dict(ORACLE)
