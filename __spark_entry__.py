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
# Round-13 rotation (VERDICT r12 "Next round" items #1 and #7): the
# window is now COMPUTED, not hand-copied — scripts/window_plan.py
# derives it from the CORRECTNESS_r*.json ledger (flagship, then every
# query with no driver row in registry order, then refreshers
# oldest-round-first alphabetical, cap 50) and
# tests/test_window_plan.py pins this literal equal to its output.
# Hand-tallied counts drifted three rounds running (r10 "43 vs 47",
# r11 alphabetical truncation, r12 "9 vs 11 newcomers"); this ends
# that defect class. This round: flagship + ALL 25 no-driver-row
# newcomers (11 from r12 phases 89-99 + this round's 14, phases
# 100-112 — the mechanical newcomers-first policy gives brand-new
# queries driver rows immediately) + 24 of the 49 r4-era rows. The 25
# r4 rows that spill to r14 (named, recomputed by window_plan.py):
# q_orc_roundtrip, q_pack_chunks, q_pagerank, q_partitioned_sink,
# q_pii_redact, q_pq_topk,
# q_prefix_jaccard_join, q_projection_distortion,
# q_quantiles, q_random_projection, q_repetition, q_rollup_counts,
# q_schema_evolution, q_seq_pack, q_set_ops, q_stats_agg,
# q_stratified_fixed_n, q_stratified_sample, q_stream_parity,
# q_train_val_split, q_unigram_score, q_upsert_partition,
# q_window_analytics, q_zorder_value, q_zscore_outliers.
_WINDOW = [
    "q_pivot_count",  # flagship (entry); anchors driver t1/t2 parity
    # -- 25 newcomers (no driver row yet), registry order --
    "q_hmm_forward",
    "q_rowgroup_skip_census",
    "q_approx_ind",
    "q_stream_state_scale",
    "q_smith_waterman",
    "q_boruvka_mst",
    "q_hmm_posterior",
    "q_goertzel",
    "q_ar2_forecast",
    "q_exchange_reuse_census",
    "q_agg_pushdown_census",
    "q_multiterm_scale",
    "q_multiterm_folded",
    "q_kalman",
    "q_stream_tws_totals",
    "q_page_cusum",
    "q_f2_sketch",
    "q_fellegi_sunter",
    "q_dbscan",
    "q_greedy_matching",
    "q_parquet_bloom_census",
    "q_lof",
    "q_subseq_support",
    "q_window_topk_census",
    "q_fellegi_blocked",
    # -- 24 of the 49 r4-era refreshers (oldest era, alphabetical) --
    "q_bfs_hops",
    "q_bm25_rank",
    "q_boilerplate_strip",
    "q_bpe_encode",
    "q_bpe_vocab",
    "q_cdc_apply",
    "q_compact_files",
    "q_containment_join",
    "q_cube_counts",
    "q_curriculum_buckets",
    "q_dq_constraints",
    "q_ewma_chunked",
    "q_fk_orphans",
    "q_global_index",
    "q_grouping_sets",
    "q_heavy_hitters",
    "q_hll_merge",
    "q_hopping_window_batch",
    "q_incremental_neardup",
    "q_inverted_index",
    "q_kmeans_clusters",
    "q_max_concurrency",
    "q_multimodal_audio",
    "q_multimodal_resize",
]
assert len(_WINDOW) <= 50, f"driver window overflow: {len(_WINDOW)}"


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.10 / §3."""
    assert len(_WINDOW) <= 50, "driver window is 50 queries"
    ordered = [k for k in _WINDOW if k in QUERIES]
    ordered += [k for k in QUERIES if k not in _WINDOW]
    return {k: QUERIES[k] for k in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every value-hash-checkable query."""
    return dict(ORACLE)
