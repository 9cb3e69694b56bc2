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
# Round-9 rotation (VERDICT r8 item #2): flagship + the ten remaining
# driver-blind queries — the phase-47 six (window was full at 50 in r8)
# and the phase-48 four (shipped ungated in the r8 snapshot; fixed +
# pytest-pinned this round in tests/test_phase48.py) — plus the round-9
# newcomers as their phases land, topped up with a staleness-refresher
# slice of the OLDEST previously-verified rows (last driver row r1/r2).
# After this window lands, every declared query has held ≥1 driver
# CORRECTNESS row — the first round with zero driver-blind queries.
# _REFRESHERS is trimmed automatically as newcomers are appended.
_NEWCOMERS_R9: list[str] = [
    # appended per round-9 phase as each lands (gated by make round-gate)
    # -- phase 49: classical tests + agreement + permutation inference --
    "q_kruskal_wallis",
    "q_wilcoxon_signed",
    "q_mcnemar",
    "q_jarque_bera",
    "q_cluster_agreement",
    "q_brier_decomp",
    "q_permutation_test",
    # -- phase 50: multi-rater reliability + internal consistency --
    "q_fleiss_kappa",
    "q_cochran_q",
    "q_cronbach_alpha",
    "q_icc",
    # -- phase 51: time-series diagnostics + robust trend + integrity --
    "q_ljung_box",
    "q_durbin_watson",
    "q_theil_sen",
    "q_table_fingerprint",
    "q_stream_state_census",
    # -- phase 52: trend tests, changepoint, regression influence --
    "q_mann_kendall",
    "q_binseg_changepoint",
    "q_ols_influence",
    "q_grubbs",
    # -- phase 53: sampling design, inequality, ordinal agreement --
    "q_neyman_allocation",
    "q_atkinson",
    "q_weighted_kappa",
    "q_somers_d",
    # -- phase 54: greedy selection (MMR diversity, submodular coverage) --
    "q_mmr_select",
    "q_greedy_coverage",
    # -- phase 55: probability-model evaluation --
    "q_hosmer_lemeshow",
    "q_gains_lift",
    # -- phase 56: experiment-design completions --
    "q_tost_equivalence",
    "q_power_sample_size",
    "q_cramers_v",
    # -- phase 57: effect sizes + interval estimation --
    "q_hedges_g",
    "q_corr_ci",
    "q_wilson_ci",
]

# Stalest previously-verified rows (last driver CORRECTNESS row in
# r1/r2) — the refresher slice; trimmed automatically as newcomers land.
_REFRESHERS = [
    "q_array_first",
    "q_boolean_mask_filter",
    "q_cast",
    "q_ci_substring_filter",
    "q_concat",
    "q_drop_columns",
    "q_equality_filter",
    "q_fixed_replace",
    "q_isin_filter",
    "q_literal_table",
    "q_parity_math",
    "q_projection_rename",
    "q_regexp_extract",
    "q_regexp_replace",
    "q_sort_desc",
    "q_union_all",
    "q_uuid",
    "q_year_extract",
    "q_active_sessions",
    "q_ann_lsh_pairs",
    "q_approx_distinct",
    "q_array_contains",
    "q_array_last",
    "q_base64_roundtrip",
    "q_binary_meta",
    "q_boolean_any_agg",
    "q_conditional_expr",
    "q_csv_sink",
    "q_dedup_keep_latest",
    "q_derived_key_join",
    "q_dir_catalog",
    "q_doc_fingerprint",
    "q_embedding_neardup",
    "q_html_text_source",
    "q_lang_id",
    "q_lookup_join",
    "q_near_dedup",
    "q_nested_projection",
    "q_ratio_aggregate",
]

_WINDOW = [
    "q_pivot_count",  # flagship (entry); anchors driver t1/t2 parity
    # -- phase-47 (window was full at 50 in r8) --
    "q_kendall_tau",
    "q_cohens_kappa",
    "q_levene_test",
    "q_runs_test",
    "q_jackknife_ratio",
    "q_monetary_unit_sample",
    # -- phase-48 (ungated in the r8 snapshot; fixed + pinned r9) --
    "q_cuped",
    "q_page_hinkley",
    "q_smd_balance",
    "q_gzip_ratio",
]
_WINDOW += [q for q in _NEWCOMERS_R9 if q not in _WINDOW]
_WINDOW += [q for q in _REFRESHERS if q not in _WINDOW][: 50 - len(_WINDOW)]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.10 / §3."""
    assert len(_WINDOW) <= 50, "driver window is 50 queries"
    ordered = [k for k in _WINDOW if k in QUERIES]
    ordered += [k for k in QUERIES if k not in _WINDOW]
    return {k: QUERIES[k] for k in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every value-hash-checkable query."""
    return dict(ORACLE)
