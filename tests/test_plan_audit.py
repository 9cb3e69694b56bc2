"""Physical-plan audits: the 100 TB posture as regression tests.

Correct answers are necessary but not sufficient — these tests pin the
PLAN SHAPE: broadcast joins where a dimension is bounded (a silent flip
to sort-merge is a full-cluster shuffle at scale), filter pushdown and
column pruning reaching the parquet scan, and shuffle counts that match
the operator's design notes.
"""

from __future__ import annotations

import pytest

from legislative_bills_database_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name",
    ["q_pivot_count", "q_semi_join", "q_lookup_join", "q_fallback_join",
     "q_derived_key_join"],
)
def test_bounded_dimension_joins_broadcast(spark, name):
    plan = _plan(spark, name)
    assert "BroadcastHashJoin" in plan, f"{name}: dimension join not broadcast"
    assert "SortMergeJoin" not in plan, f"{name}: unexpected sort-merge join"


def test_legislator_counts_no_broadcast_hint_on_fact_aggregate(spark):
    """The customer ⟕ pivoted-orders join must NOT carry an explicit
    broadcast HINT on the fact-derived aggregate (its size is unknowable
    at plan time and grows with scale — round-2 verdict). Without the
    hint the planner sizes it from stats: tiny at sf0.001 (broadcast is
    then its own choice, and AQE re-checks at runtime), sort-merge once
    the estimate crosses the threshold at scale."""
    df = QUERIES["q_pipeline_legislator_counts"](spark, SF_DIR)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "UnresolvedHint" not in analyzed, (
        "fact-derived aggregate carries a broadcast hint again"
    )
    assert "AdaptiveSparkPlan" in df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "q_equality_filter")
    assert "o_orderstatus" in plan and "1-URGENT" in plan
    # pushed into the scan, not a post-scan Filter-only plan
    scan_lines = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert any("o_orderstatus" in l for l in scan_lines)


def test_column_pruning_reaches_scan(spark):
    """q_text_stats touches only (doc_id, text) — the scan must not read
    lang/source/n_chars."""
    plan = _plan(spark, "q_text_stats")
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "doc_id" in scan and "text" in scan
    assert "n_chars" not in scan and "lang" not in scan


def test_keyword_search_pipeline_is_shuffle_free(spark):
    """search_all_bills core: one scan, OR-filter folded into it, ZERO
    exchanges (SURVEY §3.2: 'single stage, no shuffle')."""
    plan = _plan(spark, "q_pipeline_keyword_search")
    assert plan.count("Exchange hashpartitioning") == 0
    assert "Contains(text" in plan  # filter folded into the scan stage


def test_pivot_is_two_phase_hash_agg(spark):
    """Pivot = two hash aggregates ((group,pivot) then group) — partial
    map-side aggregation on both, and never a sort-based fallback."""
    plan = _plan(spark, "q_pivot_count")
    assert plan.count("Exchange hashpartitioning") == 2
    assert "SortAggregate" not in plan


def test_near_dedup_has_no_cross_join(spark):
    """MinHash LSH candidates come from a bucket equi-join — any
    nested-loop/cartesian product here is the O(n²) scale killer."""
    plan = _plan(spark, "q_near_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_lsh_has_no_cross_join(spark):
    plan = _plan(spark, "q_ann_lsh_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_exact_dedup_single_shuffle(spark):
    plan = _plan(spark, "q_exact_dedup")
    assert plan.count("Exchange hashpartitioning") == 1

def test_stratified_sample_is_shuffle_free(spark):
    """Deterministic sampling is a per-row filter — ANY exchange here
    means the operator stopped composing with scan pushdown."""
    plan = _plan(spark, "q_stratified_sample")
    assert plan.count("Exchange hashpartitioning") == 0


def test_mixture_sample_broadcasts_rate_table(spark):
    """The per-stratum rate table is dimension-bounded; the fact side
    must join it via broadcast, never sort-merge."""
    plan = _plan(spark, "q_data_mixture")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pack_chunks_single_group_shuffle(spark):
    """Concat-and-chunk = ONE exchange on the pack-group key feeding the
    window cumsum; a second exchange means the group key stopped being
    reused between the shuffle and the window."""
    plan = _plan(spark, "q_pack_chunks")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan


def test_decontaminate_broadcasts_benchmark_shingles(spark):
    """The benchmark shingle set is bounded by contract and must reach
    the training side as a broadcast; the training fact table must not
    be exchanged for the semi-join."""
    plan = _plan(spark, "q_decontaminate")
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_incremental_dedup_joins_on_hash_not_text(spark):
    """The batch-vs-corpus anti-join must key on sha2(text) (fixed-width
    shuffle key), never raw text."""
    plan = _plan(spark, "q_incremental_dedup")
    assert "sha2" in plan
    assert "CartesianProduct" not in plan


def test_partitioned_sink_read_prunes_directories(spark):
    """The lang filter must land in PartitionFilters (directory pruning
    before file listing I/O), not just PushedFilters."""
    plan = _plan(spark, "q_partitioned_sink")
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "PartitionFilters" in scan
    pf = scan.split("PartitionFilters:")[1].split("]")[0]
    assert "lang" in pf and "en" in pf, pf


def test_global_index_no_global_window_single_data_shuffle(spark):
    """global_sort_index must never plan a single-partition Window (the
    naive row_number-over-everything), and beyond the range-partition
    sort it adds only a broadcast join — no second full-data exchange."""
    plan = _plan(spark, "q_global_index")
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 1  # offsets agg only


def test_salted_join_replicates_dim_not_fact(spark):
    """The salted join must explode (replicate) only the dim side and
    join on the composite (key, salt) — never broadcast or replicate the
    fact, never a cartesian fallback."""
    plan = _plan(spark, "q_salted_join")
    assert "Generate explode" in plan  # dim replication is an explode
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_boilerplate_broadcasts_boiler_set(spark):
    """The surviving boilerplate set is small by construction and must
    come back to the chunk stream as a broadcast, not a shuffle."""
    plan = _plan(spark, "q_boilerplate_strip")
    assert "BroadcastHashJoin" in plan
    assert "sha2" in plan  # df aggregate keys on digests, not chunk text


def test_unigram_vocab_broadcasts(spark):
    """The bounded top-K vocabulary must broadcast back to the token
    stream (the corpus→row feedback edge must never be a shuffle join)."""
    plan = _plan(spark, "q_unigram_score")
    assert "BroadcastHashJoin" in plan


def test_semdedup_pairs_stay_within_clusters(spark):
    """SemDeDup's pair join must be an equi-join on the cluster id —
    no cross-cluster cartesian anywhere in the plan."""
    plan = _plan(spark, "q_semdedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ngram_novelty_no_gram_level_join_back(spark):
    """Novelty joins two DOC-cardinality aggregates; the gram-level
    table must feed aggregates only (no join whose both inputs are the
    exploded gram stream)."""
    plan = _plan(spark, "q_ngram_novelty")
    # one doc-keyed join, gram stream appears only under aggregates
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") == 1


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """Spark's runtime bloom-filter join pruning: a selective build side
    must inject a bloom_filter probe into the fact scan when the scan-
    size thresholds allow. At 100 TB this is the optimizer feature that
    turns 'join then discard 99%' into 'discard 99% inside the scan' —
    this test pins that our scan-shaped plans stay eligible (equi-join
    on a raw scan column, no expression wrapper blocking the injection).
    Thresholds are production-defaults-off at fixture scale, so they are
    lowered for the assertion and restored."""
    from pyspark.sql import functions as F

    from legislative_bills_database_spark.io import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = load_table(spark, SF_DIR, "orders")
        lineitem = load_table(spark, SF_DIR, "lineitem")
        sel = orders.filter(orders.o_orderpriority == "1-URGENT")
        j = lineitem.join(
            sel, lineitem.l_orderkey == sel.o_orderkey
        ).agg(F.count("*"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter" in plan, "runtime bloom filter not injected"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_zorder_value_is_pure_projection(spark):
    """The Morton code must be one shuffle-free projection over the scan
    — shifts and masks in codegen, no exchange, no UDF."""
    plan = _plan(spark, "q_zorder_value")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_funnel_reuses_user_partitioning(spark):
    """Every funnel stage aggregates and joins on user_id — with AQE the
    stage joins must be hash joins on the same key (no cartesian, no
    nested loop), and stage inputs are filtered before their shuffles."""
    plan = _plan(spark, "q_funnel")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_curriculum_buckets_zero_fact_shuffle(spark):
    """The decile-bounds aggregate is the only exchange feeding the
    bucket projection; the documents side must not hash-exchange."""
    plan = _plan(spark, "q_curriculum_buckets")
    assert plan.count("Exchange hashpartitioning") == 0
