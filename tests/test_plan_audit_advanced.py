"""Physical-plan audits for the round-4 phase 5-10 batch: Bloom join
pruning, skyline, allocation, clamped scans, CUSUM, Holt — plan SHAPE
as a regression test (same contract as tests/test_plan_audit.py)."""

from __future__ import annotations

from legislative_bills_database_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_bloom_join_prunes_at_scan_below_broadcast_join(spark):
    """The xxhash membership test must sit BELOW the join (at the scan),
    and the dim side must broadcast — the whole point of the operator."""
    plan = _plan(spark, "q_bloom_join")
    assert "BroadcastHashJoin" in plan
    # toString prints top-down: the filter's xxhash64 appearing after
    # the join line means it is a child of the join, i.e. at the scan
    assert plan.index("xxhash64") > plan.index("BroadcastHashJoin")
    assert "CartesianProduct" not in plan


def test_skyline_is_exchange_free(spark):
    """All phases are mapInPandas over existing partitioning — no
    shuffle anywhere (the two-level coalesce fan-in tree added in r6 is
    narrow, not an exchange): local frontier scan, coalesce(fan_in)
    fold, coalesce(1) final fold = 3 MapInPandas stages."""
    plan = _plan(spark, "q_skyline")
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("MapInPandas") == 3


def test_corr_matrix_single_scan(spark):
    """All six CORR aggregates must share ONE fact scan."""
    plan = _plan(spark, "q_corr_matrix")
    assert plan.count("FileScan") == 1


def test_allocation_single_order_key_shuffle(spark):
    """Two windows + the remainder rank all ride one l_orderkey
    exchange; integer DIV/MOD only (no Python, no extra sort keys)."""
    plan = _plan(spark, "q_allocation")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan


def test_capped_runsum_one_key_shuffle_jvm_fold(spark):
    """One user-key exchange; the (s,m)-transform folds are aggregate()
    HOFs in the JVM — no Python stage."""
    plan = _plan(spark, "q_capped_runsum")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_holt_one_key_shuffle_jvm_fold(spark):
    plan = _plan(spark, "q_holt_trend")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_cusum_totals_broadcast_not_second_fact_window(spark):
    """(n, T) must come back as a broadcast join onto the scored rows —
    not a second full-frame window pass."""
    plan = _plan(spark, "q_cusum")
    assert "BroadcastHashJoin" in plan
    # the only hash exchanges are the event_type window partitionings
    assert plan.count("Exchange hashpartitioning") <= 2


def test_bootstrap_fanout_is_scan_side(spark):
    """The 50x replicate fan-out must be a Generate (explode) in the
    scan stage — no join against a replicate table, no Python."""
    plan = _plan(spark, "q_bootstrap_ci")
    assert "Generate" in plan
    assert "Python" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_frequent_triples_l1_prune_before_self_joins(spark):
    """The L1 min-support semi-filter must apply before the triple
    joins (apriori monotonicity), and the minsup scalar must ride a
    broadcast — never a shuffled join."""
    df = QUERIES["q_frequent_triples"](spark, SF_DIR)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # 2 one-row broadcasts max (minsup onto l1 + onto the support filter)
    assert plan.count("BroadcastNestedLoopJoin") <= 2
