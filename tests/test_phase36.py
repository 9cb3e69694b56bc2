"""Phase-36 (contrastive-training data ops) invariants + plan pins.

Oracle parity for all four queries is swept by test_oracle_parity; here
the defining semantics are pinned (negatives really are cross-label /
non-purchased, recall is a true overlap ratio, quantile normalization
is rank-monotone) plus the plan shapes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from legislative_bills_database_spark.io import load_table
from legislative_bills_database_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_hard_negatives_are_cross_label(spark):
    rows = QUERIES["q_hard_negatives"](spark, SF_DIR).collect()
    assert rows
    per_q = {}
    for r in rows:
        assert r["q_label"] != r["n_label"], r
        assert 1 <= r["rank"] <= 3
        per_q.setdefault(r["qid"], set()).add(r["rank"])
    assert all(ranks == {1, 2, 3} for ranks in per_q.values())


def test_negative_samples_never_purchased(spark):
    neg = QUERIES["q_negative_sampling"](spark, SF_DIR)
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    bought = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("l_partkey").alias("p_partkey"),
        )
        .distinct()
    )
    leaked = neg.join(bought, ["c_custkey", "p_partkey"], "inner").count()
    assert leaked == 0
    per_cust = (
        neg.groupBy("c_custkey").count().agg(F.max("count")).collect()[0][0]
    )
    assert per_cust <= 5


def test_dim_truncation_recall_bounds(spark):
    rows = QUERIES["q_dim_truncation_recall"](spark, SF_DIR).collect()
    assert len(rows) == 20
    assert any(r["n_overlap"] > 0 for r in rows)  # 16 dims retain signal
    for r in rows:
        assert 0 <= r["n_overlap"] <= 10
        assert abs(r["recall_at_10"] - r["n_overlap"] / 10.0) < 1e-9


def test_quantile_normalize_is_rank_monotone(spark):
    """Within a nation, the mapping must preserve balance order, and
    normalized values must come from the GLOBAL value set."""
    out = QUERIES["q_quantile_normalize"](spark, SF_DIR)
    rows = out.collect()
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r["c_nationkey"], []).append(
            (r["c_acctbal"], r["c_custkey"], r["norm_acctbal"])
        )
    for vals in by_nation.values():
        vals.sort()
        norms = [v[2] for v in vals]
        assert norms == sorted(norms)
    cust = load_table(spark, SF_DIR, "customer")
    globals_ = {r[0] for r in cust.select("c_acctbal").collect()}
    assert all(r["norm_acctbal"] in globals_ for r in rows)


# ---------------------------------------------------------------------------
# plan shapes
# ---------------------------------------------------------------------------


def test_hard_negatives_broadcasts_query_side(spark):
    """The 50-query side broadcasts into the label-inequality pair join
    (non-equi -> nested-loop by necessity, bounded by the broadcast);
    ranking is the per-query partitioned window."""
    plan = _plan(spark, "q_hard_negatives")
    assert "BroadcastNestedLoopJoin" in plan
    assert "windowspecdefinition(qid" in plan
    assert "SortMergeJoin" not in plan


def test_negative_sampling_anti_join_broadcast(spark):
    plan = _plan(spark, "q_negative_sampling")
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_quantile_normalize_partitioned_windows_only(spark):
    """Within-group ranks ride nation-partitioned windows; the global
    order lives in global_sort_index's checkpointed pre-job — the final
    plan must contain NO unpartitioned window."""
    plan = _plan(spark, "q_quantile_normalize")
    assert "windowspecdefinition(c_nationkey" in plan
    assert "windowspecdefinition(c_acctbal" not in plan
    assert "CartesianProduct" not in plan
