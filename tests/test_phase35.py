"""Phase-35 (mixture & structure diagnostics) invariants + plan pins.

Oracle parity for all four queries is swept by test_oracle_parity; here
the statistics' defining invariants are pinned (IPF hits both margins,
modularity bounds, JS bounds, l-diversity partition completeness) plus
the 100 TB plan shapes.
"""

from __future__ import annotations

import math

import pytest

from legislative_bills_database_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_ipf_hits_both_margins(spark):
    """The whole point of raking: after the sweeps, every source's
    weighted mass matches the row target and every language's matches
    the column target (to fixed-point rounding)."""
    rows = QUERIES["q_ipf_raking"](spark, SF_DIR).collect()
    total = sum(r["n_docs"] for r in rows)
    sources = {r["source"] for r in rows}
    langs = {r["lang"] for r in rows}
    scale = 1_000_000
    col_target = total * scale // len(langs)
    for lang in langs:  # column sweep ran last -> exact-est margin
        mass = sum(
            r["n_docs"] * r["weight_fp"] for r in rows if r["lang"] == lang
        )
        assert abs(mass - col_target) / col_target < 1e-3, lang
    row_target = total * scale // len(sources)
    for s in sources:  # row margin converges to ~target after 3 rounds
        mass = sum(
            r["n_docs"] * r["weight_fp"] for r in rows if r["source"] == s
        )
        assert abs(mass - row_target) / row_target < 0.05, s
    # weights are genuinely non-uniform (the raking did something)
    assert len({r["weight_fp"] for r in rows}) > 1


def test_modularity_bounds_and_consistency(spark):
    row = QUERIES["q_modularity"](spark, SF_DIR).collect()[0]
    assert 0 < row["intra_edges"] <= row["n_edges"]
    assert -0.5 <= row["modularity"] <= 1.0
    assert row["n_communities"] > 1


def test_js_divergence_bounds(spark):
    rows = QUERIES["q_js_divergence"](spark, SF_DIR).collect()
    assert len(rows) > 1
    for r in rows:
        # JS in nats is bounded by ln 2 (plus rounding slack)
        assert -1e-9 <= r["js_nats"] <= math.log(2) + 1e-9, r
        assert 0 < r["n_terms"] <= 200


def test_l_diversity_partitions_all_groups(spark):
    from legislative_bills_database_spark.io import load_table
    from pyspark.sql import functions as F

    rows = QUERIES["q_l_diversity"](spark, SF_DIR).collect()
    orders = load_table(spark, SF_DIR, "orders")
    n_groups = (
        orders.select("o_orderpriority", F.year("o_orderdate"))
        .distinct()
        .count()
    )
    assert sum(r["n_groups"] for r in rows) == n_groups
    for r in rows:
        assert 1 <= r["l"] <= 3
        assert r["min_group_size"] >= 1
        if r["l"] == 1:
            assert r["min_entropy"] == pytest.approx(0.0, abs=1e-9)
        else:
            assert r["min_entropy"] > 0


# ---------------------------------------------------------------------------
# plan shapes
# ---------------------------------------------------------------------------


def test_modularity_broadcasts_brand_dim(spark):
    """The part->brand label must ride broadcast joins onto the edge
    list; degrees come from a union-all aggregate, never a second
    edge self-join."""
    plan = _plan(spark, "q_modularity")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_js_topwords_take_ordered_then_broadcast(spark):
    plan = _plan(spark, "q_js_divergence")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ipf_result_is_bounded_literal(spark):
    """Only the cell-count aggregation is data-sized; the sweeps run on
    bounded |sources|x|langs| driver state (the pca.py precedent)."""
    plan = _plan(spark, "q_ipf_raking")
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan


def test_l_diversity_pure_codegen(spark):
    plan = _plan(spark, "q_l_diversity")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
