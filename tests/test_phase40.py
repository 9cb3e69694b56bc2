"""Phase-40 (degree-capped approx graph siblings) quality + plan pins.

The recall floors are the contract the approx twins exist to certify:
a change that silently degrades the degree-capped approximation (cap
selection, md5 sampling, estimator form) must fail HERE, not just shift
a driver hash. Floors sit below the measured deterministic values
(sf0.001: 1.0/1.0 — the adaptive cap doesn't bind; sf0.01: 0.84/0.682
at the r8 p95 cap, up from 0.77/0.554 at p90) to tolerate fixture
regeneration, not algorithm drift.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from legislative_bills_database_spark.operators.basket import (
    degree_capped_edges,
)
from legislative_bills_database_spark.plans import QUERIES
from legislative_bills_database_spark.plans.roundseven_queries import (
    _adaptive_cap,
    _cs_edges,
)

SF1 = "/root/testdata/sf0.001"
SF2 = "/root/testdata/sf0.01"


def test_degree_capped_edges_bounds_every_key(spark):
    cs = _cs_edges(spark, SF2)
    cap = _adaptive_cap(cs)
    capped = degree_capped_edges(cs, "cust", "supp", cap)
    over = (
        capped.groupBy("cust")
        .agg(F.count("*").alias("d"))
        .filter(F.col("d") > cap)
        .count()
    )
    assert over == 0
    # the cap binds on the tail only: at most ~10% of customers capped
    n = cs.select("cust").distinct().count()
    n_at_cap = (
        capped.groupBy("cust")
        .agg(F.count("*").alias("d"))
        .filter(F.col("d") == cap)
        .count()
    )
    assert n_at_cap <= n * 0.2  # p95 cap + ties headroom


def test_degree_capped_edges_deterministic(spark):
    cs = _cs_edges(spark, SF1)
    a = sorted(map(tuple, degree_capped_edges(cs, "cust", "supp", 5).collect()))
    b = sorted(map(tuple, degree_capped_edges(cs, "cust", "supp", 5).collect()))
    assert a == b


def test_adaptive_cap_is_p95_with_floor(spark):
    cs = _cs_edges(spark, SF2)
    cap = _adaptive_cap(cs)
    degs = sorted(
        r["d"]
        for r in cs.groupBy("cust").agg(F.count("*").alias("d")).collect()
    )
    k = (19 * len(degs) + 19) // 20
    assert cap == max(degs[k - 1], 30)


def test_graph_jaccard_recall_floor(spark):
    r1 = QUERIES["q_graph_jaccard_recall"](spark, SF1).collect()[0]
    assert r1["recall"] >= 0.95
    r2 = QUERIES["q_graph_jaccard_recall"](spark, SF2).collect()[0]
    assert r2["recall"] >= 0.78
    assert r2["n_exact"] == 100 and r2["n_approx"] == 100


def test_item_cf_recall_floor(spark):
    r1 = QUERIES["q_item_cf_recall"](spark, SF1).collect()[0]
    assert r1["recall"] >= 0.9
    r2 = QUERIES["q_item_cf_recall"](spark, SF2).collect()[0]
    # VERDICT r7 #4 "done" bar: >= 0.6 where the cap binds (measured
    # 0.682 at the p95 cap)
    assert r2["recall"] >= 0.6


def test_approx_plans_stay_jvm_side(spark):
    for name in ("q_graph_jaccard_approx", "q_item_cf_recs_approx"):
        plan = (
            QUERIES[name](spark, SF1)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan


def test_kcore_exact_matches_converged_kcore(spark):
    """6 fixed peel rounds reach the fixpoint on the fixtures — the
    certified twin IS the k-core, not a partial peel (peel rounds are
    idempotent past convergence)."""
    for sf in (SF1, SF2):
        exact = QUERIES["q_kcore_exact"](spark, sf).collect()
        census = QUERIES["q_kcore"](spark, sf).collect()[0]
        assert len(exact) == census["n_core_nodes"]
        if exact:
            assert min(r["degree"] for r in exact) == census["min_core_degree"]
            assert all(r["degree"] >= 3 for r in exact)
            # the driver-visible convergence flag: on the fixtures the
            # budget reaches the fixpoint, so the certificate must SAY so
            assert all(r["converged"] == 1 for r in exact)


@pytest.mark.slow  # r15 fast-lane: measured-heavy (see pytest.ini)
def test_label_prop_exact_matches_label_prop(spark):
    """The certified twin runs the SAME operator — the oracle certifies
    what q_label_prop always computed."""
    for sf in (SF1, SF2):
        a = sorted(map(tuple, QUERIES["q_label_prop_exact"](spark, sf).collect()))
        b = sorted(map(tuple, QUERIES["q_label_prop"](spark, sf).collect()))
        assert a == b


def test_cm_sketch_exact_one_sided_error(spark):
    rows = QUERIES["q_cm_sketch_exact"](spark, SF2).collect()
    assert len(rows) == 20
    assert all(r["overcount"] >= 0 for r in rows)  # CM never undercounts
    assert all(r["cm_est"] >= r["exact_n"] for r in rows)


def test_hll_register_cert_merge_identity(spark):
    for sf in (SF1, SF2):
        r = QUERIES["q_hll_register_cert"](spark, sf).collect()[0]
        assert r["merge_exact"] == 1  # MAX-merge == direct, algebraically
        assert r["n_regs_equal"] == r["n_regs_used"]
        assert 0 < r["n_regs_used"] <= r["m"]
        assert r["hll_est"] > 0
