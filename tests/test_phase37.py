"""Phase-37 (distribution distance & reliability) semantics + plan pins."""

from __future__ import annotations

import pytest

from legislative_bills_database_spark.operators.stats import wasserstein_1
from legislative_bills_database_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# wasserstein_1 semantics
# ---------------------------------------------------------------------------


def test_w1_known_value(spark):
    # A uniform on {0, 10}, B point mass at 5: each half unit of A mass
    # travels 5 -> W1 = 5
    df = spark.createDataFrame(
        [(0, 1), (10, 1), (5, 0), (5, 0)], "v long, ia int"
    )
    row = wasserstein_1(df, "v", "ia").collect()[0]
    assert (row["n_a"], row["n_b"]) == (2, 2)
    assert row["w1"] == pytest.approx(5.0, abs=1e-9)


def test_w1_shift_invariance(spark):
    # B = A + 7 elementwise -> W1 = 7 exactly
    a = [1, 4, 9, 16, 30]
    rows = [(v, 1) for v in a] + [(v + 7, 0) for v in a]
    df = spark.createDataFrame(rows, "v long, ia int")
    assert wasserstein_1(df, "v", "ia").collect()[0]["w1"] == pytest.approx(
        7.0, abs=1e-9
    )


def test_w1_identical_samples_zero(spark):
    rows = [(v, 1) for v in (3, 3, 8)] + [(v, 0) for v in (3, 3, 8)]
    df = spark.createDataFrame(rows, "v long, ia int")
    assert wasserstein_1(df, "v", "ia").collect()[0]["w1"] == 0.0


def test_w1_dominates_ks_times_range_lower_bound(spark):
    """Sanity vs the sibling metric on real data: W1 >= KS·(smallest
    value gap) is trivial; check both agree the distributions differ."""
    w1 = QUERIES["q_wasserstein"](spark, SF_DIR).collect()[0]
    ks = QUERIES["q_ks_test"](spark, SF_DIR).collect()[0]
    assert w1["w1"] > 0 and ks["ks"] > 0
    assert (w1["n_a"], w1["n_b"]) == (ks["n_a"], ks["n_b"])


# ---------------------------------------------------------------------------
# query invariants
# ---------------------------------------------------------------------------


def test_spearman_internally_consistent(spark):
    r = QUERIES["q_spearman"](spark, SF_DIR).collect()[0]
    n, sd2 = r["n_orders"], r["sum_d2"]
    assert -1.0 <= r["spearman_rho"] <= 1.0
    expect = 1.0 - (6.0 * sd2) / (float(n) * (n * n - 1))
    assert r["spearman_rho"] == pytest.approx(expect, abs=1e-6)


def test_burstiness_bounds(spark):
    rows = QUERIES["q_burstiness"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert -1.0 < r["burstiness"] < 1.0
        assert r["mean_gap_s"] > 0
        assert r["n_gaps"] > 0


def test_ece_bounds_and_bins(spark):
    r = QUERIES["q_ece"](spark, SF_DIR).collect()[0]
    assert 0.0 <= r["ece"] <= 1.0
    assert 1 <= r["n_bins"] <= 10
    assert r["n_orders"] > 0


# ---------------------------------------------------------------------------
# plan shapes
# ---------------------------------------------------------------------------


def test_wasserstein_partitioned_windows_only(spark):
    plan = _plan(spark, "q_wasserstein")
    assert "windowspecdefinition(__pid" in plan
    assert "windowspecdefinition(v#" not in plan  # no global value window


def test_spearman_final_plan_windowless(spark):
    """Both global ranks live in global_sort_index's checkpointed
    pre-jobs — the final plan is a key join + aggregate, no Window."""
    plan = _plan(spark, "q_spearman")
    assert "windowspecdefinition" not in plan


def test_burstiness_high_cardinality_window(spark):
    """Gaps partition by (type, user) — never a per-type single task."""
    plan = _plan(spark, "q_burstiness")
    assert "windowspecdefinition(event_type" in plan
    assert "user_id" in plan.split("windowspecdefinition(event_type", 1)[1][:80]
