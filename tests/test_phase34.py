"""Phase-34 (evaluation metrics) unit + plan-shape tests.

Oracle parity for all five queries is swept by test_oracle_parity; here
the operator semantics are pinned on hand-built inputs (tie handling in
AUC, fixed-point convergence in the power iteration, the rounding-mode
twin) and the 100 TB plan shapes are regression-pinned.
"""

from __future__ import annotations

import numpy as np
import pytest

from legislative_bills_database_spark.operators.pca import (
    SCALE,
    _round_half_away,
    power_iteration_fp,
)
from legislative_bills_database_spark.operators.stats import auc_exact
from legislative_bills_database_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# auc_exact semantics
# ---------------------------------------------------------------------------


def test_auc_exact_hand_computed_with_ties(spark):
    # scores: pos {3, 2}, neg {1, 2}; pairs: (3>1)=1, (3>2)=1,
    # (2>1)=1, (2==2)=0.5  →  AUC = 3.5/4 = 0.875
    df = spark.createDataFrame(
        [(3.0, 1), (2.0, 1), (1.0, 0), (2.0, 0)], "v double, y int"
    )
    row = auc_exact(df, "v", "y").collect()[0]
    assert (row["n_pos"], row["n_neg"]) == (2, 2)
    assert row["auc"] == pytest.approx(0.875, abs=1e-12)


def test_auc_exact_perfect_and_inverted(spark):
    perfect = spark.createDataFrame(
        [(10.0, 1), (9.0, 1), (2.0, 0), (1.0, 0)], "v double, y int"
    )
    assert auc_exact(perfect, "v", "y").collect()[0]["auc"] == 1.0
    inverted = spark.createDataFrame(
        [(1.0, 1), (2.0, 0)], "v double, y int"
    )
    assert auc_exact(inverted, "v", "y").collect()[0]["auc"] == 0.0


def test_auc_exact_ignores_null_scores(spark):
    df = spark.createDataFrame(
        [(3.0, 1), (None, 1), (1.0, 0)], "v double, y int"
    )
    row = auc_exact(df, "v", "y").collect()[0]
    assert (row["n_pos"], row["n_neg"], row["auc"]) == (1, 1, 1.0)


# ---------------------------------------------------------------------------
# fixed-point power iteration semantics
# ---------------------------------------------------------------------------


def test_power_iteration_converges_to_dominant_direction():
    # diag(9, 1): dominant eigenvector is e0; the e1 component decays
    # by ~9x per sweep from the all-ones start
    gram = [(0, 0, 9), (1, 1, 1)]
    comps = dict(power_iteration_fp(gram, 2, rounds=6))
    assert comps[0] == SCALE
    assert abs(comps[1]) <= SCALE // 9**5


def test_power_iteration_sign_handling():
    # [[2, -1], [-1, 3]]: dominant eigenpair (λ=(5+√5)/2, [1, -1.618…])
    # — NOT orthogonal to the all-ones start (unlike [[2,-1],[-1,2]],
    # whose dominant direction the start can never reach). Components
    # must converge to opposite signs, the larger normalized to SCALE.
    gram = [(0, 0, 2), (0, 1, -1), (1, 0, -1), (1, 1, 3)]
    comps = dict(power_iteration_fp(gram, 2, rounds=12))
    assert abs(comps[1]) == SCALE
    assert comps[0] * comps[1] < 0
    # |x/y| → 2/(1+√5) ≈ 0.618034
    assert abs(abs(comps[0]) / SCALE - 0.618034) < 1e-3


def test_power_iteration_zero_matrix_guard():
    comps = dict(power_iteration_fp([], 3, rounds=4))
    assert set(comps.values()) == {0}


def test_round_half_away_is_not_bankers():
    x = np.array([0.5, 1.5, 2.5, -0.5, -2.5])
    # numpy's banker's round would give [0, 2, 2, -0, -2]
    assert _round_half_away(x).tolist() == [1.0, 2.0, 3.0, -1.0, -3.0]


# ---------------------------------------------------------------------------
# plan shapes
# ---------------------------------------------------------------------------


def test_auc_uses_prefix_offset_not_global_window(spark):
    """The running negative count must range-partition, never collapse
    to a one-task unpartitioned window over distinct scores."""
    plan = _plan(spark, "q_auc")
    # the range sort lives in the checkpointed pre-job; the final plan
    # starts from its ExistingRDD — so pin what matters here: the
    # running sum's Window is PARTITIONED by __pid (never unpartitioned)
    assert "windowspecdefinition(__pid" in plan
    assert "windowspecdefinition(v" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_calibration_and_fertility_pure_codegen(spark):
    for name in ("q_calibration_bins", "q_tokenizer_fertility"):
        plan = _plan(spark, name)
        assert "ArrowEvalPython" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_lorenz_no_data_sized_global_window(spark):
    """The customer rank is global_sort_index; the only Window left runs
    over the ten decile rows, after the decile aggregation."""
    plan = _plan(spark, "q_lorenz_curve")
    # the customer-rank range sort lives in global_sort_index's
    # checkpointed pre-job; the only Window in the FINAL plan must be
    # the ten-row decile cumsum — no customer-sized window anywhere
    assert "windowspecdefinition(decile" in plan
    assert "windowspecdefinition(x" not in plan
    assert "CartesianProduct" not in plan


def test_pca_power_result_is_bounded_literal(spark):
    """The returned frame is the d-row driver literal — the data-sized
    Gram job runs eagerly (bounded d^2 collect, the ivf.py precedent)
    and never re-executes per downstream action."""
    plan = _plan(spark, "q_pca_power")
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan
    assert "Exchange" not in plan
