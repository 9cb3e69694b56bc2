"""Round-11 phase-64 pins: AQE skew-join certificate + the exact-trio
fan-out refusal interlock (VERDICT r10 items #4 and #5).

The census pin is the "done" contract: the skew split must ACTUALLY
fire on the skewed fixture with skewJoin enabled, must not with it
disabled, and both runs must agree on every deterministic cell. The
interlock pins both directions: refusal past the bound (error naming
the certified capped sibling) and pass-through under it (the
certificates stay runnable — they are the baselines the recall rows
are about).
"""

from __future__ import annotations

import pytest

from legislative_bills_database_spark.operators.basket import (
    cooccurrence_pairs,
    predicted_self_pairs,
    refuse_excess_fanout,
)
from legislative_bills_database_spark.plans import QUERIES

SF1 = "/root/testdata/sf0.001"
SF2 = "/root/testdata/sf0.01"


def test_aqe_skew_split_fires(spark):
    r = QUERIES["q_aqe_skew_census"](spark, SF2).collect()[0]
    assert r.smj_skew_on >= 1, "skew split did not fire with AQE skewJoin on"
    assert r.skewed_reads_on >= 1
    assert r.smj_skew_off == 0
    assert r.skewed_reads_off == 0
    assert r.runs_agree == 1
    # deterministic cells: every lineitem row survives the dim join
    assert r.rows_out > 0 and r.payload_bytes == 64 * r.rows_out


def _edges(spark):
    # degrees: k=1 → 3 items (3 pairs), k=2 → 2 items (1 pair) ⇒ Σ=4
    rows = [(1, 10), (1, 11), (1, 12), (2, 10), (2, 13)]
    return spark.createDataFrame(rows, "k long, i long")


def test_predicted_self_pairs_exact(spark):
    dmax, pairs = predicted_self_pairs(_edges(spark), "k")
    assert (dmax, pairs) == (3, 4)


def test_fanout_interlock_refuses_and_names_sibling(spark):
    e = _edges(spark)
    with pytest.raises(ValueError, match="q_graph_jaccard_approx"):
        cooccurrence_pairs(e, "k", "i", max_pairs=3)
    with pytest.raises(ValueError, match="the-capped-route"):
        refuse_excess_fanout(e, "k", 3, "the-capped-route")
    # under the bound: passes through and reports the prediction
    assert refuse_excess_fanout(e, "k", 4, "unused") == 4
    assert refuse_excess_fanout(e, "k", None, "unused") == -1
    # exact plan still computable under the bound
    assert cooccurrence_pairs(e, "k", "i", max_pairs=10).count() == 4


def test_exact_trio_runs_under_default_bound(spark):
    """The certificates stay runnable at test SFs with the default
    interlock — refusal is for cluster-hostile volumes only."""
    assert QUERIES["q_weighted_jaccard"](spark, SF1).count() > 0
    assert QUERIES["q_graph_jaccard"](spark, SF1).count() > 0
    assert QUERIES["q_item_cf_recs"](spark, SF1).count() > 0


def test_weighted_jaccard_interlock_refuses(spark, monkeypatch):
    """Force the weighted twin's refusal path by shrinking the bound."""
    import legislative_bills_database_spark.plans.roundeight_queries as r8
    from legislative_bills_database_spark.operators import basket

    monkeypatch.setattr(basket, "MAX_EXACT_PAIRS", 1)
    # the query imports MAX_EXACT_PAIRS at call time from the module,
    # so patching the module constant is enough
    with pytest.raises(ValueError, match="q_weighted_jaccard_approx"):
        QUERIES["q_weighted_jaccard"](spark, SF1).collect()


def test_stream_resume_exactly_once(spark):
    """Restart-from-checkpoint must resume, not reprocess: second run's
    rows complement the first exactly; batch ids continue; output is
    the input multiset."""
    r = QUERIES["q_stream_resume"](spark, SF1).collect()[0]
    assert r.exactly_once == 1
    assert r.n_dup == 0 and r.n_missing == 0
    assert r.run1_rows + r.run2_rows == r.n_input
    assert r.run1_batches == 2 and r.run2_batches == 2
    assert r.n_output == r.n_input
