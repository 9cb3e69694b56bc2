"""Phase-59 semantics pins: distribution-free two-sample inference.

Each query already hash-matches its DuckDB twin; these pin the MATH
against an independent pure-Python recompute from the same parquet
(no Spark, no DuckDB) so an engine+oracle twin bug cannot hide.
"""

from __future__ import annotations

import math

import pandas as pd

from legislative_bills_database_spark.plans import QUERIES
from tests.conftest import SF_DIR


def _orders() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/orders.parquet")


def _two_samples() -> tuple[list[int], list[int]]:
    o = _orders()
    cents = (o["o_totalprice"] * 100).round().astype("int64")
    urgent = o["o_orderpriority"] == "1-URGENT"
    return sorted(cents[urgent]), sorted(cents[~urgent])


def test_ks_two_sample_matches_python(spark):
    x1, x0 = _two_samples()
    n1, n0 = len(x1), len(x0)
    vals = sorted(set(x1) | set(x0))
    i1 = i0 = 0
    best = 0
    for v in vals:
        while i1 < n1 and x1[i1] <= v:
            i1 += 1
        while i0 < n0 and x0[i0] <= v:
            i0 += 1
        best = max(best, abs(i1 * n0 - i0 * n1))
    got = QUERIES["q_ks_two_sample"](spark, SF_DIR).collect()[0]
    assert (got.n1, got.n0) == (n1, n0)
    assert got.ks_num == best
    assert abs(float(got.ks_stat) - best / (n1 * n0)) < 1e-9


def test_cliffs_delta_matches_python(spark):
    x1, x0 = _two_samples()
    n1, n0 = len(x1), len(x0)
    # O(n log n): for each x1 value, #x0 strictly below / strictly above
    import bisect

    gt = sum(bisect.bisect_left(x0, v) for v in x1)
    lt = sum(n0 - bisect.bisect_right(x0, v) for v in x1)
    got = QUERIES["q_cliffs_delta"](spark, SF_DIR).collect()[0]
    assert (got.n_gt, got.n_lt) == (gt, lt)
    assert abs(float(got.delta) - (gt - lt) / (n1 * n0)) < 1e-9
    # dominance identity: gt + lt + ties == n1*n0
    assert gt + lt <= n1 * n0


def test_qte_deciles_matches_python(spark):
    x1, x0 = _two_samples()
    got = {r.dec: r for r in QUERIES["q_qte_deciles"](spark, SF_DIR).collect()}
    assert set(got) == set(range(1, 10))
    for k in range(1, 10):
        q1 = x1[(k * len(x1) + 9) // 10 - 1]
        q0 = x0[(k * len(x0) + 9) // 10 - 1]
        r = got[k]
        assert (r.q_urgent_cents, r.q_other_cents) == (q1, q0)
        assert r.qte_cents == q1 - q0


def test_odds_ratio_matches_python(spark):
    o = _orders()
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    ocnt = o.groupby("o_custkey").size()
    a = b = c = d = 0
    for ck, seg in zip(cust["c_custkey"], cust["c_mktsegment"]):
        e = seg == "BUILDING"
        y = int(ocnt.get(ck, 0)) >= 10
        a += e and y
        b += e and not y
        c += (not e) and y
        d += (not e) and not y
    got = QUERIES["q_odds_ratio"](spark, SF_DIR).collect()[0]
    assert (got.a, got.b, got.c, got.d) == (a, b, c, d)
    orr = (a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5))
    se = math.sqrt(
        1 / (a + 0.5) + 1 / (b + 0.5) + 1 / (c + 0.5) + 1 / (d + 0.5)
    )
    assert abs(float(got.odds_ratio) - orr) < 1e-5
    assert abs(float(got.ln_or_lo) - (math.log(orr) - 1.96 * se)) < 1e-5
    assert abs(float(got.ln_or_hi) - (math.log(orr) + 1.96 * se)) < 1e-5
    assert float(got.ln_or_lo) < float(got.ln_or_hi)
