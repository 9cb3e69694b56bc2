"""Phase-61 semantics pins: decision-stump split search + offline
recommender evaluation (MAP@3 / MRR) vs pure-Python recomputes.
"""

from __future__ import annotations

import datetime
import decimal

import pandas as pd

from legislative_bills_database_spark.plans import QUERIES
from legislative_bills_database_spark.plans.roundten_queries import (
    _REC_CUTOFF,
    _REC_K,
)
from tests.conftest import SF_DIR


def _round9(x: float) -> decimal.Decimal:
    return decimal.Decimal(repr(float(x))).quantize(
        decimal.Decimal("1e-9"), rounding=decimal.ROUND_HALF_UP
    )


def test_best_split_matches_python(spark):
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    xs = sorted(
        zip(
            (o["o_totalprice"] * 100).round().astype("int64"),
            (o["o_orderstatus"] == "F").astype(int),
        )
    )
    vals = [v for v, _ in xs]
    n, p = len(xs), sum(y for _, y in xs)
    # nine decile thresholds (type-1 order statistics), deduped
    ths = sorted({vals[(k * n + 9) // 10 - 1] for k in range(1, 10)})
    best = None
    for t in ths:
        nl = sum(1 for v in vals if v <= t)
        pl = sum(y for v, y in xs if v <= t)
        nr, pr = n - nl, p - pl
        if nr == 0:
            continue
        imp = 2.0 * (pl * (nl - pl) / nl + pr * (nr - pr) / nr) / n
        key = (round(imp, 9), t)
        if best is None or key < best[0]:
            parent = 2.0 * p * (n - p) / (n * n)
            best = (key, (t, nl, pl, nr, pr, imp, parent - imp))
    got = QUERIES["q_best_split"](spark, SF_DIR).collect()[0]
    t, nl, pl, nr, pr, imp, gain = best[1]
    assert got.threshold_cents == t
    assert (got.n_left, got.pos_left, got.n_right, got.pos_right) == (
        nl,
        pl,
        nr,
        pr,
    )
    assert abs(float(got.impurity) - imp) < 1e-8
    assert abs(float(got.gain) - gain) < 1e-8
    # Gini is concave: no split's weighted impurity exceeds the parent's
    assert float(got.gain) >= 0


def _rec_eval_python():
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    ol = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    cutoff = datetime.datetime.fromisoformat(_REC_CUTOFF)
    tr = ol[ol["o_orderdate"] < cutoff]
    te = ol[ol["o_orderdate"] >= cutoff]
    spend = (
        tr.groupby(["o_custkey", "l_suppkey"])["l_quantity"]
        .sum()
        .astype("int64")
        .reset_index()
    )
    recs: dict[int, list[int]] = {}
    for ck, grp in spend.groupby("o_custkey"):
        ranked = sorted(
            zip(grp["l_quantity"], grp["l_suppkey"]),
            key=lambda t: (-t[0], t[1]),
        )
        recs[ck] = [s for _, s in ranked[:_REC_K]]
    rel = {
        ck: set(grp["l_suppkey"])
        for ck, grp in te.groupby("o_custkey")
        if ck in recs
    }
    return recs, rel


def test_map_at_k_matches_python(spark):
    recs, rel = _rec_eval_python()
    aps = []
    for ck, suppliers in rel.items():
        hitsum = 0
        num = decimal.Decimal(0)
        for i, s in enumerate(recs[ck], start=1):
            if s in suppliers:
                hitsum += 1
                num += _round9(hitsum / i)
        aps.append(_round9(float(num) / min(_REC_K, len(suppliers))))
    got = QUERIES["q_map_at_k"](spark, SF_DIR).collect()[0]
    assert got.n_users == len(aps)
    want = float(sum(aps)) / len(aps)
    assert abs(float(got.map_at_k) - want) < 1e-5


def test_mrr_matches_python(spark):
    recs, rel = _rec_eval_python()
    rrs = []
    for ck, suppliers in rel.items():
        rr = decimal.Decimal(0)
        for i, s in enumerate(recs[ck], start=1):
            if s in suppliers:
                rr = _round9(1.0 / i)
                break
        rrs.append(rr)
    got = QUERIES["q_mrr"](spark, SF_DIR).collect()[0]
    assert got.n_users == len(rrs)
    want = float(sum(rrs)) / len(rrs)
    assert abs(float(got.mrr) - want) < 1e-5
    assert 0.0 <= float(got.mrr) <= 1.0
