"""Phase-60 semantics pins: survival analysis on customer reorder
latency (Kaplan-Meier, Nelson-Aalen, log-rank) vs pure-Python replays
of the exact risk-set recurrences from the same parquet.
"""

from __future__ import annotations

import decimal
import math

import pandas as pd

from legislative_bills_database_spark.plans import QUERIES
from tests.conftest import SF_DIR


def _round9(x: float) -> decimal.Decimal:
    return decimal.Decimal(repr(float(x))).quantize(
        decimal.Decimal("1e-9"), rounding=decimal.ROUND_HALF_UP
    )


def _durations() -> list[tuple[int, int, int]]:
    """(dur_days, ev, g) per customer: first→second order gap, censored
    at the corpus max date; g = positive account balance."""
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    gmap = dict(zip(c["c_custkey"], (c["c_acctbal"] > 0).astype(int)))
    o = o.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    mxd = o["o_orderdate"].max().date()
    out = []
    for ck, grp in o.groupby("o_custkey"):
        dates = [d.date() for d in grp["o_orderdate"]]
        if len(dates) >= 2:
            out.append(((dates[1] - dates[0]).days, 1, gmap[ck]))
        else:
            out.append(((mxd - dates[0]).days, 0, gmap[ck]))
    return out


def _risk_frame(subs):
    """[(dur, d, n)] over distinct durations, n = at-risk count."""
    from collections import Counter

    ev = Counter()
    lv = Counter()
    for dur, e, _ in subs:
        ev[dur] += e
        lv[dur] += 1
    n = len(subs)
    rows = []
    for dur in sorted(lv):
        rows.append((dur, ev[dur], n))
        n -= lv[dur]
    return rows


def test_kaplan_meier_matches_python_replay(spark):
    subs = _durations()
    rows = _risk_frame(subs)
    got = {
        r.t_days: r for r in QUERIES["q_kaplan_meier"](spark, SF_DIR).collect()
    }
    acc = decimal.Decimal(0)
    seen = 0
    for dur, d, n in rows:
        if d < 1 or d == n:
            continue
        acc += _round9(math.log(1.0 - d / n))
        r = got[dur]
        assert (r.n_risk, r.d_events) == (n, d)
        assert float(r.ln_surv) == float(acc)
        seen += 1
    assert seen == len(got) and seen > 5
    # the curve is monotone non-increasing in the ln domain
    lns = [float(got[t].ln_surv) for t in sorted(got)]
    assert all(b <= a for a, b in zip(lns, lns[1:]))


def test_nelson_aalen_matches_python_replay(spark):
    subs = _durations()
    rows = _risk_frame(subs)
    got = {
        r.t_days: r for r in QUERIES["q_nelson_aalen"](spark, SF_DIR).collect()
    }
    acc = decimal.Decimal(0)
    seen = 0
    for dur, d, n in rows:
        if d < 1:
            continue
        acc += _round9(d / n)
        r = got[dur]
        assert (r.n_risk, r.d_events) == (n, d)
        assert float(r.cum_hazard) == float(acc)
        seen += 1
    assert seen == len(got) and seen > 5
    haz = [float(got[t].cum_hazard) for t in sorted(got)]
    assert all(b >= a for a, b in zip(haz, haz[1:]))


def test_logrank_matches_python_replay(spark):
    from collections import Counter

    subs = _durations()
    ev = Counter()
    ev1 = Counter()
    lv = Counter()
    lv1 = Counter()
    for dur, e, g in subs:
        ev[dur] += e
        ev1[dur] += e * g
        lv[dur] += 1
        lv1[dur] += g
    n = len(subs)
    n1 = sum(g for _, _, g in subs)
    o1 = 0
    e1 = decimal.Decimal(0)
    v1 = decimal.Decimal(0)
    for dur in sorted(lv):
        d = ev[dur]
        if d >= 1:
            o1 += ev1[dur]
            e1 += _round9(d * n1 / n)
            if n > 1:
                v1 += _round9(
                    d * n1 * (n - n1) * (n - d) / (float(n) * n * (n - 1))
                )
        n -= lv[dur]
        n1 -= lv1[dur]
    got = QUERIES["q_logrank"](spark, SF_DIR).collect()[0]
    assert got.o1 == o1
    assert float(got.e1) == float(e1)
    assert float(got.v1) == float(v1)
    chi2 = (o1 - float(e1)) ** 2 / float(v1)
    assert abs(float(got.chi2) - chi2) < 1e-5
