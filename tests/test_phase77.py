"""Round-11 phase-77/78 pins: Croston intermittent demand + lead-lag.

Croston: a sequential pure-Python replay of both scalar EWMA folds
(sizes, intervals) on the real sf0.001 purchase grid — exact equality
at the rounded grain — plus the Syntetos-Boylan relation
croston_sbc = 0.75 · croston.

Lead-lag: the integer sufficient statistics replayed exactly from the
raw daily counts, and r cross-checked against numpy's corrcoef (an
INDEPENDENT formulation — mean-centered two-pass — so agreement within
float tolerance certifies the one-pass integer formula, not itself).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import duckdb
import numpy as np

from legislative_bills_database_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _r4(v: float) -> float:
    """HALF-UP rounding on the shortest decimal rendering — Spark's
    round() is BigDecimal.valueOf(d).setScale(4, HALF_UP), and the
    halving EWMA produces exact dyadic ties (…65625) where Python's
    banker's round() disagrees by one ulp of the 4th decimal."""
    return float(
        Decimal(repr(v)).quantize(Decimal("0.0001"), ROUND_HALF_UP)
    )


def test_croston_matches_sequential_replay(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT user_id, list(d ORDER BY d), list(cents ORDER BY d)
        FROM (SELECT user_id, date_part('day', ts) AS d,
                     CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                          AS BIGINT) AS cents
              FROM read_parquet('{SF}/events.parquet')
              WHERE event_type = 'purchase' GROUP BY 1, 2)
        GROUP BY 1
        """
    ).fetchall()
    expect = {}
    for uid, ds, qs in rows:
        z = float(qs[0])
        for x in qs[1:]:
            z = 0.5 * float(x) + 0.5 * z
        ivs = [float(ds[0])] + [
            float(b - a) for a, b in zip(ds, ds[1:])
        ]
        p = ivs[0]
        for x in ivs[1:]:
            p = 0.5 * x + 0.5 * p
        expect[uid] = (
            len(qs),
            _r4(z),
            _r4(p),
            _r4(z / p),
            _r4(0.75 * (z / p)),
        )
    got = {
        r.user_id: (
            r.n_demands, r.z_size, r.p_interval, r.croston,
            r.croston_sbc,
        )
        for r in QUERIES["q_croston"](spark, SF).collect()
    }
    assert got == expect


def test_lead_lag_matches_numpy(spark):
    con = duckdb.connect()
    daily = dict()
    for d, x, y in con.execute(
        f"""
        SELECT date_part('day', ts),
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END),
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        FROM read_parquet('{SF}/events.parquet') GROUP BY 1
        """
    ).fetchall():
        daily[int(d)] = (int(x), int(y))
    rows = {r.lag: r for r in QUERIES["q_lead_lag"](spark, SF).collect()}
    assert set(rows) == set(range(8))
    for lag, r in rows.items():
        pairs = [
            (daily[d][0], daily[d + lag][1])
            for d in daily
            if d + lag in daily
        ]
        xs = np.array([p[0] for p in pairs], dtype=np.int64)
        ys = np.array([p[1] for p in pairs], dtype=np.int64)
        # exact integer sufficient statistics
        assert (r.m, r.sx, r.sy) == (len(pairs), xs.sum(), ys.sum())
        assert (r.sxx, r.syy, r.sxy) == (
            (xs * xs).sum(), (ys * ys).sum(), (xs * ys).sum(),
        )
        # independent two-pass Pearson
        assert abs(r.r - np.corrcoef(xs, ys)[0, 1]) < 1e-5, lag
