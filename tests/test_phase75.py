"""Round-11 phase-75 pin: point-grain isotonic regression.

The min-max identity the query (and its DuckDB twin) computes is
certified against the CLASSIC stack-based PAVA in exact Fractions on
the real sf0.001 daily-spend series — the theorem (Robertson-Wright-
Dykstra) says they coincide, the pin says the implementations do.
Plus the two defining properties of the isotonic fit: monotone
non-decreasing per key, and total-sum preservation (the fit is a
projection, so each key's fitted total equals its raw total).
"""

from __future__ import annotations

from fractions import Fraction

import duckdb

from legislative_bills_database_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _series():
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT user_id,
               list(cents ORDER BY day)
        FROM (SELECT user_id, date_part('day', ts) AS day,
                     CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                          AS BIGINT) AS cents
              FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2)
        GROUP BY 1
        """
    ).fetchall()
    return {uid: xs for uid, xs in rows}


def _pava(xs):
    """Stack-based pool-adjacent-violators in exact Fractions."""
    pools: list[list[Fraction]] = []  # (sum, count)
    for x in xs:
        s, c = Fraction(x), Fraction(1)
        while pools and pools[-1][0] / pools[-1][1] >= s / c:
            ps, pc = pools.pop()
            s, c = s + ps, c + pc
        pools.append([s, c])
    out = []
    for s, c in pools:
        out.extend([s / c] * int(c))
    return out


def test_isotonic_minmax_equals_pava(spark):
    got: dict = {}
    for r in QUERIES["q_isotonic_points"](spark, SF).collect():
        got.setdefault(r.user_id, {})[r.rn] = r.iso_cents
    for uid, xs in _series().items():
        expect = _pava(xs)
        fit = [got[uid][i + 1] for i in range(len(xs))]
        for a, b in zip(fit, expect):
            assert abs(a - float(b)) <= 5e-7, (uid, a, b)


def test_isotonic_monotone_and_mean_preserving(spark):
    rows = QUERIES["q_isotonic_points"](spark, SF).collect()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r.user_id, []).append(r)
    for uid, rs in by_key.items():
        rs.sort(key=lambda r: r.rn)
        fits = [r.iso_cents for r in rs]
        assert fits == sorted(fits), uid
        assert abs(sum(fits) - sum(r.cents for r in rs)) < 1e-3 * len(rs)
