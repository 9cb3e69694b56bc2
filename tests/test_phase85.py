"""Round-11 phase-85/86 pins: PACF (Durbin-Levinson) + closed-form ridge.

PACF: a pure-Python Durbin-Levinson replay from the exact n-scaled
autocovariances (bit-identical float walk) must match all 5 × 7
(type, lag) cells; pacf[1] must equal acf[1] (the definitional base
case).

Ridge: the closed-form betas must match numpy's centered ridge solve
(an INDEPENDENT formulation — explicit design matrix, linalg.solve)
to 1e-5, and OLS-limit sanity: with λ=0 replayed in exact Fractions
the betas move only slightly (λ=100 against Gram entries ~1e9 is a
whisper), confirming the penalty scaling is λ·n, not λ·n².
"""

from __future__ import annotations

from collections import defaultdict
from fractions import Fraction

import duckdb
import numpy as np

from legislative_bills_database_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"
K = 7
LAM = 100


def test_pacf_matches_durbin_levinson_replay(spark):
    con = duckdb.connect()
    daily = con.execute(
        f"""
        SELECT event_type, date_part('day', ts) AS d, count(*)
        FROM read_parquet('{SF}/events.parquet')
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    ser = defaultdict(list)
    for t, d, c in daily:
        ser[t].append(int(c))
    expect = {}
    for t, xs in ser.items():
        n, s = len(xs), sum(xs)
        ck = [
            sum(
                (n * xs[i] - s) * (n * xs[i + k] - s)
                for i in range(n - k)
            )
            for k in range(K + 1)
        ]
        r = [ck[k + 1] / ck[0] for k in range(K)]
        phi, pacf = [r[0]], [r[0]]
        for k in range(2, K + 1):
            num = r[k - 1]
            for j2 in range(1, k):
                num = num - phi[j2 - 1] * r[k - 1 - j2]
            den = 1.0
            for j2 in range(1, k):
                den = den - phi[j2 - 1] * r[j2 - 1]
            pkk = num / den
            phi = [
                phi[j - 1] - pkk * phi[k - 1 - j] for j in range(1, k)
            ] + [pkk]
            pacf.append(pkk)
        for lag in range(1, K + 1):
            expect[(t, lag)] = (
                ck[lag],
                round(r[lag - 1], 6),
                round(pacf[lag - 1], 6),
            )
    got = {
        (row.event_type, row.lag): (row.ck_scaled, row.acf, row.pacf)
        for row in QUERIES["q_pacf"](spark, SF).collect()
    }
    assert got == expect
    for t in ser:
        assert got[(t, 1)][1] == got[(t, 1)][2]  # pacf(1) == acf(1)


def _design():
    con = duckdb.connect()
    return con.execute(
        f"""
        SELECT l_quantity, CAST(ROUND(l_discount * 100) AS BIGINT),
               CAST(ROUND(l_extendedprice) AS BIGINT)
        FROM read_parquet('{SF}/lineitem.parquet')
        """
    ).fetchall()


def test_ridge_matches_numpy_solve(spark):
    rows = _design()
    X = np.array([[r[0], r[1]] for r in rows], dtype=float)
    y = np.array([r[2] for r in rows], dtype=float)
    Xc = X - X.mean(0)
    yc = y - y.mean()
    beta = np.linalg.solve(Xc.T @ Xc + LAM * np.eye(2), Xc.T @ yc)
    icpt = y.mean() - beta @ X.mean(0)
    r = QUERIES["q_ridge"](spark, SF).collect()[0]
    assert abs(r.beta_qty - beta[0]) < 1e-5
    assert abs(r.beta_disc - beta[1]) < 1e-5
    assert abs(r.intercept - icpt) < 1e-3
    # exact integer core rides the hash
    xs = np.array([r0[0] for r0 in rows], dtype=np.int64)
    ds = np.array([r0[1] for r0 in rows], dtype=np.int64)
    ys = np.array([r0[2] for r0 in rows], dtype=np.int64)
    assert (r.n, r.sx1y, r.sx2y) == (
        len(rows), int((xs * ys).sum()), int((ds * ys).sum()),
    )


def test_ridge_penalty_scale_is_gentle(spark):
    """λ=100 against Gram entries ~1e9 must barely move the OLS
    solution — catches a λ·n² (or worse) mis-scaling, which would
    shrink the betas visibly."""
    rows = _design()
    n = len(rows)
    sx1 = sum(r[0] for r in rows)
    sx2 = sum(r[1] for r in rows)
    sy = sum(r[2] for r in rows)
    a11 = Fraction(n * sum(r[0] * r[0] for r in rows) - sx1 * sx1)
    a22 = Fraction(n * sum(r[1] * r[1] for r in rows) - sx2 * sx2)
    a12 = Fraction(n * sum(r[0] * r[1] for r in rows) - sx1 * sx2)
    b1 = Fraction(n * sum(r[0] * r[2] for r in rows) - sx1 * sy)
    b2 = Fraction(n * sum(r[1] * r[2] for r in rows) - sx2 * sy)
    det0 = a11 * a22 - a12 * a12
    ols1 = float((b1 * a22 - b2 * a12) / det0)
    ols2 = float((b2 * a11 - b1 * a12) / det0)
    r = QUERIES["q_ridge"](spark, SF).collect()[0]
    assert abs(r.beta_qty - ols1) < 0.02 * max(abs(ols1), 1.0)
    assert abs(r.beta_disc - ols2) < 0.02 * max(abs(ols2), 1.0)
