"""Round-11 phase-81 pin: Bradley-Terry quantized-exact MM fit.

Integer replay: the floor-quantized 6-round MM recurrence replayed in
pure Python from the raw duel matrix must match Spark EXACTLY (the
same spec the chained-CTE DuckDB twin implements). Float replay: an
unquantized MM fit bounds the quantization error and must agree on
the strength RANKING of the top/bottom brands — the certificate that
strength_q/S is Bradley-Terry, not merely self-consistent. Plus the
model's defining moment check: Σ wins implied by the fitted strengths
reproduces observed wins within tolerance (the MLE stationarity
condition the MM iteration converges to).
"""

from __future__ import annotations

import duckdb

from legislative_bills_database_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"
S = 100_000
ROUNDS = 6


def _matrix():
    con = duckdb.connect()
    half = con.execute(
        f"""
        WITH li AS (
          SELECT l_orderkey, p_brand AS b, l_quantity AS q
          FROM read_parquet('{SF}/lineitem.parquet') l
          JOIN read_parquet('{SF}/part.parquet') p
            ON l.l_partkey = p.p_partkey
        )
        SELECT a.b, c.b, CAST(count(*) AS BIGINT),
               CAST(SUM(CASE WHEN a.q > c.q THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM li a JOIN li c
          ON a.l_orderkey = c.l_orderkey AND a.b < c.b
        WHERE a.q <> c.q GROUP BY 1, 2
        """
    ).fetchall()
    m = {}
    for i, j, n, w in half:
        m[(i, j)] = (n, w)
        m[(j, i)] = (n, n - w)
    return m


def _fit_int(m):
    brands = sorted({i for i, _ in m})
    nb = len(brands)
    wins = {b: sum(w for (i, _), (_, w) in m.items() if i == b) for b in brands}
    pi = {b: S for b in brands}
    s2 = S * S
    for _ in range(ROUNDS):
        d = {
            b: sum(
                (n * s2) // (max(pi[i], 1) + max(pi[j], 1))
                for (i, j), (n, _) in m.items()
                if i == b
            )
            for b in brands
        }
        p = {b: (wins[b] * s2) // max(d[b], 1) for b in brands}
        tot = sum(p.values())
        pi = {b: (p[b] * nb * S) // tot for b in brands}
    return wins, pi


def _fit_float(m):
    brands = sorted({i for i, _ in m})
    wins = {b: sum(w for (i, _), (_, w) in m.items() if i == b) for b in brands}
    pi = {b: 1.0 for b in brands}
    for _ in range(200):
        d = {
            b: sum(
                n / (pi[i] + pi[j])
                for (i, j), (n, _) in m.items()
                if i == b
            )
            for b in brands
        }
        p = {b: wins[b] / d[b] for b in brands}
        tot = sum(p.values())
        pi = {b: p[b] * len(brands) / tot for b in brands}
    return pi


def test_bradley_terry_integer_replay_exact(spark):
    m = _matrix()
    wins, pi = _fit_int(m)
    got = {
        r.brand: (r.wins, r.strength_q)
        for r in QUERIES["q_bradley_terry"](spark, SF).collect()
    }
    assert got == {b: (wins[b], pi[b]) for b in pi}


def test_bradley_terry_tracks_float_mle(spark):
    m = _matrix()
    flt = _fit_float(m)
    got = {
        r.brand: r.strength_q / S
        for r in QUERIES["q_bradley_terry"](spark, SF).collect()
    }
    # 6 quantized rounds vs the converged float fit: every strength
    # within 5% relative, and the extreme brands agree exactly
    for b, v in got.items():
        assert abs(v - flt[b]) / flt[b] < 0.05, (b, v, flt[b])
    assert max(got, key=got.get) == max(flt, key=flt.get)
    assert min(got, key=got.get) == min(flt, key=flt.get)
    # MLE stationarity: implied expected wins reproduce observed wins
    for b in got:
        implied = sum(
            n * got[i] / (got[i] + got[j])
            for (i, j), (n, _) in m.items()
            if i == b
        )
        observed = sum(w for (i, _), (_, w) in m.items() if i == b)
        assert abs(implied - observed) / max(observed, 1) < 0.05, b
