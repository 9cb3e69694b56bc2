"""Round-11 phase-72 pin: additive Holt-Winters (chunked affine fold).

Three certificates on the real sf0.001 events stream:

1. a genuinely sequential pure-Python replay of the triple-smoothing
   recurrence (the spec the DuckDB recursive-CTE twin also implements)
   must match the Spark chunked result at the rounded grain for EVERY
   key — chunked (m+2)×(m+2) matrix composition == one-pass;
2. chunking invariance — chunk_size=16 (5 chunks/key) and
   chunk_size=4096 (single chunk, pure sequential seed fold) agree,
   so the matrix path introduces nothing the sequential path lacks;
3. the IEEE-constant pin: (1−β) and (1−γ) computed Python-side are
   bit-identical to the 0.7 / 0.6 literals the oracle SQL uses — the
   premise that lets both engines write complements either way.
"""

from __future__ import annotations

import duckdb

from legislative_bills_database_spark.operators.timeseries import (
    holt_winters_chunked,
)
from legislative_bills_database_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"
ALPHA, BETA, GAMMA, M = 0.5, 0.3, 0.4, 4


def _replay():
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT user_id, list(CAST(value AS DOUBLE) ORDER BY ts, event_id)
        FROM read_parquet('{SF}/events.parquet') GROUP BY 1
        """
    ).fetchall()
    out = {}
    for uid, vs in rows:
        if len(vs) < M:
            continue
        l = (((vs[0] + vs[1]) + vs[2]) + vs[3]) / 4.0
        b = 0.0
        s = [vs[i] - l for i in range(M)]
        for t in range(M, len(vs)):
            x = vs[t]
            lp = ALPHA * (x - s[0]) + (1 - ALPHA) * (l + b)
            bp = BETA * (lp - l) + (1 - BETA) * b
            sn = GAMMA * (x - lp) + (1 - GAMMA) * s[0]
            s = s[1:] + [sn]
            l, b = lp, bp
        out[uid] = (
            len(vs),
            round(l, 4),
            round(b, 4),
            round(s[0], 4),
            round(l + b + s[0], 4),
        )
    return out

def test_holt_winters_matches_sequential_replay(spark):
    got = {
        r.user_id: (r.n_obs, r.level, r.trend, r.s_next, r.forecast_1)
        for r in QUERIES["q_holt_winters"](spark, SF).collect()
    }
    assert got == _replay()


def test_holt_winters_chunking_invariance(spark):
    from legislative_bills_database_spark.io import load_table

    events = load_table(spark, SF, "events")
    fine = {
        r.user_id: (r.level, r.trend, r.s_next)
        for r in holt_winters_chunked(events, chunk_size=16).collect()
    }
    single = {
        r.user_id: (r.level, r.trend, r.s_next)
        for r in holt_winters_chunked(events, chunk_size=4096).collect()
    }
    assert fine == single


def test_complement_constants_roundtrip():
    assert 1 - BETA == 0.7
    assert 1 - GAMMA == 0.6
    assert 1 - ALPHA == 0.5


def test_holt_winters_edge_lengths(spark):
    """Boundary shapes the fixture never hits: n == m (seed only),
    n = m+1 (one fold step), n = chunk_size (chunk-0 only, full),
    n = chunk_size+1 (first matrix application on a 1-element chunk).
    Each compared against the sequential pure-Python recurrence."""
    cases = {
        "k4": [10.0, 12.0, 8.0, 14.0],
        "k5": [10.0, 12.0, 8.0, 14.0, 11.0],
        "k16": [float(3 + (7 * i) % 11) for i in range(16)],
        "k17": [float(5 + (5 * i) % 13) for i in range(17)],
        "k3": [1.0, 2.0, 3.0],  # below m: must be filtered out
    }
    rows = [
        (key, i, float(i), v)
        for key, vs in cases.items()
        for i, v in enumerate(vs)
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_id long, ts double, value double"
    )
    got = {
        r.user_id: (r.n_obs, r.level, r.trend, r.s_next, r.forecast_1)
        for r in holt_winters_chunked(
            df, "user_id", "ts", "value", "event_id", chunk_size=16
        ).collect()
    }
    assert "k3" not in got
    for key, vs in cases.items():
        if len(vs) < M:
            continue
        l = (((vs[0] + vs[1]) + vs[2]) + vs[3]) / 4.0
        b = 0.0
        s = [vs[i] - l for i in range(M)]
        for t in range(M, len(vs)):
            x = vs[t]
            lp = ALPHA * (x - s[0]) + (1 - ALPHA) * (l + b)
            bp = BETA * (lp - l) + (1 - BETA) * b
            sn = GAMMA * (x - lp) + (1 - GAMMA) * s[0]
            s = s[1:] + [sn]
            l, b = lp, bp
        assert got[key] == (
            len(vs),
            round(l, 4),
            round(b, 4),
            round(s[0], 4),
            round(l + b + s[0], 4),
        ), key
