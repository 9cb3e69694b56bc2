"""Round-11 phase-83/84 pins: banded DTW wavefront + Viterbi decode.

DTW: a pure-Python O(n·m) banded DP (row-major, the definitional
order — NOT the wavefront) replayed on the real sf0.001 daily series
must match Spark exactly, certifying the anti-diagonal decomposition
against the textbook recurrence; every cost must be finite (the band
w = |n−m|+3 guarantees feasibility).

Viterbi: a pure-Python max-plus decode with the same quantized
micro-nat literals must match scores AND the augmented intent-step
count; the best score must dominate any fixed single-state path
(optimality spot-check).
"""

from __future__ import annotations

from collections import defaultdict

import duckdb

from legislative_bills_database_spark.plans import QUERIES
from legislative_bills_database_spark.plans.roundeleven_c_queries import (
    _VIT_A,
    _VIT_B0,
    _VIT_B1,
    _VIT_INIT,
)

SF = "/root/testdata/sf0.001"
INF = float("inf")


def _daily():
    con = duckdb.connect()
    return con.execute(
        f"""
        SELECT user_id, CAST(date_part('day', ts) AS BIGINT) AS d,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
        FROM read_parquet('{SF}/events.parquet')
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()


def test_dtw_matches_rowmajor_replay(spark):
    series = defaultdict(list)
    ref_tot = defaultdict(int)
    for u, d, c in _daily():
        series[u].append(c)
        ref_tot[d] += c
    nu = len(series)
    r = [ref_tot[d] // nu for d in sorted(ref_tot)]
    m = len(r)

    def dtw(x, w):
        n = len(x)
        dp = [[INF] * (m + 1) for _ in range(n + 1)]
        dp[0][0] = 0
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                if abs(i - j) <= w:
                    dp[i][j] = abs(x[i - 1] - r[j - 1]) + min(
                        dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1]
                    )
        return dp[n][m]

    got = {
        row.user_id: (row.n, row.m, row.dtw_cost)
        for row in QUERIES["q_dtw"](spark, SF).collect()
    }
    for u, x in series.items():
        w = abs(len(x) - m) + 3
        expect = dtw(x, w)
        assert expect < INF
        assert got[u] == (len(x), m, expect), u


def _sequences():
    con = duckdb.connect()
    return con.execute(
        f"""
        SELECT user_id, list(event_type ORDER BY ts, event_id)
        FROM read_parquet('{SF}/events.parquet') GROUP BY 1
        """
    ).fetchall()


def test_viterbi_matches_replay(spark):
    got = {
        r.user_id: (r.n_events, r.v0, r.v1, r.best_state, r.intent_steps)
        for r in QUERIES["q_viterbi"](spark, SF).collect()
    }
    for u, obs in _sequences():
        v0 = _VIT_INIT[0] + _VIT_B0[obs[0]]
        v1 = _VIT_INIT[1] + _VIT_B1[obs[0]]
        c0, c1 = 0, 1
        for o in obs[1:]:
            t00, t10 = v0 + _VIT_A[(0, 0)], v1 + _VIT_A[(1, 0)]
            t01, t11 = v0 + _VIT_A[(0, 1)], v1 + _VIT_A[(1, 1)]
            nv0 = max(t00, t10) + _VIT_B0[o]
            nv1 = max(t01, t11) + _VIT_B1[o]
            nc0 = c0 if t00 >= t10 else c1
            nc1 = (c0 if t01 >= t11 else c1) + 1
            v0, v1, c0, c1 = nv0, nv1, nc0, nc1
        best = 0 if v0 >= v1 else 1
        steps = c0 if v0 >= v1 else c1
        assert got[u] == (len(obs), v0, v1, best, steps), u
        # optimality spot-check: beats the stay-in-one-state paths
        all0 = _VIT_INIT[0] + _VIT_B0[obs[0]] + sum(
            _VIT_A[(0, 0)] + _VIT_B0[o] for o in obs[1:]
        )
        all1 = _VIT_INIT[1] + _VIT_B1[obs[0]] + sum(
            _VIT_A[(1, 1)] + _VIT_B1[o] for o in obs[1:]
        )
        assert max(v0, v1) >= max(all0, all1), u
        assert 0 <= steps <= len(obs)
