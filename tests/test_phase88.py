"""Round-12 phase-88 pins: banded Needleman-Wunsch global alignment.

A pure-Python O(n·m) banded DP (row-major, the definitional order —
NOT the wavefront) replayed on the real sf0.001 modal-type sequences
must match Spark exactly, certifying the anti-diagonal decomposition
against the textbook recurrence. Structural pins: the global cell is
always reachable (score > sentinel), a self-alignment scores n·MATCH,
and an all-gap lower bound holds.
"""

from __future__ import annotations

from collections import defaultdict

import duckdb

from legislative_bills_database_spark.plans import QUERIES
from legislative_bills_database_spark.plans.roundtwelve_queries import (
    _NW_GAP,
    _NW_MATCH,
    _NW_MISMATCH,
    _NW_NEG,
)

SF = "/root/testdata/sf0.001"


def _modal_sequences():
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT user_id, CAST(date_part('day', ts) AS BIGINT) AS day,
               event_type, CAST(count(*) AS BIGINT) AS cnt
        FROM read_parquet('{SF}/events.parquet')
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """
    ).fetchall()
    per_user = defaultdict(lambda: defaultdict(dict))
    glob = defaultdict(lambda: defaultdict(int))
    for u, d, t, c in rows:
        per_user[u][d][t] = c
        glob[d][t] += c

    def modal(counts):
        return min(((-c, t) for t, c in counts.items()))[1]

    series = {
        u: [modal(days[d]) for d in sorted(days)]
        for u, days in per_user.items()
    }
    ref = [modal(glob[d]) for d in sorted(glob)]
    return series, ref


def _nw_banded(x, r, w):
    n, m = len(x), len(r)
    neg = _NW_NEG
    dp = [[neg] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        for j in range(m + 1):
            if abs(i - j) > w:
                continue
            if i == 0:
                dp[i][j] = _NW_GAP * j
            elif j == 0:
                dp[i][j] = _NW_GAP * i
            else:
                s = _NW_MATCH if x[i - 1] == r[j - 1] else _NW_MISMATCH
                dp[i][j] = max(
                    dp[i - 1][j - 1] + s,
                    dp[i - 1][j] + _NW_GAP,
                    dp[i][j - 1] + _NW_GAP,
                )
    return dp[n][m]


def test_needleman_matches_rowmajor_replay(spark):
    series, ref = _modal_sequences()
    m = len(ref)
    got = {
        row.user_id: (row.n, row.m, row.nw_score)
        for row in QUERIES["q_needleman"](spark, SF).collect()
    }
    assert set(got) == set(series)
    for u, x in series.items():
        w = abs(len(x) - m) + 3
        expect = _nw_banded(x, ref, w)
        # band w >= |n-m| guarantees the global cell is reachable
        assert expect > _NW_NEG // 2
        # all-gap path is a valid alignment -> lower-bounds the score
        assert expect >= _NW_GAP * (len(x) + m)
        assert got[u] == (len(x), m, expect), u


def test_needleman_self_alignment_is_perfect():
    # sanity on the replay itself: aligning the reference to itself
    # scores m*MATCH, and one substitution costs MATCH-MISMATCH
    _, ref = _modal_sequences()
    m = len(ref)
    assert _nw_banded(ref, ref, 3) == m * _NW_MATCH
    mutated = list(ref)
    mutated[m // 2] = "\x00never-a-real-type"
    assert _nw_banded(mutated, ref, 3) == m * _NW_MATCH - (
        _NW_MATCH - _NW_MISMATCH
    )
