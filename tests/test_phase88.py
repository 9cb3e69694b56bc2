"""Round-12 phase-88 pins: banded Needleman-Wunsch global alignment.

A pure-Python O(n·m) banded DP (row-major, the definitional order —
NOT the wavefront) replayed on the real sf0.001 modal-type sequences
must match Spark exactly, certifying the anti-diagonal decomposition
against the textbook recurrence. Structural pins: the global cell is
always reachable (score > sentinel), a self-alignment scores n·MATCH,
and an all-gap lower bound holds.
"""

from __future__ import annotations

import pytest

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


# ---------------------------------------------------------------------------
# phase 89: HMM forward filter (quantized-exact Rabiner scaling)
# ---------------------------------------------------------------------------

from legislative_bills_database_spark.plans.roundtwelve_queries import (  # noqa: E402
    _FWD_A,
    _FWD_B0,
    _FWD_B1,
    _FWD_INIT,
    _FWD_S,
)


def _event_sequences():
    con = duckdb.connect()
    return con.execute(
        f"""
        SELECT user_id, list(event_type ORDER BY ts, event_id)
        FROM read_parquet('{SF}/events.parquet') GROUP BY 1
        """
    ).fetchall()


def _forward_int(obs):
    """The exact integer recursion as specified (floor-quantized)."""
    u0 = _FWD_INIT[0] * _FWD_B0[obs[0]]
    u1 = _FWD_INIT[1] * _FWD_B1[obs[0]]
    a0, a1 = u0 * _FWD_S // (u0 + u1), u1 * _FWD_S // (u0 + u1)
    cnt = 1 if a1 > a0 else 0
    best, bestk = a1, 1
    for k, o in enumerate(obs[1:], start=2):
        u0 = (a0 * _FWD_A[(0, 0)] + a1 * _FWD_A[(1, 0)]) * _FWD_B0[o]
        u1 = (a0 * _FWD_A[(0, 1)] + a1 * _FWD_A[(1, 1)]) * _FWD_B1[o]
        den = u0 + u1
        a0, a1 = u0 * _FWD_S // den, u1 * _FWD_S // den
        if a1 > a0:
            cnt += 1
        if a1 > best:
            best, bestk = a1, k
    return a0, a1, cnt, best, bestk


def _forward_float(obs):
    """Textbook scaled forward filter in floats (the quantization-error
    yardstick)."""
    p0 = _FWD_INIT[0] / 100 * _FWD_B0[obs[0]] / 100
    p1 = _FWD_INIT[1] / 100 * _FWD_B1[obs[0]] / 100
    s = p0 + p1
    p0, p1 = p0 / s, p1 / s
    for o in obs[1:]:
        u0 = (p0 * 0.8 + p1 * 0.3) * _FWD_B0[o] / 100
        u1 = (p0 * 0.2 + p1 * 0.7) * _FWD_B1[o] / 100
        s = u0 + u1
        p0, p1 = u0 / s, u1 / s
    return p0, p1


def test_hmm_forward_matches_integer_replay(spark):
    got = {
        r.user_id: (
            r.n_events, r.a0_q, r.a1_q, r.intent_steps,
            r.peak_a1_q, r.peak_step,
        )
        for r in QUERIES["q_hmm_forward"](spark, SF).collect()
    }
    seqs = dict(_event_sequences())
    assert set(got) == set(seqs)
    for u, obs in seqs.items():
        a0, a1, cnt, best, bestk = _forward_int(obs)
        assert got[u] == (len(obs), a0, a1, cnt, best, bestk), u
        # normalization survives flooring: at most 1 grid unit lost
        assert _FWD_S - 1 <= a0 + a1 <= _FWD_S
        assert 0 <= cnt <= len(obs)
        assert 1 <= bestk <= len(obs) and best >= a1


def test_hmm_forward_quantization_error_bounded():
    # the 10^-5 per-step floor error must not accumulate visibly:
    # final filtered belief within 1e-3 of the float filter
    for u, obs in _event_sequences():
        a0, a1, *_ = _forward_int(obs)
        p0, p1 = _forward_float(obs)
        assert abs(a1 / _FWD_S - p1) < 1e-3, (u, a1 / _FWD_S, p1)
        assert abs(a0 / _FWD_S - p0) < 1e-3, (u, a0 / _FWD_S, p0)


# ---------------------------------------------------------------------------
# phase 90: parquet row-group skipping certificate (zorder vs linear)
# ---------------------------------------------------------------------------

SF01 = "/root/testdata/sf0.01"


def test_rowgroup_skip_census(spark):
    out = {
        (r.layout, r.predicate): r
        for r in QUERIES["q_rowgroup_skip_census"](spark, SF01).collect()
    }
    assert len(out) == 6
    total = out[("linear", "box")].total_rows
    # enough row groups for the certificate to be meaningful
    for r in out.values():
        assert r.n_rowgroups >= 8, r
        assert r.total_rows == total
        assert 0 < r.rows <= r.scan_rows <= r.total_rows, r
    # value parity: layouts agree on WHAT, only decoded volume differs
    for pred in ("custkey_band", "day_band", "box"):
        a, b = out[("linear", pred)], out[("zorder", pred)]
        assert (a.rows, a.sum_cents) == (b.rows, b.sum_cents), pred
    # the headline asymmetry: the linear(day) layout cannot skip on
    # custkey (every row group spans the full range) while zorder can
    lin_ck = out[("linear", "custkey_band")]
    zo_ck = out[("zorder", "custkey_band")]
    assert lin_ck.scan_rows >= int(0.9 * total)
    assert zo_ck.scan_rows <= int(0.6 * total)
    assert zo_ck.scan_rows < lin_ck.scan_rows
    # the trade: on its OWN sort dimension the linear layout prunes
    # harder than zorder (zorder pays per-dimension resolution)
    lin_day = out[("linear", "day_band")]
    zo_day = out[("zorder", "day_band")]
    assert lin_day.scan_rows <= int(0.5 * total)
    assert zo_day.scan_rows <= int(0.8 * total)
    # 2-D box: zorder bounds both dimensions -> at most linear's I/O
    assert (
        out[("zorder", "box")].scan_rows
        <= out[("linear", "box")].scan_rows
    )


# ---------------------------------------------------------------------------
# phase 91: approximate composite inclusion dependencies
# ---------------------------------------------------------------------------


def test_approx_ind_brackets(spark):
    rows = {
        r.ind: r for r in QUERIES["q_approx_ind"](spark, SF01).collect()
    }
    assert len(rows) == 4
    exact = rows["events[d16-30]:(user_id,event_type) <= events[d1-15]"]
    dirty = rows["events[d16-30]:(user_id,hour) <= events[d1-15]"]
    wrong1 = rows[
        "orders[1997+]:(o_custkey,o_orderstatus) <= orders[pre-1997]"
    ]
    wrong2 = rows[
        "lineitem[even orders]:(l_partkey,l_suppkey) <= lineitem[odd]"
    ]
    # one candidate per bracket: holds / dirty-but-sound / wrong model
    assert (exact.holds_1pct, exact.holds_30pct) == (1, 1)
    assert exact.miss_pairs == 0 and exact.miss_rows == 0
    assert (dirty.holds_1pct, dirty.holds_30pct) == (0, 1)
    assert 0 < dirty.miss_pairs < dirty.n_pairs
    for w in (wrong1, wrong2):
        assert (w.holds_1pct, w.holds_30pct) == (0, 0)
        assert w.g3_rows > 0.3
    # internal consistency of the two g3 measures
    for r in rows.values():
        assert 0 <= r.miss_pairs <= r.n_pairs
        assert 0 <= r.miss_rows <= r.n_rows
        assert r.miss_rows >= r.miss_pairs  # each pair carries >=1 row
        assert abs(r.g3_pairs - r.miss_pairs / r.n_pairs) < 1e-6
        assert abs(r.g3_rows - r.miss_rows / r.n_rows) < 1e-6


# ---------------------------------------------------------------------------
# phase 92: state-store cardinality sweep
# ---------------------------------------------------------------------------


@pytest.mark.slow  # r15 fast-lane: measured-heavy (see pytest.ini)
def test_stream_state_scale_sweep(spark):
    out = QUERIES["q_stream_state_scale"](spark, SF).collect()
    assert len(out) == 6
    by_prov = {}
    for r in out:
        # exactness does not degrade with state size
        assert r.rows_match == 1, r
        assert r.state_rows == r.n_groups_batch > 0
        assert r.n_microbatches == 4
        assert r.memory_bytes > 0 and r.bytes_per_row > 0
        by_prov.setdefault(r.provider, []).append(r)
    assert set(by_prov) == {"hdfs", "rocksdb"}
    for prov, rows in by_prov.items():
        rows.sort(key=lambda r: r.key_mult)
        assert [r.key_mult for r in rows] == [1, 10, 100]
        # salting only grows the key space
        for a, b in zip(rows, rows[1:]):
            assert b.state_rows >= a.state_rows, prov
        if prov == "hdfs":
            # the heap store's estimate is per-row: strictly more
            # state rows must cost strictly more bytes (equal counts
            # may wobble by key-string length only)
            for a, b in zip(rows, rows[1:]):
                if b.state_rows > a.state_rows:
                    assert b.memory_bytes > a.memory_bytes, prov
                else:
                    assert b.memory_bytes >= int(0.9 * a.memory_bytes)
        else:
            # RocksDB's memoryUsedBytes is BLOCK-CACHE accounting —
            # measured non-monotone at census scale (868 rows→36952 B
            # vs 1000 rows→35232 B): a flat cache floor dominates
            # until state dwarfs it. Pin only a sane band.
            lo = min(r.memory_bytes for r in rows)
            hi = max(r.memory_bytes for r in rows)
            assert lo > 0 and hi <= 10 * lo, (lo, hi)


# ---------------------------------------------------------------------------
# phase 93: banded Smith-Waterman local alignment
# ---------------------------------------------------------------------------


def _sw_banded(x, r, w):
    n, m = len(x), len(r)
    dp = [[0] * (m + 1) for _ in range(n + 1)]
    best = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            if abs(i - j) > w:
                continue
            s = _NW_MATCH if x[i - 1] == r[j - 1] else _NW_MISMATCH
            dp[i][j] = max(
                0,
                dp[i - 1][j - 1] + s,
                dp[i - 1][j] + _NW_GAP,
                dp[i][j - 1] + _NW_GAP,
            )
            best = max(best, dp[i][j])
    return best


def test_smith_waterman_matches_rowmajor_replay(spark):
    series, ref = _modal_sequences()
    m = len(ref)
    got = {
        row.user_id: (row.n, row.m, row.sw_score)
        for row in QUERIES["q_smith_waterman"](spark, SF).collect()
    }
    assert set(got) == set(series)
    for u, x in series.items():
        w = abs(len(x) - m) + 3
        expect = _sw_banded(x, ref, w)
        assert got[u] == (len(x), m, expect), u
        # local >= global restricted to the same band: SW may drop
        # NW's end charges but never scores below a nonneg local hit
        assert expect >= max(0, _nw_banded(x, ref, w))


def test_smith_waterman_structural():
    _, ref = _modal_sequences()
    m = len(ref)
    # self-alignment: the whole sequence is the best local hit
    assert _sw_banded(ref, ref, 3) == m * _NW_MATCH
    # a sequence sharing only one symbol scores exactly one match
    assert _sw_banded([ref[0]], ref, m + 3) == _NW_MATCH
    # disjoint alphabets -> empty local alignment scores 0
    assert _sw_banded(["\x00x", "\x00y"], ref, m + 3) == 0


# ---------------------------------------------------------------------------
# phase 94: minimum spanning forest (distributed Borůvka)
# ---------------------------------------------------------------------------


def _copurchase_edge_list():
    con = duckdb.connect()
    return con.execute(
        f"""
        SELECT a.l_partkey, b.l_partkey,
               CAST(MIN(CAST(a.l_quantity + b.l_quantity AS BIGINT))
                    AS BIGINT) AS w
        FROM read_parquet('{SF}/lineitem.parquet') a
        JOIN read_parquet('{SF}/lineitem.parquet') b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        WHERE a.l_orderkey % 97 = 0 GROUP BY 1, 2
        """
    ).fetchall()


def _kruskal(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    mst = set()
    for s, d, w in sorted(edges, key=lambda t: (t[2], t[0], t[1])):
        rs_, rd_ = find(s), find(d)
        if rs_ != rd_:
            parent[rs_] = rd_
            mst.add((s, d, w))
    n_nodes = len({v for e in edges for v in e[:2]})
    n_comps = n_nodes - len(mst)
    return mst, n_nodes, n_comps


def test_boruvka_matches_kruskal_replay(spark):
    edges = _copurchase_edge_list()
    mst, n_nodes, n_comps = _kruskal(edges)
    got = {
        (r.src, r.dst, r.w)
        for r in QUERIES["q_boruvka_mst"](spark, SF).collect()
    }
    # unique MSF under the strict (w, src, dst) order: Borůvka (Spark)
    # and Kruskal (replay) must return the IDENTICAL edge set
    assert got == mst
    # forest invariants: |MSF| = n_nodes - n_components, edge subset
    assert len(got) == n_nodes - n_comps
    assert got <= {(s, d, w) for s, d, w in edges}
    # total weight: no spanning forest can beat it (spot: the MSF
    # weight equals the replay's, already implied by set equality)
    assert sum(w for *_, w in got) == sum(w for *_, w in mst)


# ---------------------------------------------------------------------------
# phase 95: HMM posterior smoothing (forward-backward)
# ---------------------------------------------------------------------------


def _forward_backward_int(obs):
    n = len(obs)
    # forward trajectory (same recursion as q_hmm_forward)
    u0 = _FWD_INIT[0] * _FWD_B0[obs[0]]
    u1 = _FWD_INIT[1] * _FWD_B1[obs[0]]
    fa0 = [u0 * _FWD_S // (u0 + u1)]
    fa1 = [u1 * _FWD_S // (u0 + u1)]
    for o in obs[1:]:
        t0 = (fa0[-1] * _FWD_A[(0, 0)] + fa1[-1] * _FWD_A[(1, 0)]) * _FWD_B0[o]
        t1 = (fa0[-1] * _FWD_A[(0, 1)] + fa1[-1] * _FWD_A[(1, 1)]) * _FWD_B1[o]
        fa0.append(t0 * _FWD_S // (t0 + t1))
        fa1.append(t1 * _FWD_S // (t0 + t1))
    # backward messages
    bb0, bb1 = [_FWD_S // 2], [_FWD_S // 2]
    for k in range(n, 1, -1):
        e0, e1 = _FWD_B0[obs[k - 1]], _FWD_B1[obs[k - 1]]
        u0 = _FWD_A[(0, 0)] * e0 * bb0[0] + _FWD_A[(0, 1)] * e1 * bb1[0]
        u1 = _FWD_A[(1, 0)] * e0 * bb0[0] + _FWD_A[(1, 1)] * e1 * bb1[0]
        bb0.insert(0, u0 * _FWD_S // (u0 + u1))
        bb1.insert(0, u1 * _FWD_S // (u0 + u1))
    g0, g1 = [], []
    for t in range(n):
        p0, p1 = fa0[t] * bb0[t], fa1[t] * bb1[t]
        g0.append(p0 * _FWD_S // (p0 + p1))
        g1.append(p1 * _FWD_S // (p0 + p1))
    smooth = sum(1 for t in range(n) if g1[t] > g0[t])
    flips = sum(
        1
        for t in range(n)
        if (g1[t] > g0[t]) != (fa1[t] > fa0[t])
    )
    peak = max(g1)
    return smooth, flips, g1[-1], peak, g1.index(peak) + 1, fa0, fa1, g1


def test_hmm_posterior_matches_integer_replay(spark):
    got = {
        r.user_id: (
            r.n_events, r.smooth_steps, r.n_flips,
            r.g1_final, r.peak_g1, r.peak_step,
        )
        for r in QUERIES["q_hmm_posterior"](spark, SF).collect()
    }
    seqs = dict(_event_sequences())
    assert set(got) == set(seqs)
    any_flip = False
    for u, obs in seqs.items():
        smooth, flips, g1f, peak, pstep, fa0, fa1, g1 = (
            _forward_backward_int(obs)
        )
        assert got[u] == (len(obs), smooth, flips, g1f, peak, pstep), u
        any_flip = any_flip or flips > 0
        # at the final step beta is uniform, so the posterior ordering
        # equals the filter's there (hindsight adds nothing at t=n)
        assert (g1[-1] > _FWD_S - g1[-1]) == (fa1[-1] > fa0[-1])
        # the filter trajectory must agree with q_hmm_forward's final
        a0, a1, *_ = _forward_int(obs)
        assert (fa0[-1], fa1[-1]) == (a0, a1)
    # the fixture genuinely exercises smoothing: hindsight flips at
    # least one step for at least one user
    assert any_flip


# ---------------------------------------------------------------------------
# phase 96: quantized Goertzel spectral sweep
# ---------------------------------------------------------------------------

import math

from legislative_bills_database_spark.plans.roundtwelve_queries import (  # noqa: E402
    _GZ_COEF,
    _GZ_DAYS,
    _GZ_GRID,
)


def _daily_series():
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT event_type, CAST(date_part('day', ts) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2
        """
    ).fetchall()
    out = defaultdict(dict)
    for t, d, x in rows:
        out[t][d] = x
    return {
        t: [m.get(d, 0) for d in range(1, _GZ_DAYS + 1)]
        for t, m in out.items()
    }


def _tdiv(a, b):
    return int(a / b) if b else 0  # truncation toward zero


def _goertzel_int(xs, c):
    s1 = s2 = 0
    for x in xs:
        s1, s2 = x * _GZ_GRID + _tdiv(c * s1, _GZ_GRID) - s2, s1
    return s1 * s1 + s2 * s2 - _tdiv(c * s1, _GZ_GRID) * s2


def _goertzel_float(xs, p):
    c = 2 * math.cos(2 * math.pi / p)
    s1 = s2 = 0.0
    for x in xs:
        s1, s2 = x + c * s1 - s2, s1
    return s1 * s1 + s2 * s2 - c * s1 * s2


def test_goertzel_matches_integer_replay(spark):
    series = _daily_series()
    got = {
        (r.event_type, r.period): (r.power, r.is_peak)
        for r in QUERIES["q_goertzel"](spark, SF).collect()
    }
    assert len(got) == len(series) * len(_GZ_COEF)
    for t, xs in series.items():
        powers = {p: _goertzel_int(xs, c) for p, c in _GZ_COEF.items()}
        peak = max(powers.values())
        for p in _GZ_COEF:
            assert got[(t, p)] == (powers[p], int(powers[p] == peak)), (
                t, p,
            )
            # positive semidefinite quadratic form (C^2 < 4*grid^2 for
            # p > 2) up to grid wobble
            assert powers[p] >= -_GZ_GRID * _GZ_GRID
        assert sum(got[(t, p)][1] for p in _GZ_COEF) >= 1


def test_goertzel_quantization_tracks_float():
    # the x1000-quantized walk must RANK periods like the float
    # Goertzel on a synthetic pure-period signal (the detection claim)
    for true_p in (5, 7, 10):
        xs = [
            100 + round(80 * math.cos(2 * math.pi * d / true_p))
            for d in range(_GZ_DAYS)
        ]
        qi = {p: _goertzel_int(xs, c) for p, c in _GZ_COEF.items()}
        qf = {p: _goertzel_float(xs, p) for p in _GZ_COEF}
        # scale: quantized power carries grid^2
        best_i = max(qi, key=qi.get)
        best_f = max(qf, key=qf.get)
        assert best_i == best_f == true_p, (true_p, best_i, best_f)


# ---------------------------------------------------------------------------
# phase 97: AR(2) Yule-Walker fit + one-step forecast
# ---------------------------------------------------------------------------


def test_ar2_matches_numpy_yule_walker(spark):
    import numpy as np

    series = {
        t: xs for t, xs in (
            (t, [x for d, x in sorted(m.items())])
            for t, m in _daily_map().items()
        )
    }
    got = {
        r.event_type: r
        for r in QUERIES["q_ar2_forecast"](spark, SF).collect()
    }
    assert set(got) == set(series)
    for t, xs in series.items():
        a = np.array(xs, dtype=np.int64)
        n, s = len(a), int(a.sum())
        sc = n * a - s  # n-scaled centered series (exact ints)
        c0 = int((sc * sc).sum())
        c1 = int((sc[:-1] * sc[1:]).sum())
        c2 = int((sc[:-2] * sc[2:]).sum())
        r = got[t]
        assert (r.c0, r.c1, r.c2) == (c0, c1, c2)
        den = c0 * c0 - c1 * c1
        phi1 = c1 * (c0 - c2) / den
        phi2 = (c0 * c2 - c1 * c1) / den
        assert abs(r.phi1 - phi1) < 2e-6 and abs(r.phi2 - phi2) < 2e-6
        # same fit via the float Yule-Walker equations (independent
        # derivation: solve [1 r1; r1 1][f1 f2]' = [r1 r2]')
        r1, r2 = c1 / c0, c2 / c0
        f1 = r1 * (1 - r2) / (1 - r1 * r1)
        f2 = (r2 - r1 * r1) / (1 - r1 * r1)
        assert abs(f1 - phi1) < 1e-9 and abs(f2 - phi2) < 1e-9
        # stationarity region spot-check for a fitted AR(2)
        assert abs(phi2) < 1 and phi2 + phi1 < 1 and phi2 - phi1 < 1
        mu = s / n
        fc = mu + phi1 * (xs[-1] - mu) + phi2 * (xs[-2] - mu)
        assert abs(r.forecast - fc) < 1e-5


def _daily_map():
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT event_type, CAST(date_part('day', ts) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2
        """
    ).fetchall()
    out = defaultdict(dict)
    for t, d, x in rows:
        out[t][d] = x
    return out


# ---------------------------------------------------------------------------
# phase 98: exchange-reuse census
# ---------------------------------------------------------------------------


def test_exchange_reuse_census(spark):
    out = {
        r.shape: r
        for r in QUERIES["q_exchange_reuse_census"](spark, SF01).collect()
    }
    assert set(out) == {"selfjoin_agg", "union_agg_legs",
                        "union_map_legs"}
    # reuse fires at exchange granularity...
    assert out["selfjoin_agg"].n_reused_exchange >= 1
    assert out["union_agg_legs"].n_reused_exchange >= 1
    # ...and ONLY there: map-only union legs re-execute the scan
    assert out["union_map_legs"].n_reused_exchange == 0
    assert (
        out["union_map_legs"].n_scans
        > out["selfjoin_agg"].n_reused_exchange
    )
    # cross-shape value anchor: all three compute 2x total quantity
    sums = {r.anchor_sum for r in out.values()}
    assert len(sums) == 1
    assert out["union_agg_legs"].rows == 2 * out["selfjoin_agg"].rows


# ---------------------------------------------------------------------------
# phase 99: parquet aggregate-pushdown census
# ---------------------------------------------------------------------------


def test_agg_pushdown_census(spark):
    out = {
        r.mode: r
        for r in QUERIES["q_agg_pushdown_census"](spark, SF01).collect()
    }
    assert set(out) == {"v2_pushdown", "v2_no_pushdown", "v1_default"}
    # pushdown fires only in the V2+conf mode...
    assert out["v2_pushdown"].agg_pushed == 1
    assert out["v2_no_pushdown"].agg_pushed == 0
    assert out["v1_default"].agg_pushed == 0
    # ...and answers from footer stats: orders of magnitude fewer
    # rows decoded than the data-scanning modes
    assert out["v2_pushdown"].scan_rows * 100 <= out[
        "v2_no_pushdown"
    ].scan_rows
    # value anchor: an execution strategy, never a semantics change
    answers = {(r.n, r.mn_cust, r.mx_cust) for r in out.values()}
    assert len(answers) == 1
    assert out["v1_default"].n == out["v1_default"].scan_rows
