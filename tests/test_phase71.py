"""Round-11 phase-71 pin: sampled Brandes betweenness.

Two replays on the real sf0.001 purchase graph: an integer replay of
the floor-quantized recurrence (must match Spark EXACTLY — this is the
spec the DuckDB twin also implements) and a float Brandes replay
(Brandes 2001, exact dependency accumulation) bounding the
quantization error — the certificate that betweenness_q/scale IS
betweenness, not merely a self-consistent number."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from legislative_bills_database_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"
SEEDS = ["s1", "s2", "s3", "s4"]
DEPTH = 4
SCALE = 1_000_000


def _graph():
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT DISTINCT concat('c', o_custkey), concat('s', l_suppkey)
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/lineitem.parquet') l
          ON o.o_orderkey = l.l_orderkey
        """
    ).fetchall()
    adj = defaultdict(set)
    for a, b in rows:
        adj[a].add(b)
        adj[b].add(a)
    return adj


def _levels(adj, seed):
    lvl = {0: {seed: 1}}
    seen = {seed}
    for k in range(1, DEPTH + 1):
        nxt: dict[str, int] = defaultdict(int)
        for u, sig in lvl[k - 1].items():
            for v in adj[u]:
                if v not in seen:
                    nxt[v] += sig
        for v in nxt:
            seen.add(v)
        lvl[k] = dict(nxt)
    return lvl


def test_betweenness_integer_replay_exact(spark):
    rows = {
        r.node: r.betweenness_q
        for r in QUERIES["q_betweenness_sample"](spark, SF).collect()
    }
    adj = _graph()
    acc = defaultdict(int)
    for seed in SEEDS:
        lvl = _levels(adj, seed)
        delta = {v: 0 for v in lvl[DEPTH]}
        for k in range(DEPTH, 0, -1):
            ndelta = {}
            for v, sig_v in lvl[k - 1].items():
                s = 0
                for w in adj[v]:
                    if w in lvl[k]:
                        s += (sig_v * (SCALE + delta[w])) // lvl[k][w]
                ndelta[v] = s
            if k > 1:  # Brandes excludes the source's own delta
                for v, d in ndelta.items():
                    acc[v] += d
            delta = ndelta
    expect = {v: d for v, d in acc.items() if d > 0}
    assert rows == expect


def test_betweenness_tracks_float_brandes(spark):
    rows = {
        r.node: r.betweenness_q / SCALE
        for r in QUERIES["q_betweenness_sample"](spark, SF).collect()
    }
    adj = _graph()
    acc = defaultdict(float)
    for seed in SEEDS:
        lvl = _levels(adj, seed)
        delta = {v: 0.0 for v in lvl[DEPTH]}
        for k in range(DEPTH, 0, -1):
            ndelta = {}
            for v, sig_v in lvl[k - 1].items():
                s = 0.0
                for w in adj[v]:
                    if w in lvl[k]:
                        s += sig_v / lvl[k][w] * (1.0 + delta[w])
                ndelta[v] = s
            if k > 1:  # Brandes excludes the source's own delta
                for v, d in ndelta.items():
                    acc[v] += d
            delta = ndelta
    # floor quantization loses < 1/SCALE per term, always downward —
    # so q <= float, and the worst node's gap stays tiny relative to
    # its value (terms per node are bounded by its degree × levels)
    for v, q in rows.items():
        f = acc[v]
        assert q <= f + 1e-9
        assert f - q <= max(1e-3 * f, 1e-2)
    # the quantized ranking preserves the float top broker
    top_q = max(rows, key=lambda v: (rows[v], v))
    top_f = max(
        (v for v in acc if acc[v] > 0), key=lambda v: (acc[v], v)
    )
    assert top_q == top_f
