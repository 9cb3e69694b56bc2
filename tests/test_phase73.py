"""Round-11 phase-73 pin: DAG critical path (hop-bounded max-plus).

A strict-Jacobi pure-Python replay of six max-plus relaxation sweeps
over the real sf0.001 co-purchase DAG (directed src < dst, so acyclic
by construction) must match the Spark result EXACTLY — the same
round-for-round spec the chained-CTE DuckDB twin implements. Plus the
acyclicity premise itself (every edge strictly increases the partkey)
and monotonicity (crit_cost ≥ 0 everywhere, > 0 exactly for nodes
with an incoming edge).
"""

from __future__ import annotations

from collections import defaultdict

import duckdb

from legislative_bills_database_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"
ROUNDS = 6


def _dag():
    con = duckdb.connect()
    return con.execute(
        f"""
        SELECT a.l_partkey, b.l_partkey,
               CAST(MIN(CAST(a.l_quantity + b.l_quantity AS BIGINT))
                    AS BIGINT)
        FROM read_parquet('{SF}/lineitem.parquet') a
        JOIN read_parquet('{SF}/lineitem.parquet') b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        WHERE a.l_orderkey % 97 = 0 GROUP BY 1, 2
        """
    ).fetchall()


def test_critical_path_matches_jacobi_replay(spark):
    edges = _dag()
    assert all(s < d for s, d, _ in edges), "edge list must be a DAG"
    nodes = {s for s, _, _ in edges} | {d for _, d, _ in edges}
    dist = {v: 0 for v in nodes}
    for _ in range(ROUNDS):  # strict sweeps: round k reads only k-1
        prev = dict(dist)
        nxt = dict(prev)
        for s, d, w in edges:
            if prev[s] + w > nxt[d]:
                nxt[d] = prev[s] + w
        dist = nxt
    got = {
        r.node: r.crit_cost
        for r in QUERIES["q_critical_path"](spark, SF).collect()
    }
    assert got == dist


def test_critical_path_positive_iff_incoming(spark):
    edges = _dag()
    has_in = {d for _, d, _ in edges}
    for r in QUERIES["q_critical_path"](spark, SF).collect():
        assert (r.crit_cost > 0) == (r.node in has_in)
