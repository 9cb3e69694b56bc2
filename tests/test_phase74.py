"""Round-11 phase-74 pins: approximate FDs (g3) + composite INDs.

Pure-Python replays of both measures on the real sf0.001 fixture
(the spec the DuckDB twins also implement) plus the semantic story
each candidate list was chosen to tell: the exact key at g3 = 0, the
near-FD that fails exactly but holds at 1% tolerance, the phase-70
fake composite primary key quantified as a WRONG MODEL (g3 ≫ tol),
and the events day-15 shard boundary whose (user, event_type) pair
domain genuinely closes.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from legislative_bills_database_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ["orders", "lineitem", "customer", "supplier", "events"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return con


def test_approx_fd_matches_replay(spark):
    con = _con()
    cands = [
        ("orders", ["o_orderkey"], "o_custkey"),
        ("orders", ["o_custkey", "o_orderdate"], "o_orderstatus"),
        ("lineitem", ["l_orderkey", "l_linenumber"], "l_partkey"),
        ("customer", ["c_nationkey"], "c_mktsegment"),
        ("lineitem", ["l_partkey"], "l_suppkey"),
    ]
    expect = {}
    for t, lhs, rhs in cands:
        rows = con.execute(
            f"SELECT {', '.join(lhs)}, {rhs} FROM {t}"
        ).fetchall()
        per_group: dict = defaultdict(Counter)
        for r in rows:
            per_group[r[:-1]][r[-1]] += 1
        n = len(rows)
        keep = sum(max(c.values()) for c in per_group.values())
        g3 = (n - keep) / n
        expect[f"{t}: {','.join(lhs)} -> {rhs}"] = (
            n,
            n - keep,
            round(g3, 6),
            1 if g3 <= 0.01 else 0,
        )
    got = {
        r.fd: (r.n_rows, r.n_violations, r.g3, r.holds_approx)
        for r in QUERIES["q_approx_fd"](spark, SF).collect()
    }
    assert got == expect
    # the story: exact key / near-FD / wrong model
    assert got["orders: o_orderkey -> o_custkey"][2] == 0.0
    near = got["orders: o_custkey,o_orderdate -> o_orderstatus"]
    assert 0.0 < near[2] <= 0.01 and near[3] == 1
    fake_pk = got["lineitem: l_orderkey,l_linenumber -> l_partkey"]
    assert fake_pk[2] > 0.1 and fake_pk[3] == 0


def test_composite_ind_matches_replay(spark):
    con = _con()
    specs = {
        "events[d16-30]:(user_id,event_type) <= events[d1-15]": (
            "SELECT DISTINCT user_id, event_type FROM events "
            "WHERE date_part('day', ts) >= 16",
            "SELECT DISTINCT user_id, event_type FROM events "
            "WHERE date_part('day', ts) <= 15",
        ),
        "lineitem[even orders]:(l_partkey,l_suppkey) <= lineitem[odd]": (
            "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem "
            "WHERE l_orderkey % 2 = 0",
            "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem "
            "WHERE l_orderkey % 2 = 1",
        ),
        "orders[%3=0]:(o_orderkey,o_custkey) <= orders": (
            "SELECT DISTINCT o_orderkey, o_custkey FROM orders "
            "WHERE o_orderkey % 3 = 0",
            "SELECT DISTINCT o_orderkey, o_custkey FROM orders",
        ),
        "customer:(c_custkey,c_nationkey) <= supplier:(s_suppkey,s_nationkey)": (
            "SELECT DISTINCT c_custkey, c_nationkey FROM customer",
            "SELECT DISTINCT s_suppkey, s_nationkey FROM supplier",
        ),
    }
    expect = {}
    for label, (lq, rq) in specs.items():
        lhs = set(map(tuple, con.execute(lq).fetchall()))
        rhs = set(map(tuple, con.execute(rq).fetchall()))
        miss = len(lhs - rhs)
        expect[label] = (
            len(lhs),
            miss,
            1 if miss == 0 else 0,
            round((len(lhs) - miss) / len(lhs), 6),
        )
    got = {
        r.ind: (r.n_lhs, r.n_missing, r.holds, r.containment)
        for r in QUERIES["q_composite_ind"](spark, SF).collect()
    }
    assert got == expect
    # shard-boundary closure holds; structural subset holds; decoy dies
    assert got[
        "events[d16-30]:(user_id,event_type) <= events[d1-15]"
    ][2] == 1
    assert got["orders[%3=0]:(o_orderkey,o_custkey) <= orders"][2] == 1
    assert (
        got[
            "customer:(c_custkey,c_nationkey) <= supplier:(s_suppkey,s_nationkey)"
        ][3]
        < 0.05
    )
