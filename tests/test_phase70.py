"""Round-11 phase-70 pins: schema-constraint discovery (inclusion and
functional dependencies).

Pure-Python replay on the real sf0.001 fixture plus structural
assertions: the star-schema FKs must HOLD and the planted decoy
hypotheses must FAIL — a discovery operator that grades everything
'holds' is as broken as one that grades nothing."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from legislative_bills_database_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"

TABLES = ("orders", "lineitem", "customer", "events", "part", "supplier")


def _con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return con


def test_inclusion_deps_python_replay(spark):
    rows = {
        (r.lhs, r.rhs): r
        for r in QUERIES["q_inclusion_deps"](spark, SF).collect()
    }
    con = _con()

    def distinct(table: str, col: str) -> set:
        return {
            v
            for (v,) in con.execute(
                f"SELECT DISTINCT {col} FROM {table}"
            ).fetchall()
        }

    cands = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("customer", "c_custkey", "events", "user_id"),
        ("part", "p_partkey", "supplier", "s_suppkey"),
    ]
    assert len(rows) == len(cands)
    for lt, lc, rt, rc in cands:
        ls, rs = distinct(lt, lc), distinct(rt, rc)
        r = rows[(f"{lt}.{lc}", f"{rt}.{rc}")]
        missing = len(ls - rs)
        assert r.n_lhs == len(ls)
        assert r.n_missing == missing
        assert r.holds == (1 if missing == 0 else 0)
        assert r.containment == round((len(ls) - missing) / len(ls), 6)
    # discovery must separate: the 4 star-schema FKs hold, both decoys fail
    holds = {k: v.holds for k, v in rows.items()}
    assert holds[("lineitem.l_orderkey", "orders.o_orderkey")] == 1
    assert holds[("orders.o_custkey", "customer.c_custkey")] == 1
    assert holds[("lineitem.l_partkey", "part.p_partkey")] == 1
    assert holds[("lineitem.l_suppkey", "supplier.s_suppkey")] == 1
    assert holds[("customer.c_custkey", "events.user_id")] == 0
    assert holds[("part.p_partkey", "supplier.s_suppkey")] == 0


def test_fd_check_python_replay(spark):
    rows = {r.fd: r for r in QUERIES["q_fd_check"](spark, SF).collect()}
    con = _con()
    cands = [
        ("orders", ["o_orderkey"], "o_custkey"),
        ("events", ["event_id"], "user_id"),
        ("lineitem", ["l_orderkey", "l_linenumber"], "l_partkey"),
        ("customer", ["c_nationkey"], "c_mktsegment"),
        ("part", ["p_brand"], "p_type"),
        ("lineitem", ["l_partkey"], "l_suppkey"),
    ]
    assert len(rows) == len(cands)
    for t, lhs, rhs in cands:
        data = con.execute(
            f"SELECT {', '.join(lhs)}, {rhs} FROM {t}"
        ).fetchall()
        groups = defaultdict(set)
        for *k, v in data:
            groups[tuple(k)].add(v)
        name = f"{t}: {','.join(lhs)} -> {rhs}"
        r = rows[name]
        assert r.n_groups == len(groups)
        assert r.n_violating == sum(1 for s in groups.values() if len(s) > 1)
        assert r.max_rhs == max(len(s) for s in groups.values())
        assert r.holds == (1 if r.max_rhs == 1 else 0)
    # keys hold; the four false hypotheses fail — including the
    # DISCOVERED one: (l_orderkey, l_linenumber) is not unique in this
    # fixture (duplicate line numbers within an order at every SF)
    assert rows["orders: o_orderkey -> o_custkey"].holds == 1
    assert rows["events: event_id -> user_id"].holds == 1
    assert rows["lineitem: l_orderkey,l_linenumber -> l_partkey"].holds == 0
    assert rows["customer: c_nationkey -> c_mktsegment"].holds == 0
    assert rows["part: p_brand -> p_type"].holds == 0
    assert rows["lineitem: l_partkey -> l_suppkey"].holds == 0
