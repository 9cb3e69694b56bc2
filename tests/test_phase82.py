"""Round-11 phase-82 pin: semi-additive (closing balance) aggregation.

Pure-Python replay of the closing-balance carry-forward on the real
sf0.001 orders, plus the structural properties that define the
pattern: customer coverage is non-decreasing over years (a balance,
once known, never disappears), active + carried = covered, and the
semi-additive total diverges from the naive transaction sum (the
divergence is WHY the operator exists).
"""

from __future__ import annotations

import duckdb

from legislative_bills_database_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _replay():
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT o_custkey, date_part('year', o_orderdate),
               o_orderdate, o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT)
        FROM read_parquet('{SF}/orders.parquet')
        ORDER BY o_custkey, o_orderdate, o_orderkey
        """
    ).fetchall()
    closing: dict = {}
    naive: dict = {}
    for c, yr, d, k, cents in rows:
        closing[(c, int(yr))] = cents  # last in order wins
        naive[int(yr)] = naive.get(int(yr), 0) + cents
    custs = sorted({c for c, _ in closing})
    years = sorted({y for _, y in closing})
    expect = {}
    for yr in years:
        n_cust = n_active = n_carried = total = 0
        for c in custs:
            bal = None
            active = (c, yr) in closing
            for y in years:
                if y > yr:
                    break
                if (c, y) in closing:
                    bal = closing[(c, y)]
            if bal is not None:
                n_cust += 1
                total += bal
                if active:
                    n_active += 1
                else:
                    n_carried += 1
        expect[yr] = (n_cust, n_active, n_carried, total, naive[yr])
    return expect


def test_semi_additive_matches_replay(spark):
    got = {
        r.yr: (
            r.n_customers, r.n_active, r.n_carried,
            r.balance_total_cents, r.naive_sum_cents,
        )
        for r in QUERIES["q_semi_additive"](spark, SF).collect()
    }
    assert got == _replay()


def test_semi_additive_structure(spark):
    rows = sorted(
        QUERIES["q_semi_additive"](spark, SF).collect(),
        key=lambda r: r.yr,
    )
    cov = [r.n_customers for r in rows]
    assert cov == sorted(cov), "coverage must never shrink"
    for r in rows:
        assert r.n_active + r.n_carried == r.n_customers
    # the naive sum and the semi-additive total must diverge somewhere
    assert any(
        r.balance_total_cents != r.naive_sum_cents for r in rows
    )
