"""Statistical drift/testing family: chi-square independence, PSI,
windowed trending top-k. Oracle parity runs in test_oracle_parity; these
pin the mathematical invariants the hash can't express.
"""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_chi_square_invariants(spark):
    from legislative_bills_database_spark.plans import QUERIES

    row = QUERIES["q_chi_square"](spark, SF_DIR).collect()[0]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_langs = docs.select("lang").distinct().count()
    n_sources = docs.select("source").distinct().count()
    # the grid covers EVERY (lang, source) combination, observed or not
    assert row.n_cells == n_langs * n_sources
    assert row.dof == (n_langs - 1) * (n_sources - 1)
    assert row.chi2 >= 0


def test_psi_terms_nonnegative_and_partition(spark):
    """(p_a − p_b)·ln(p_a/p_b) ≥ 0 for every bin (both factors share
    sign), so PSI ≥ 0 with equality iff the distributions match; the
    two populations partition the table exactly."""
    from legislative_bills_database_spark.plans import QUERIES

    rows = QUERIES["q_psi"](spark, SF_DIR).collect()
    assert all(r.psi_term >= 0 for r in rows)
    assert all(0 <= r.bin <= 9 for r in rows)
    total = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert sum(r.n_a + r.n_b for r in rows) == total


def test_trending_rank_shape(spark):
    from collections import defaultdict

    from legislative_bills_database_spark.plans import QUERIES

    rows = QUERIES["q_trending"](spark, SF_DIR).collect()
    by_win = defaultdict(list)
    for r in rows:
        by_win[r.window_start].append(r)
    for win, rs in by_win.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        # counts non-increasing down the ranks
        ns = [r.n for r in rs]
        assert ns == sorted(ns, reverse=True)
