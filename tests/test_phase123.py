"""Phase 123-125 pins: uplift/Qini identities, mergeable-quantile rank
error within its theoretical bound, bitemporal restatement property."""

from __future__ import annotations

import datetime as dt

SF01 = "/root/testdata/sf0.01"


class TestUpliftQini:
    def test_decile_structure_and_qini_identity(self, spark):
        from legislative_bills_database_spark.plans import QUERIES

        rows = sorted(
            QUERIES["q_uplift_qini"](spark, SF01).collect(),
            key=lambda r: r.decile,
        )
        assert [r.decile for r in rows] == list(range(1, 11))
        # NTILE buckets: sizes differ by at most 1 customer
        sizes = [r.n_t + r.n_c for r in rows]
        assert max(sizes) - min(sizes) <= 1
        # final Qini point equals the all-population identity
        nt = sum(r.n_t for r in rows)
        nc = sum(r.n_c for r in rows)
        ct = sum(r.conv_t for r in rows)
        cc = sum(r.conv_c for r in rows)
        expect = round(ct - cc * nt / nc, 6)
        assert abs(rows[-1].qini_cum - expect) < 1e-6
        # md5-parity coin: arms roughly balanced
        assert 0.4 < nt / (nt + nc) < 0.6


class TestQuantileMerge:
    def test_rank_error_within_bound(self, spark):
        from legislative_bills_database_spark.io import load_table
        from legislative_bills_database_spark.plans import QUERIES

        rows = QUERIES["q_quantile_merge"](spark, SF01).collect()
        assert {r.p for r in rows} == {50, 90, 99}
        vals = [
            r.c
            for r in load_table(spark, SF01, "orders")
            .selectExpr(
                "CAST(ROUND(o_totalprice * 100) AS LONG) AS c"
            )
            .collect()
        ]
        lo, hi = min(vals), max(vals)
        for r in rows:
            assert r.rank_err <= r.bound  # the mergeable-summary bound
            assert lo <= r.est_cents <= hi
            assert lo <= r.exact_cents <= hi
        # estimates ordered like their percentiles
        by_p = {r.p: r.est_cents for r in rows}
        assert by_p[50] <= by_p[90] <= by_p[99]


class TestBitemporalAsof:
    def test_restatement_property(self, spark):
        from pyspark.sql import functions as F

        from legislative_bills_database_spark.io import load_table
        from legislative_bills_database_spark.plans import QUERIES
        from legislative_bills_database_spark.plans.roundfourteen_queries import (
            _BT_T1,
            _BT_T2,
        )

        rows = QUERIES["q_bitemporal_asof"](spark, SF01).collect()
        t1 = {r.order_year: r for r in rows if r.asof_date == _BT_T1}
        t2 = {r.order_year: r for r in rows if r.asof_date == _BT_T2}
        orders = load_table(spark, SF01, "orders")
        base = {
            r.y: (r.n, r.s)
            for r in orders.groupBy(
                F.year("o_orderdate").cast("long").alias("y")
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                )
                .cast("long")
                .alias("s"),
            )
            .collect()
        }
        # at T2 everything is known: every order present, every %7
        # order restated (+500 cents each)
        for y, r in t2.items():
            n, s = base[y]
            assert r.n_orders == n
            assert r.total_cents == s + 500 * r.n_corrected
        assert sum(r.n_corrected for r in t2.values()) > 0
        # at T1 nothing dated after T1 is visible, and corrections are
        # a subset of T2's
        cut = dt.datetime.fromisoformat(_BT_T1).year
        assert all(y <= cut for y in t1)
        for y, r in t1.items():
            assert r.n_corrected <= t2[y].n_corrected
            assert r.n_orders <= t2[y].n_orders


class TestPpr:
    def test_seed_localization_and_floor(self, spark):
        """PPR must concentrate mass toward the seed set: every seed
        keeps at least its teleport floor, and the seeds' mass share
        strictly exceeds their population share (the localization that
        distinguishes PPR from global PageRank)."""
        from legislative_bills_database_spark.plans import QUERIES
        from legislative_bills_database_spark.plans.roundfourteen_queries import (
            _PPR_SEED_MOD,
        )

        rows = QUERIES["q_ppr"](spark, SF01).collect()
        assert rows and all(r.ppr_scaled > 0 for r in rows)
        total = sum(r.ppr for r in rows)
        assert abs(total - 1.0) < 0.001
        seeds = [r for r in rows if r.node % _PPR_SEED_MOD == 0]
        assert seeds
        seed_share = sum(r.ppr for r in seeds)
        pop_share = len(seeds) / len(rows)
        assert seed_share > pop_share
