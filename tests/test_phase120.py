"""Phase 120-121 pins: banded matrix profile (planted motif + discord
on a designed series) and IVM aggregate maintenance (maintained ≡
recomputed under retractions)."""

from __future__ import annotations

import datetime as dt

SF01 = "/root/testdata/sf0.01"


class TestMatrixProfile:
    def test_planted_motif_and_discord(self, spark, tmp_path):
        """60-day strictly-increasing series (no accidental repeats)
        with an IDENTICAL 4-day motif planted at positions 10 and 30
        (d² = 0, the unique zero pair) and a 1e6 spike at day 50 whose
        covering subsequences are everyone's farthest neighbors."""
        from legislative_bills_database_spark.plans import QUERIES

        motif = [500.0, 600.0, 700.0, 800.0]
        vals = [float(d * 10 + 1) for d in range(60)]
        vals[10:14] = motif
        vals[30:34] = motif
        vals[50] = 1_000_000.0
        rows = [
            (d + 1, 1, dt.date(2024, 1, 1) + dt.timedelta(days=d), vals[d])
            for d in range(60)
        ]
        p = tmp_path / "mp"
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderdate date,"
            " o_totalprice double",
        ).write.parquet(f"{p}/orders.parquet")
        spark.createDataFrame(
            [(1, 0)], "c_custkey long, c_nationkey int"
        ).write.parquet(f"{p}/customer.parquet")
        spark.createDataFrame(
            [(0, "NATION_A")], "n_nationkey int, n_name string"
        ).write.parquet(f"{p}/nation.parquet")

        r = QUERIES["q_matrix_profile"](spark, str(p)).collect()[0]
        assert r.n_sub == 57  # 60 days - m + 1
        assert r.motif_d2 == 0
        assert {r.motif_i, r.motif_nn} == {10, 30}
        # discord: a subsequence covering the spike (positions 47-50)
        assert 47 <= r.discord_i <= 50
        assert r.discord_d2 > 10**11  # ~ (1e6 dollar-diff)² scale

    def test_profile_band_and_exclusion(self, spark):
        """Fixture sanity at sf0.01: motif/discord positions within the
        subsequence range and the motif pair respects the exclusion
        zone and the band."""
        from legislative_bills_database_spark.plans import QUERIES
        from legislative_bills_database_spark.plans.roundfourteen_queries import (
            _MP_B,
            _MP_M,
        )

        for r in QUERIES["q_matrix_profile"](spark, SF01).collect():
            for i, nn in ((r.motif_i, r.motif_nn), (r.discord_i, r.discord_nn)):
                assert 0 <= i < r.n_sub and 0 <= nn < r.n_sub
                assert _MP_M <= abs(i - nn) <= _MP_B
            assert 0 <= r.motif_d2 <= r.discord_d2


class TestIvmAgg:
    def test_maintained_equals_recomputed(self, spark):
        from legislative_bills_database_spark.plans import QUERIES

        rows = QUERIES["q_ivm_agg"](spark, SF01).collect()
        assert rows
        assert all(r.agree == 1 for r in rows)
        assert all(r.n_maint == r.n_rec and r.s_maint == r.s_rec
                   for r in rows)

    def test_retractions_actually_removed_rows(self, spark):
        from legislative_bills_database_spark.io import load_table
        from legislative_bills_database_spark.plans import QUERIES

        total = load_table(spark, SF01, "orders").count()
        kept = sum(
            r.n_rec
            for r in QUERIES["q_ivm_agg"](spark, SF01).collect()
        )
        assert 0 < kept < total  # deletes bit, inserts preserved


class TestRuntimeFilterCensus:
    def test_bloom_cuts_shuffle_not_semantics(self, spark):
        from legislative_bills_database_spark.plans import QUERIES

        got = {
            r.mode: r
            for r in QUERIES["q_runtime_filter_census"](
                spark, SF01
            ).collect()
        }
        on, off = got["bloom-on"], got["bloom-off"]
        # value parity: a runtime filter is an execution strategy
        assert (on.result_rows, on.cents) == (off.result_rows, off.cents)
        assert on.result_rows > 0
        # mechanism: filter present only when enabled, and it cuts the
        # wire traffic (sf0.01 measured ~49x: 1,214 vs 60,039)
        assert on.n_bloom_nodes >= 1 and off.n_bloom_nodes == 0
        assert on.shuffle_records < off.shuffle_records / 2
