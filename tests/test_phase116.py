"""Phase 116-119 pins: Luby MIS (independence + maximality +
sequential-greedy equality is the oracle), the lagged cross-correlation
matrix (hand fixture: a perfect lead-1 pair), KMV resemblance error
bound, and the file-source rate-limit certificate."""

from __future__ import annotations

import pytest

import datetime as dt

SF01 = "/root/testdata/sf0.01"
SF001 = "/root/testdata/sf0.001"


class TestLubyMis:
    def test_independence_and_maximality(self, spark):
        from legislative_bills_database_spark.plans import QUERIES
        from legislative_bills_database_spark.plans.roundfive_queries import (
            _copurchase_edges,
        )

        rows = QUERIES["q_luby_mis"](spark, SF01).collect()
        in_mis = {r.node for r in rows if r.in_mis == 1}
        out = {r.node for r in rows if r.in_mis == 0}
        assert in_mis and out
        edges = [
            (r.src, r.dst)
            for r in _copurchase_edges(spark, SF01).collect()
        ]
        nbrs: dict = {}
        for s, d in edges:
            nbrs.setdefault(s, set()).add(d)
            nbrs.setdefault(d, set()).add(s)
        # independence: no MIS edge has both endpoints in the set
        assert all(
            not (s in in_mis and d in in_mis) for s, d in edges
        )
        # maximality: every excluded node is adjacent to an MIS node
        assert all(nbrs[v] & in_mis for v in out)


class TestXcorrMatrix:
    def test_perfect_lead_one_pair(self, spark, tmp_path):
        from legislative_bills_database_spark.plans import QUERIES

        rows = []
        eid = 0
        base = dt.datetime(2024, 3, 1, 12)
        for d in range(20):
            # type 'aa' count pattern 1 + d%3 on day d; type 'bb' the
            # SAME pattern one day later -> corr(aa(d), bb(d+1)) = 1
            for _ in range(1 + d % 3):
                eid += 1
                rows.append((eid, base + dt.timedelta(days=d), "aa"))
            for _ in range(1 + d % 3):
                eid += 1
                rows.append((eid, base + dt.timedelta(days=d + 1), "bb"))
        p = tmp_path / "xcorr"
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string"
        ).write.parquet(f"{p}/events.parquet")
        got = {
            (r.type_a, r.type_b, r.lag): r
            for r in QUERIES["q_xcorr_matrix"](spark, str(p)).collect()
        }
        r1 = got[("aa", "bb", 1)]
        assert r1.xcorr == 1.0
        # mismatched alignment is NOT perfectly correlated
        assert got[("aa", "bb", 0)].xcorr < 1.0
        for r in got.values():
            if r.xcorr is not None:
                assert -1.0 <= r.xcorr <= 1.0

    def test_fixture_bounds(self, spark):
        from legislative_bills_database_spark.plans import QUERIES

        rows = QUERIES["q_xcorr_matrix"](spark, SF001).collect()
        assert rows
        for r in rows:
            assert r.type_a < r.type_b
            if r.xcorr is not None:
                assert -1.0 <= r.xcorr <= 1.0


class TestKmvResemblance:
    def test_estimate_within_error_bound(self, spark):
        from legislative_bills_database_spark.plans import QUERIES

        r = QUERIES["q_kmv_resemblance"](spark, SF01).collect()[0]
        assert r.k_used == 256
        # Broder's resemblance estimator: ±1/√k standard error — allow
        # 3 sigma (the fixture's measured error is well inside 1)
        assert abs(r.jaccard_est - r.jaccard_exact) <= 3 * r.err_bound
        assert 0.0 < r.jaccard_exact < 1.0  # non-degenerate sets
        # inter_est coherent with its own factors
        assert abs(
            r.inter_est - round(r.union_est * r.k_both / r.k_used, 2)
        ) < 0.02


class TestStreamRateLimit:
    @pytest.mark.slow  # r15 fast-lane: measured-heavy (see pytest.ini)
    def test_backpressure_certificate(self, spark):
        from legislative_bills_database_spark.plans import QUERIES

        r = QUERIES["q_stream_rate_limit"](spark, SF001).collect()[0]
        assert r.n_files == 12
        assert r.backpressure_holds == 1
        assert r.results_agree == 1
        assert (
            r.n_batches_mft1 == 12
            and r.n_batches_mft4 == 3
            and r.n_batches_nolimit == 1
        )
        assert r.rows_total > 0
