"""Round-11 phase-80 pin: split-conformal prediction intervals.

A pure-Python replay of the whole pipeline (floor-div micro-cent
predictor, k = ceil(0.9(n+1)) calibration order statistic, held-out
coverage count) on the real sf0.001 events — exact integer equality —
plus the guarantee the method exists for: empirical coverage lands
near the nominal 90% on every event type.
"""

from __future__ import annotations

import duckdb

from legislative_bills_database_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def test_conformal_matches_replay(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT event_type, date_part('day', ts),
               CAST(ROUND(value * 100) AS BIGINT)
        FROM read_parquet('{SF}/events.parquet')
        """
    ).fetchall()
    by_type: dict = {}
    for t, d, c in rows:
        by_type.setdefault(t, []).append((int(d), int(c)))
    expect = {}
    for t, obs in by_type.items():
        train = [c for d, c in obs if d <= 20]
        pred = (10000 * sum(train)) // len(train)
        cal = sorted(
            abs(10000 * c - pred) for d, c in obs if 21 <= d <= 25
        )
        k = (9 * (len(cal) + 1) + 9) // 10
        qhat = cal[k - 1]
        test = [c for d, c in obs if d >= 26]
        cov = sum(1 for c in test if abs(10000 * c - pred) <= qhat)
        expect[t] = (
            len(train), pred, len(cal), qhat, len(test), cov,
            round(cov / len(test), 6),
        )
    got = {
        r.event_type: (
            r.n_train, r.pred_micro, r.n_cal, r.qhat_micro, r.n_test,
            r.n_covered, r.coverage,
        )
        for r in QUERIES["q_conformal"](spark, SF).collect()
    }
    assert got == expect


def test_conformal_coverage_near_nominal(spark):
    """The 1−α guarantee is in expectation over calibration draws, so
    per-type empirical coverage gets a binomial 3σ band around 0.9
    (at sf0.001 a type holds only ~23 test rows), while the pooled
    coverage must clear a flat 0.85."""
    rows = QUERIES["q_conformal"](spark, SF).collect()
    covered = sum(r.n_covered for r in rows)
    total = sum(r.n_test for r in rows)
    assert covered / total >= 0.85, covered / total
    for r in rows:
        floor = 0.9 - 3.0 * (0.9 * 0.1 / r.n_test) ** 0.5
        assert r.coverage >= floor, (r.event_type, r.coverage, floor)
