"""Robust/windowed statistics: rolling event-time averages, MAD outlier
census, histogram + trend invariants (oracle parity runs separately in
test_oracle_parity.py — these pin the semantics the hash can't see).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, offsets_sec, values=None, key="u1"):
    values = values or [1.0] * len(offsets_sec)
    rows = [
        (key, i, BASE + dt.timedelta(seconds=s), float(v))
        for i, (s, v) in enumerate(zip(offsets_sec, values))
    ]
    return spark.createDataFrame(rows, "user_id string, event_id long, ts timestamp, value double")


class TestRollingTimeAvg:
    def test_closed_boundary_included(self, spark):
        """An event exactly window_seconds earlier is IN the frame
        (closed interval, matching SQL RANGE ... PRECEDING)."""
        from legislative_bills_database_spark.operators.timeseries import (
            rolling_time_avg,
        )

        df = _events(spark, [0, 1800, 3600], [10.0, 20.0, 30.0])
        out = {
            r["event_id"]: (r["rolling_avg"], r["rolling_n"])
            for r in rolling_time_avg(df).collect()
        }
        assert out[2] == (20.0, 3)  # t=3600 still sees t=0
        assert out[1] == (15.0, 2)

    def test_stale_rows_fall_out(self, spark):
        """One second past the window, the old event is gone."""
        from legislative_bills_database_spark.operators.timeseries import (
            rolling_time_avg,
        )

        df = _events(spark, [0, 3601], [10.0, 30.0])
        out = {
            r["event_id"]: (r["rolling_avg"], r["rolling_n"])
            for r in rolling_time_avg(df).collect()
        }
        assert out[1] == (30.0, 1)

    def test_timestamp_peers_share_frame(self, spark):
        """Equal timestamps are RANGE peers: both rows get the same
        frame regardless of their relative order."""
        from legislative_bills_database_spark.operators.timeseries import (
            rolling_time_avg,
        )

        df = _events(spark, [100, 100], [10.0, 30.0])
        rows = rolling_time_avg(df).collect()
        assert {(r["rolling_avg"], r["rolling_n"]) for r in rows} == {(20.0, 2)}

    def test_keys_isolated(self, spark):
        from legislative_bills_database_spark.operators.timeseries import (
            rolling_time_avg,
        )

        a = _events(spark, [0, 60], [10.0, 20.0], key="a")
        b = _events(spark, [30], [99.0], key="b")
        out = {
            (r["user_id"], r["event_id"]): r["rolling_n"]
            for r in rolling_time_avg(a.unionAll(b)).collect()
        }
        assert out[("a", 1)] == 2 and out[("b", 0)] == 1


class TestMadOutlierCensus:
    def test_matches_numpy(self, spark):
        from legislative_bills_database_spark.operators.profile import (
            mad_outlier_census,
        )

        rng = np.random.default_rng(7)
        vals = np.concatenate([rng.normal(100, 5, 400), [1000.0, -500.0]])
        df = spark.createDataFrame(
            [("g", float(v)) for v in vals], "grp string, x double"
        )
        row = mad_outlier_census(df, "grp", "x").collect()[0]

        med = np.median(vals)
        mad = np.median(np.abs(vals - med))
        expected_out = int(np.sum(np.abs(vals - med) > 3.5 * 1.4826 * mad))
        assert row["n"] == len(vals)
        assert row["n_outliers"] == expected_out
        assert expected_out >= 2  # the two planted whales are caught
        assert row["med"] == round(float(med), 4)
        assert row["mad"] == round(float(mad), 4)

    def test_whale_immunity_vs_zscore(self, spark):
        """The property that justifies MAD: one extreme value inflates a
        stddev fence enough to hide a lesser outlier, but not the MAD
        fence."""
        from legislative_bills_database_spark.operators.profile import (
            mad_outlier_census,
        )

        vals = [10.0] * 50 + [11.0] * 50 + [40.0, 1e6]
        df = spark.createDataFrame(
            [("g", v) for v in vals], "grp string, x double"
        )
        row = mad_outlier_census(df, "grp", "x").collect()[0]
        # z-score with the 1e6 whale in the stddev would flag only the
        # whale; MAD flags 40.0 too
        assert row["n_outliers"] == 2


class TestHistogramTrendInvariants:
    def test_histogram_partition_of_rows(self, spark):
        from legislative_bills_database_spark.plans import QUERIES

        rows = QUERIES["q_histogram"](spark, SF_DIR).collect()
        total = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
        assert sum(r["n"] for r in rows) == total
        assert all(0 <= r["bin"] <= 19 for r in rows)
        # equi-width: consecutive bin_lo steps are constant
        los = [r["bin_lo"] for r in sorted(rows, key=lambda r: r["bin"])]
        steps = {round(b - a, 2) for a, b in zip(los, los[1:])}
        assert len(steps) <= 2  # float rounding may split one step value

    def test_trend_recovers_planted_slope(self, spark):
        """regr_slope math sanity on a noiseless synthetic series:
        value = 5 + 2·days ⇒ slope_per_day 2, corr 1."""
        rows = [
            (BASE + dt.timedelta(days=d, seconds=s), 5.0 + 2.0 * (d + s / 86400))
            for d in range(10)
            for s in (0, 40000)
        ]
        df = spark.createDataFrame(rows, "ts timestamp, value double")
        t0 = df.agg(F.min(F.unix_micros("ts")).alias("t0"))
        pts = df.join(F.broadcast(t0)).select(
            "value",
            ((F.unix_micros("ts") - F.col("t0")).cast("double") / 1e6).alias("x"),
        )
        out = pts.agg(
            F.round(F.regr_slope("value", "x") * 86400, 6).alias("slope"),
            F.round(F.corr("value", "x"), 6).alias("c"),
        ).collect()[0]
        assert abs(out["slope"] - 2.0) < 1e-6
        assert out["c"] == 1.0
