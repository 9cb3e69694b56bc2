"""Bucketed co-located join: the staged layout must eliminate the join
shuffle entirely (plan-asserted), and salted aggregation must match the
direct aggregate exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from legislative_bills_database_spark.operators.skew import salted_agg, salted_count
from legislative_bills_database_spark.sources.cache import stage_bucketed

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    bo = stage_bucketed(
        spark, orders, "t_orders_b", ["o_custkey"], 8, str(tmp_path / "o")
    )
    bc = stage_bucketed(
        spark, customer, "t_customer_b", ["c_custkey"], 8, str(tmp_path / "c")
    )
    # force a non-broadcast join so the shuffle-elimination is observable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey).select(
            "o_orderkey", "c_name"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() == orders.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_customer_b")


def test_salted_count_matches_direct(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    direct = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    salted = {
        r["event_type"]: r["n"]
        for r in salted_count(events, ["event_type"], n_salts=8).collect()
    }
    assert salted == direct


def test_salted_agg_sum_and_max(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = salted_agg(
        events,
        ["event_type"],
        {
            "total": (
                F.sum(F.col("value").cast("decimal(18,6)")),
                F.sum("total").cast("decimal(18,6)"),
            ),
            "peak": (F.max("value"), F.max("peak")),
        },
        n_salts=8,
    )
    direct = events.groupBy("event_type").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("total"),
        F.max("value").alias("peak"),
    )
    a = {r["event_type"]: (r["total"], r["peak"]) for r in out.collect()}
    b = {r["event_type"]: (r["total"], r["peak"]) for r in direct.collect()}
    assert a == b
