"""Phase-62 pins: block-capped edit-distance join (the escape hatch for
the 68.9× hot-block cliff measured in BENCH_TEXTSKEW.json).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from legislative_bills_database_spark.operators.basket import (
    degree_capped_edges,
)
from legislative_bills_database_spark.plans import QUERIES
from legislative_bills_database_spark.plans.roundseven_queries import (
    _adaptive_cap,
)
from legislative_bills_database_spark.plans.roundten_queries import (
    _ed_base,
    _ed_capped,
)

SF1 = "/root/testdata/sf0.001"
SF2 = "/root/testdata/sf0.01"


def test_edit_distance_recall_floor(spark):
    r1 = QUERIES["q_edit_distance_recall"](spark, SF1).collect()[0]
    assert r1["recall"] >= 0.9
    r2 = QUERIES["q_edit_distance_recall"](spark, SF2).collect()[0]
    assert r2["recall"] >= 0.9


def test_block_cap_bounds_every_block(spark):
    pb = _ed_base(spark, SF2)
    cap = _adaptive_cap(pb.select(F.col("blk").alias("cust")))
    capped = _ed_capped(spark, SF2)
    over = (
        capped.groupBy("blk")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > cap)
        .count()
    )
    assert over == 0
    # capped ⊆ base with name and block intact
    assert capped.join(pb, ["k", "nm", "blk"], "left_anti").count() == 0


def test_block_cap_kills_hot_block_fanout(spark):
    """Plant the BENCH_TEXTSKEW hot block (20% of parts in one (brand,
    size) cell) and verify the cap bounds its pair fan-out to cap²/2
    while leaving cold blocks untouched."""
    pb = _ed_base(spark, SF2)
    hot = pb.select(
        "k",
        "nm",
        F.when(F.col("k") % 10 < 2, F.lit("HOT|0"))
        .otherwise(F.col("blk"))
        .alias("blk"),
    )
    n_hot = hot.filter(F.col("blk") == "HOT|0").count()
    assert n_hot >= 100  # the planted block is genuinely hot
    cap = 30
    capped = degree_capped_edges(hot, "blk", "k", cap)
    hot_kept = capped.filter(F.col("blk") == "HOT|0").count()
    assert hot_kept == cap  # d²/2 → cap²/2 on the hot key
    # cold blocks (size ≤ cap) survive completely
    cold_before = hot.filter(F.col("blk") != "HOT|0").count()
    cold_after = capped.filter(F.col("blk") != "HOT|0").count()
    assert cold_after == cold_before
