"""Round-10 pins.

Phase 58: q_weighted_jaccard_approx quality + bound pins (VERDICT r9
item #4 — the implemented escape hatch for the suite's worst measured
skew cell, 5.83×). The recall floor is the contract the capped twin
exists to certify: a change that silently degrades the approximation
(cap selection, md5 sampling, within-sample totals) must fail HERE, not
just shift a driver hash. Floors sit below the measured deterministic
values (sf0.001: 1.0 — the adaptive cap doesn't bind; sf0.01: 0.84 at
the p95 cap) to tolerate fixture regeneration, not algorithm drift.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from legislative_bills_database_spark.plans import QUERIES
from legislative_bills_database_spark.plans.roundseven_queries import (
    _adaptive_cap,
)
from legislative_bills_database_spark.plans.roundten_queries import (
    _w_capped,
    _w_edges,
)

SF1 = "/root/testdata/sf0.001"
SF2 = "/root/testdata/sf0.01"


def test_weighted_jaccard_recall_floor(spark):
    r1 = QUERIES["q_weighted_jaccard_recall"](spark, SF1).collect()[0]
    assert r1["recall"] >= 0.95
    r2 = QUERIES["q_weighted_jaccard_recall"](spark, SF2).collect()[0]
    assert r2["recall"] >= 0.78


def test_weighted_capped_edges_bound_and_qty_preserved(spark):
    """Every customer's capped weighted degree is ≤ cap, and surviving
    edges keep their EXACT quantity (the cap samples edges, it never
    rescales weights — within-sample estimator, not Horvitz-Thompson)."""
    w = _w_edges(spark, SF2)
    cap = _adaptive_cap(w)
    capped = _w_capped(spark, SF2)
    over = (
        capped.groupBy("cust")
        .agg(F.count("*").alias("d"))
        .filter(F.col("d") > cap)
        .count()
    )
    assert over == 0
    # capped ⊆ exact with identical qty: anti-join on all three cols empty
    assert capped.join(w, ["cust", "supp", "qty"], "left_anti").count() == 0


def test_global_running_sum_decimal_offset_widened(spark):
    """ADVICE r9 #2: the driver-accumulated prefix offset must ride a
    DecimalType(38, scale) column — a grand total exceeding the
    per-partition sum's precision+10 would otherwise overflow to NULL
    and silently null downstream running sums. Structural pin (the
    overflow itself needs ~1e10 rows): decimal input → cum is a
    38-precision decimal, values exact, no NULLs."""
    from pyspark.sql.types import DecimalType

    from legislative_bills_database_spark.operators.ordering import (
        global_running_sum,
    )

    df = spark.range(0, 5_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97 + 1).cast("decimal(5,1)").alias("v"),
    )
    out = global_running_sum(df, [F.asc("k")], "v", "cum")
    assert isinstance(out.schema["cum"].dataType, DecimalType)
    assert out.schema["cum"].dataType.precision == 38
    rows = sorted(out.collect(), key=lambda r: r.k)
    acc = 0
    for r in rows:
        acc += int(r.k) % 97 + 1
        assert r.cum is not None and float(r.cum) == float(acc)


def test_weighted_approx_agrees_exact_when_cap_unbinding(spark):
    """At sf0.001 the adaptive cap exceeds every degree, so the capped
    top-50 must equal q_weighted_jaccard's top-50 pair set exactly."""
    exact = {
        (r.s1, r.s2)
        for r in QUERIES["q_weighted_jaccard"](spark, SF1).collect()
    }
    approx = {
        (r.s1, r.s2)
        for r in QUERIES["q_weighted_jaccard_approx"](spark, SF1).collect()
    }
    assert exact == approx
