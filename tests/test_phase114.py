"""Phase 114 pins: q_sax_motifs — hand-computed SAX pipeline on a
designed series, plus the affine-invariance property the plan's
"z-normalization is a no-op under equi-depth breakpoints" argument
rests on."""

from __future__ import annotations

import pytest

import datetime as dt


def _write_fixture(spark, path, scale=1.0, shift=0.0):
    """One nation, one customer, 112 consecutive order days: day d in
    PAA window k (= d // 7) has totalprice k+1, so window sums are the
    strictly increasing 1..16 ramp (×7) and every SAX stage is
    hand-checkable. scale/shift apply a positive affine map for the
    invariance pin."""
    days = []
    for d in range(112):
        price = float(d // 7 + 1) * scale + shift
        days.append(
            (d + 1, 1, dt.date(2024, 1, 1) + dt.timedelta(days=d), price)
        )
    spark.createDataFrame(
        days,
        "o_orderkey long, o_custkey long, o_orderdate date,"
        " o_totalprice double",
    ).write.mode("overwrite").parquet(f"{path}/orders.parquet")
    spark.createDataFrame(
        [(1, 0)], "c_custkey long, c_nationkey int"
    ).write.mode("overwrite").parquet(f"{path}/customer.parquet")
    spark.createDataFrame(
        [(0, "NATION_A")], "n_nationkey int, n_name string"
    ).write.mode("overwrite").parquet(f"{path}/nation.parquet")


class TestSaxMotifs:
    def test_hand_computed_ramp(self, spark, tmp_path):
        from legislative_bills_database_spark.plans import QUERIES

        d = tmp_path / "sax_ramp"
        _write_fixture(spark, str(d))
        rows = QUERIES["q_sax_motifs"](spark, str(d)).collect()
        assert len(rows) == 1
        r = rows[0]
        # 16 windows, sums 700·(1..16); quartile breakpoints at
        # (15k/4): 4·bp1 = 4·(700·4) + 3·700 = 13300 → 'a' covers
        # windows 1-4, likewise b/c/d each cover 4 → symbol string
        # aaaabbbbccccdddd → aaa,bbb,ccc,ddd each twice; word-asc
        # tie-break picks 'aaa'
        assert r.n_windows == 16
        assert r.motif == "aaa"
        assert r.n_occur == 2
        assert r.n_name == "NATION_A"

    @pytest.mark.slow  # r15 fast-lane: measured-heavy (see pytest.ini)
    def test_symbolization_affine_invariant(self, spark, tmp_path):
        """Equi-depth breakpoints are equivariant under a positive
        affine map of the series (the docstring's z-normalization
        no-op argument): scaling and shifting every price must leave
        the motif output IDENTICAL."""
        from legislative_bills_database_spark.plans import QUERIES

        base = tmp_path / "sax_base"
        aff = tmp_path / "sax_affine"
        _write_fixture(spark, str(base))
        _write_fixture(spark, str(aff), scale=3.0, shift=1000.0)
        got_base = sorted(
            QUERIES["q_sax_motifs"](spark, str(base)).collect()
        )
        got_aff = sorted(
            QUERIES["q_sax_motifs"](spark, str(aff)).collect()
        )
        assert got_base == got_aff
