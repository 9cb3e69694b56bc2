"""Phase 115 pins: the DBSCAN density escape (VERDICT r13 #6) —
cap-unbound parity, dense-cell attach semantics, and the armed
predicted-candidate refusal."""

from __future__ import annotations

import pytest

SF01 = "/root/testdata/sf0.01"


def _pts_df(spark, coords):
    """embeddings-style fixture dir rows from (vec_id, x_milli, y_milli)."""
    return spark.createDataFrame(
        [(i, [x / 1000.0, y / 1000.0, 0.0]) for i, x, y in coords],
        "vec_id long, embedding array<double>",
    )


class TestDbscanCapped:
    @pytest.mark.slow  # r15 fast-lane: measured-heavy (see pytest.ini)
    def test_capped_equals_exact_when_cap_unbound(self, spark):
        """sf0.01 max cell occupancy is far below the cap, so the
        capped plan must BE q_dbscan, row for row."""
        from legislative_bills_database_spark.plans import QUERIES

        exact = {
            r.vec_id: (r.role, r.cluster)
            for r in QUERIES["q_dbscan"](spark, SF01).collect()
        }
        capped = {
            r.vec_id: (r.role, r.cluster)
            for r in QUERIES["q_dbscan_capped"](spark, SF01).collect()
        }
        assert exact == capped
        rec = QUERIES["q_dbscan_recall"](spark, SF01).collect()[0]
        assert rec.recall == 1.0 and rec.n_agree == rec.n_points

    def test_dense_cell_attach_semantics(self, spark, tmp_path):
        """50 co-located points in one cell: 32 kept (all core — 31
        neighbors ≥ minPts), 18 dropped points attach as border with
        the kept component's label; every input point keeps a row."""
        from legislative_bills_database_spark.plans import QUERIES

        d = tmp_path / "dense"
        _pts_df(
            spark, [(i, 5, 5) for i in range(50)]
        ).write.parquet(f"{d}/embeddings.parquet")
        rows = QUERIES["q_dbscan_capped"](spark, str(d)).collect()
        assert len(rows) == 50
        roles = {r.role for r in rows}
        assert roles == {"core", "border"}
        n_core = sum(r.role == "core" for r in rows)
        assert n_core == 32  # the cell cap
        labels = {r.cluster for r in rows}
        assert len(labels) == 1  # one density-connected component

    def test_exact_refusal_fires_on_degenerate_density(self, spark):
        """grid_dbscan with a hostile candidate budget must raise,
        naming the capped escape — the basket.refuse_excess_fanout
        discipline for the density cliff."""
        from pyspark.sql import functions as F

        from legislative_bills_database_spark.operators.density import (
            grid_dbscan,
        )

        pts = spark.range(200).select(
            F.col("id").alias("vec_id"),
            F.lit(5).cast("long").alias("x"),
            F.lit(5).cast("long").alias("y"),
        )
        with pytest.raises(ValueError, match="q_dbscan_capped"):
            grid_dbscan(pts, 20, 400, 4, 1 << 20, max_candidates=10_000)

    def test_fixture_density_far_below_cliff(self, spark):
        """The armed q_dbscan interlock must NOT bind on the fixtures:
        predicted candidates at sf0.01 stay orders of magnitude under
        _DB_MAX_CAND."""
        from pyspark.sql import functions as F

        from legislative_bills_database_spark.io import load_table
        from legislative_bills_database_spark.operators.density import (
            predicted_candidates,
            with_cells,
        )
        from legislative_bills_database_spark.plans.roundthirteen_queries import (
            _DB_EPS,
            _DB_MAX_CAND,
            _DB_OFF,
        )

        emb = load_table(spark, SF01, "embeddings")
        pts = emb.select(
            "vec_id",
            F.round(F.element_at("embedding", 1).cast("double") * 1000)
            .cast("long")
            .alias("x"),
            F.round(F.element_at("embedding", 2).cast("double") * 1000)
            .cast("long")
            .alias("y"),
        )
        pred = predicted_candidates(with_cells(pts, _DB_EPS, _DB_OFF))
        assert 0 < pred < _DB_MAX_CAND / 1000
