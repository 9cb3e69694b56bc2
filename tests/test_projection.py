"""JL random-projection semantics: determinism, shape, distance
preservation (the JL lemma made testable), and declared recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from legislative_bills_database_spark.operators.projection import (
    projection_matrix,
    random_projection,
)

SF = "/root/testdata/sf0.001"


def test_matrix_deterministic():
    a = projection_matrix(64, 16, seed=7)
    b = projection_matrix(64, 16, seed=7)
    assert np.array_equal(a, b)
    assert a.shape == (64, 16)


def test_projection_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        F.col("vec_id") < 20
    )
    rows = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    got = {
        r.vec_id: np.array(r.projected)
        for r in random_projection(emb, in_dim=64, out_dim=16).collect()
    }
    w = projection_matrix(64, 16, seed=7)
    for vid, vec in rows.items():
        want = (vec @ w).astype(np.float32)
        assert np.allclose(got[vid], want, rtol=1e-5), vid


def test_distances_preserved_on_average(spark):
    """JL in expectation: the mean ratio of projected to original squared
    pairwise distance should sit near 1 (individual pairs vary)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        F.col("vec_id") < 60
    )
    orig = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    proj = {
        r.vec_id: np.array(r.projected, dtype=np.float64)
        for r in random_projection(emb, in_dim=64, out_dim=16).collect()
    }
    ids = sorted(orig)
    ratios = []
    for i in range(0, len(ids), 3):
        for j in range(i + 1, len(ids), 7):
            a, b = ids[i], ids[j]
            d_o = np.sum((orig[a] - orig[b]) ** 2)
            d_p = np.sum((proj[a] - proj[b]) ** 2)
            if d_o > 0:
                ratios.append(d_p / d_o)
    mean = float(np.mean(ratios))
    assert 0.7 < mean < 1.3, mean


def test_declared_distortion_row(spark):
    from legislative_bills_database_spark.plans import QUERIES

    row = QUERIES["q_projection_distortion"](spark, SF).collect()[0]
    assert row.method == "jl_64_to_16"
    assert row.n_pairs == 399  # vec_id 101..499 paired with id-101
    assert 0.8 < row.mean_ratio < 1.2, row.mean_ratio
    assert row.p_low > 0.0
