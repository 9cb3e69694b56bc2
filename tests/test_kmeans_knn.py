"""Distributed Lloyd k-means vs an independent numpy reference, and
k-NN accuracy known-answer checks."""

from __future__ import annotations

import pytest

import numpy as np
from pyspark.sql import functions as F

from legislative_bills_database_spark.io import load_table
from legislative_bills_database_spark.operators.kmeans import (
    kmeans_summary,
    lloyd_kmeans,
)
from legislative_bills_database_spark.operators.similarity import (
    knn_label_accuracy,
)

SF_DIR = "/root/testdata/sf0.001"


def _numpy_lloyd(X, init, iters):
    C = init.copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        new = np.array(
            [X[a == j].mean(axis=0) if (a == j).any() else C[j] for j in range(len(C))]
        )
        if np.allclose(new, C, atol=0):
            break
        C = new
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1), d.min(axis=1)


@pytest.mark.slow  # r15 fast-lane: measured-heavy (see pytest.ini)
def test_lloyd_matches_numpy_reference(spark):
    emb = load_table(spark, SF_DIR, "embeddings").limit(200)
    assigned, cents, iters = lloyd_kmeans(emb, k=4, max_iter=5, seed=42)
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)

    # replicate the deterministic init: k smallest xxhash64(id, seed)
    h = {
        r["vec_id"]: r["h"]
        for r in emb.select(
            "vec_id", F.xxhash64(F.col("vec_id"), F.lit(42)).alias("h")
        ).collect()
    }
    order = sorted(range(len(ids)), key=lambda i: h[ids[i]])
    init = X[order[:4]]

    ref_assign, ref_sqd = _numpy_lloyd(X, init, iters)
    got = {r["vec_id"]: (r["cluster"], r["sqdist"]) for r in assigned.collect()}
    agree = sum(got[ids[i]][0] == ref_assign[i] for i in range(len(ids)))
    # exact-decimal vs float64 means can flip boundary rows only
    assert agree >= len(ids) - 2
    sq_err = max(
        abs(got[ids[i]][1] - ref_sqd[i]) for i in range(len(ids))
    )
    assert sq_err < 1e-6


@pytest.mark.slow  # r15 fast-lane: measured-heavy (see pytest.ini)
def test_kmeans_summary_deterministic_and_total(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    a = kmeans_summary(emb, k=4, max_iter=4).collect()
    b = kmeans_summary(emb, k=4, max_iter=4).collect()
    assert a == b
    assert sum(r["n_rows"] for r in a) == emb.count()
    assert all(r["inertia"] > 0 for r in a)


def test_knn_accuracy_separable_clusters(spark):
    # two well-separated clusters: accuracy must be 1.0
    rows = []
    for i in range(40):
        base = [10.0, 10.0] if i % 2 == 0 else [-10.0, -10.0]
        rows.append(
            (i, [base[0] + (i % 5) * 0.1, base[1] - (i % 3) * 0.1], i % 2)
        )
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = knn_label_accuracy(emb, k=3, holdout_mod=4).collect()[0]
    assert out["n_queries"] == 10
    assert out["accuracy"] == 1.0


def test_knn_accuracy_counts_consistent(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    out = knn_label_accuracy(emb, k=5, holdout_mod=10).collect()[0]
    assert out["n_queries"] == emb.filter(F.col("vec_id") % 10 == 0).count()
    assert 0 <= out["n_correct"] <= out["n_queries"]
    assert abs(out["accuracy"] - out["n_correct"] / out["n_queries"]) < 1e-12
