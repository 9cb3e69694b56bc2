"""Phase-38 (hash-certified clustering) semantics + plan pins."""

from __future__ import annotations

from legislative_bills_database_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_kmeans_exact_structure(spark):
    rows = QUERIES["q_kmeans_exact"](spark, SF_DIR).collect()
    # 4 clusters x 64 dims, every cluster non-empty, sizes partition n
    assert len(rows) == 4 * 64
    sizes = {r["cid"]: r["n_members"] for r in rows}
    assert set(sizes) == {0, 1, 2, 3}
    assert all(s > 0 for s in sizes.values())
    assert sum(sizes.values()) == 500  # every vector assigned exactly once
    # centroids are milli-unit fixed-point: same magnitude as elements
    assert all(abs(r["c_fp"]) < 10_000 for r in rows)


def test_kmeans_exact_improves_over_seeds(spark):
    """Lloyd's must not leave the seed assignment unchanged: the seed
    vectors (vec_id 0..3) themselves may move clusters, and cluster
    sizes must differ from the trivial all-in-one split."""
    rows = QUERIES["q_kmeans_exact"](spark, SF_DIR).collect()
    sizes = sorted({(r["cid"], r["n_members"]) for r in rows})
    assert len({n for _, n in sizes}) > 1 or all(
        n not in (0, 500) for _, n in sizes
    )


def test_dbscan_roles_mixture_and_consistency(spark):
    rows = QUERIES["q_dbscan_labels"](spark, SF_DIR).collect()
    assert len(rows) == 300
    roles = {r["vec_id"]: r for r in rows}
    by_role = {}
    for r in rows:
        by_role.setdefault(r["role"], []).append(r)
        if r["role"] == "core":
            assert r["n_eps"] >= 3
        elif r["role"] == "border":
            # textbook DBSCAN: border = non-core with >=1 CORE neighbor
            assert 1 <= r["n_eps"] < 3
        else:
            # noise may still have non-core neighbors (a non-core point
            # whose every eps-neighbor is itself non-core is noise)
            assert r["n_eps"] < 3
    # the tuned epsilon yields all three roles
    assert set(by_role) == {"core", "border", "noise"}
    # the textbook/relaxed distinction is actually exercised: at least
    # one noise point has a (non-core) neighbor, which the old
    # "any-neighbor => border" relaxation would have mislabeled
    assert any(r["n_eps"] > 0 for r in by_role["noise"])
    assert len(roles) == 300


def test_kmeans_broadcasts_centroids(spark):
    """Each sweep joins the exploded frame against a BROADCAST k*d
    centroid table — a shuffled centroid join would be a scale bug."""
    plan = _plan(spark, "q_kmeans_exact")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_dbscan_no_python_no_cartesian(spark):
    plan = _plan(spark, "q_dbscan_labels")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
