"""Phase 113 pins: q_er_clusters — clusters must BE the transitive
closure of the fine-blocked Fellegi-Sunter match pairs, with the
survivorship pick and census exact (VERDICT r13 "Next round" #2)."""

from __future__ import annotations

SF01 = "/root/testdata/sf0.01"


def _union_find(pairs):
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    nodes = set()
    for a, b in pairs:
        nodes.update((a, b))
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in nodes}


class TestErClusters:
    def test_clusters_are_transitive_closure_of_matches(self, spark):
        from legislative_bills_database_spark.io import load_table
        from legislative_bills_database_spark.plans import QUERIES
        from legislative_bills_database_spark.plans.roundfourteen_queries import (
            _fs_match_pairs,
        )

        cust = load_table(spark, SF01, "customer")
        pairs = [
            (r.id_a, r.id_b) for r in _fs_match_pairs(cust).collect()
        ]
        assert pairs, "fixture should produce at least one match pair"
        labels = _union_find(pairs)
        # independent union-find replay -> expected clusters
        expected: dict = {}
        for node, comp in labels.items():
            expected.setdefault(comp, set()).add(node)

        rows = QUERIES["q_er_clusters"](spark, SF01).collect()
        got_ids = {r.cluster_id for r in rows}
        assert got_ids == set(expected)
        # census: per-cluster member count matches the closure
        for r in rows:
            assert r.n_members == len(expected[r.cluster_id])
            assert r.n_members >= 2  # matched nodes only; no singletons

    def test_survivorship_pick_and_census_exact(self, spark):
        from legislative_bills_database_spark.io import load_table
        from legislative_bills_database_spark.plans import QUERIES
        from legislative_bills_database_spark.plans.roundfourteen_queries import (
            _fs_match_pairs,
        )

        cust = load_table(spark, SF01, "customer")
        bal = {
            r.c_custkey: r.c_acctbal
            for r in cust.select("c_custkey", "c_acctbal").collect()
        }
        pairs = [
            (r.id_a, r.id_b) for r in _fs_match_pairs(cust).collect()
        ]
        labels = _union_find(pairs)
        members: dict = {}
        for node, comp in labels.items():
            members.setdefault(comp, []).append(node)

        for r in QUERIES["q_er_clusters"](spark, SF01).collect():
            ms = members[r.cluster_id]
            # golden record: max acctbal, custkey ascending tiebreak
            canon = min(ms, key=lambda n: (-bal[n], n))
            assert r.canon_custkey == canon
            assert r.total_cents == sum(round(bal[n] * 100) for n in ms)

    def test_size_histogram_matches_closure(self, spark):
        from collections import Counter

        from legislative_bills_database_spark.io import load_table
        from legislative_bills_database_spark.plans import QUERIES
        from legislative_bills_database_spark.plans.roundfourteen_queries import (
            _fs_match_pairs,
        )

        cust = load_table(spark, SF01, "customer")
        pairs = [
            (r.id_a, r.id_b) for r in _fs_match_pairs(cust).collect()
        ]
        labels = _union_find(pairs)
        expected = Counter(
            Counter(labels.values()).values()
        )  # size -> n_clusters
        rows = QUERIES["q_er_clusters"](spark, SF01).collect()
        got = Counter(r.n_members for r in rows)
        assert got == expected


def test_er_pair_generation_refuses_past_cliff(spark, monkeypatch):
    """The ER candidate generator is interlocked (r14 BENCH_SF1: the
    composition measured 30.9x at sf1): past the predicted-pair budget
    it must refuse, naming the LSH-blocked route — never run the
    quadratic silently."""
    import pytest

    from legislative_bills_database_spark.io import load_table
    from legislative_bills_database_spark.plans import (
        roundfourteen_queries as r14,
    )
    from legislative_bills_database_spark.operators import basket

    cust = load_table(spark, SF01, "customer")
    # the helper from-imports the constant at CALL time, so patching
    # the module attribute is seen by the next invocation
    monkeypatch.setattr(basket, "MAX_EXACT_PAIRS", 10)
    with pytest.raises(ValueError, match="LSH-blocked"):
        r14._fs_match_pairs(cust)
