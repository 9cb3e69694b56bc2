"""Unit tests: PassJoin fuzzy join (completeness vs brute force, plan
shape) and RAG sliding-window chunking (boundary arithmetic)."""

from __future__ import annotations

import functools
import random

import pytest
from pyspark.sql import functions as F

from legislative_bills_database_spark.operators.fuzzy import fuzzy_join
from legislative_bills_database_spark.operators.packing import sliding_chunks


def _lev(a: str, b: str) -> int:
    @functools.lru_cache(maxsize=None)
    def d(i, j):
        if i == 0:
            return j
        if j == 0:
            return i
        return min(
            d(i - 1, j) + 1,
            d(i, j - 1) + 1,
            d(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
        )

    return d(len(a), len(b))


def test_fuzzy_join_complete_vs_bruteforce(spark):
    """Pigeonhole blocking must miss NOTHING — including 1-2 char
    strings routed through the short bucket."""
    rng = random.Random(11)
    strs = [
        "".join(rng.choice("abc") for _ in range(rng.randint(1, 10)))
        for _ in range(80)
    ]
    left = spark.createDataFrame(
        list(enumerate(strs)), "id long, s string"
    )
    rstrs = strs[40:] + ["a", "ab", "abcabcabc"]
    right = spark.createDataFrame(
        [(500 + i, s) for i, s in enumerate(rstrs)], "id long, s string"
    )
    got = {
        (r["lid"], r["rid"], r["dist"])
        for r in fuzzy_join(
            left, right, "id", "s", "id", "s", max_dist=2
        ).collect()
    }
    exp = {
        (i, 500 + j, _lev(s, t))
        for i, s in enumerate(strs)
        for j, t in enumerate(rstrs)
        if _lev(s, t) <= 2
    }
    assert got == exp


def test_fuzzy_join_no_cross_join_on_long_strings(spark):
    left = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "qrstuvwxyz")], "id long, s string"
    )
    df = fuzzy_join(left, left, "id", "s", "id", "s", max_dist=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the segmented path must be an equi-join; only the bounded short
    # bucket may cross-join, and it is empty here
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan


def test_sliding_chunks_boundaries(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], "doc_id long, text string"
    )
    out = sliding_chunks(docs, chunk_tokens=4, overlap=2).collect()
    # stride 2, n=10: starts 0,2,4,6,8 → ceil((10-2)/2)=4 chunks? starts
    # 1,3,5,7 (1-based) → last chunk covers tokens 7..10
    sizes = [r["n_tokens"] for r in sorted(out, key=lambda r: r["chunk_idx"])]
    assert sizes == [4, 4, 4, 4]
    assert [r["chunk_idx"] for r in sorted(out, key=lambda r: r["chunk_idx"])] == [
        0,
        1,
        2,
        3,
    ]


def test_sliding_chunks_short_doc_single_chunk(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    out = sliding_chunks(docs, chunk_tokens=8, overlap=2).collect()
    assert len(out) == 1 and out[0]["n_tokens"] == 2


def test_sliding_chunks_overlap_validation(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        sliding_chunks(docs, chunk_tokens=4, overlap=4)


def test_sliding_chunks_zero_shuffle(spark):
    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plan = (
        sliding_chunks(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" not in plan
