"""Unit tests for operator edge semantics (SURVEY.md §5 item 2).

Covers the round-1 verdict items: fallback_join must not fan out on a
duplicate-key dimension; strict pivot must fail loudly on out-of-range
pivot values; the all-pairs embedding baseline must refuse unbounded
input; banded LSH recall is measured (not just asserted to exist).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from legislative_bills_database_spark.operators.aggregates import pivot_count
from legislative_bills_database_spark.operators.dedup import (
    embedding_neardup_pairs,
    simhash,
)
from legislative_bills_database_spark.io import load_table
from legislative_bills_database_spark.operators.joins import fallback_join
from legislative_bills_database_spark.operators.similarity import lsh_recall

SF_DIR = "/root/testdata/sf0.001"


def test_fallback_join_duplicate_dim_keys_no_fanout(spark):
    """A dimension with duplicate keys is a membership test, not a fan-out
    (legislator_bill_counts_run.R:114-122 semantics)."""
    facts = spark.createDataFrame(
        [(1, 10, 20), (2, None, 10), (3, 99, 98)],
        "row_id int, primary_key int, fallback_key int",
    )
    dim = spark.createDataFrame(
        [(10,), (10,), (10,), (20,)], "dim_key int"
    )  # key 10 duplicated 3x
    out = fallback_join(facts, dim, "primary_key", "fallback_key", "dim_key")
    rows = {r["row_id"]: r["matched_key"] for r in out.collect()}
    # row 1: primary 10 matches (once, despite 3 copies); row 2: fallback 10;
    # row 3: neither → dropped
    assert rows == {1: 10, 2: 10}
    assert out.count() == 2


def test_fallback_join_priority(spark):
    """Primary wins over fallback when both match."""
    facts = spark.createDataFrame(
        [(1, 20, 10)], "row_id int, primary_key int, fallback_key int"
    )
    dim = spark.createDataFrame([(10,), (20,)], "dim_key int")
    out = fallback_join(facts, dim, "primary_key", "fallback_key", "dim_key")
    assert out.collect()[0]["matched_key"] == 20


def test_strict_pivot_raises_on_out_of_range(spark):
    df = spark.createDataFrame(
        [("a", 1995), ("a", 2099)], "g string, y int"
    )
    wide = pivot_count(df, "g", "y", [1995, 1996])
    with pytest.raises(Exception, match="outside declared"):
        wide.collect()


def test_strict_pivot_passes_in_range(spark):
    df = spark.createDataFrame(
        [("a", 1995), ("a", 1995), ("b", 1996)], "g string, y int"
    )
    rows = {
        r["g"]: (r["1995"], r["1996"])
        for r in pivot_count(df, "g", "y", [1995, 1996]).collect()
    }
    assert rows == {"a": (2, 0), "b": (0, 1)}


def test_embedding_neardup_guard(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    with pytest.raises(ValueError, match="all-pairs"):
        embedding_neardup_pairs(emb, "vec_id", "embedding", max_rows=10).count()


def test_simhash_single_shuffle_no_bit_explode(spark):
    """SimHash values are stable and the plan has exactly one aggregate
    shuffle (no 64× bit-explode before the groupBy)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    out = simhash(docs, "doc_id", "text")
    assert out.count() == 50
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one Exchange pair for the single groupBy (AQE may show reused stages)
    assert plan.count("Exchange hashpartitioning(doc_id") <= 1


def test_simhash_pairs_banded_hamming(spark):
    """Identical docs pair at hamming 0; unrelated docs don't pair; the
    pigeonhole banding finds every pair an all-pairs scan would at the
    same threshold."""
    from legislative_bills_database_spark.operators.dedup import (
        simhash,
        simhash_pairs,
    )
    import pytest as _pytest

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "completely unrelated text about database engines and spark"),
            (4, "another very different document concerning music theory"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert all(p == (1, 2) for p in pairs)  # no spurious pairs at <=3
    # banding finds exactly the brute-force pairs at the same threshold
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs, "doc_id", "text").collect()}
    brute = {
        (a, b)
        for a in sigs
        for b in sigs
        if a < b and bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1") <= 3
    }
    assert set(pairs) == brute
    with _pytest.raises(ValueError, match="max_hamming < bands"):
        simhash_pairs(docs, "doc_id", "text", max_hamming=4, bands=4)


def test_connected_components_and_corpus_dedup(spark):
    """Min-label propagation: chains collapse to the smallest id; isolated
    nodes keep their own label; corpus dedup keeps one doc per cluster."""
    from legislative_bills_database_spark.operators.dedup import (
        connected_components,
        dedup_by_near_duplicates,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 4, 5, 9)], "doc_id long, text string"
    )
    # chain 1-2-3, pair 4-5, isolated 9
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    comps = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs, docs.select("doc_id")).collect()
    }
    assert comps == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 9: 9}
    kept = {
        r["doc_id"] for r in dedup_by_near_duplicates(docs, pairs).collect()
    }
    assert kept == {1, 4, 9}


def test_ngram_jaccard_df_cap_drops_hot_shingles(spark):
    """max_doc_freq removes join-side hot shingles: candidate pairs that
    share ONLY a hot shingle disappear; surviving pairs under-count by
    exactly the dropped shingles (documented semantics)."""
    from legislative_bills_database_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over dog"),
            (2, "the quick brown fox jumps over dog"),
            (3, "the quick brown cat sleeps on mat"),
            (4, "completely different words here entirely now"),
        ],
        "doc_id long, text string",
    )
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text").collect()
    }
    assert exact == {(1, 2): 1.0, (1, 3): 0.1111, (2, 3): 0.1111}
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", max_doc_freq=2
        ).collect()
    }
    # 'the quick brown' (df=3) dropped → 1–3/2–3 vanish; 1–2 under-counts
    assert set(capped) == {(1, 2)}
    assert capped[(1, 2)] < 1.0


def test_lsh_recall_measured(spark):
    """Banded multi-table LSH recall vs the exact baseline on sf0.001.

    The fixture's planted near-dup pairs sit at cosine ≈ 0.4 (there are
    ZERO pairs above 0.5, so a 0.8-threshold check passes vacuously —
    round-2 bug). At this angle the per-table collision probability
    (1 − θ/π)^n_planes demands the few-planes/many-tables operating
    point: 4×16 must recover ≥90% of exact pairs. Printed for CI logs.
    """
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(F.col("vec_id") < 300)
    )
    recall = lsh_recall(
        emb, "vec_id", "embedding", dim=64,
        min_cosine=0.4, n_planes=4, n_tables=16, bucket_cap=1000,
    )
    print(f"lsh_recall@cos0.4 = {recall:.3f}")
    assert recall >= 0.9


def test_connected_components_long_chain_pointer_jumping(spark):
    """A 50-node path graph has diameter 49: plain min-label propagation
    needs ~49 rounds, pointer jumping needs ~log2(49) ≈ 6. max_iter=10
    converging proves the shortcut works (and localCheckpoint keeps the
    plan tree bounded while it does)."""
    from legislative_bills_database_spark.operators.dedup import (
        connected_components,
    )

    n = 50
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    comps = {
        r["doc_id"]: r["component"]
        for r in connected_components(
            pairs, ids, max_iter=10, small_graph_threshold=0
        ).collect()
    }
    assert comps == {i: 0 for i in range(n)}


def test_connected_components_unconverged_raises(spark):
    """Hitting max_iter without convergence must raise — silently
    returning split components would keep duplicate 'representatives'
    downstream (round-2 advisory)."""
    import pytest as _pytest

    from legislative_bills_database_spark.operators.dedup import (
        connected_components,
    )

    ids = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(39)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, ids, max_iter=1, small_graph_threshold=0)


def test_strict_pivot_null_value_dedicated_error(spark):
    """NULL pivot values get their own error message (isin yields NULL for
    NULL input; without the explicit branch the message itself concats to
    NULL — round-2 advisory)."""
    import pytest as _pytest

    rows = spark.createDataFrame(
        [(1, 2020), (2, None)], "k int, yr int"
    )
    with _pytest.raises(Exception, match="is NULL"):
        pivot_count(rows, "k", "yr", [2020, 2021]).collect()


def test_declared_ann_recall_values(spark):
    """q_ann_recall (driver-visible ANN quality) must report high recall
    for both approximate paths at sf0.001 — a drop here is an ANN quality
    regression, caught locally before the driver sees it."""
    from legislative_bills_database_spark.plans import QUERIES

    rows = {
        r["method"]: r.asDict()
        for r in QUERIES["q_ann_recall"](spark, SF_DIR).collect()
    }
    assert set(rows) == {"lsh_pairs", "ivf_topk"}
    assert rows["lsh_pairs"]["n_exact"] > 0, "vacuous recall check"
    assert rows["lsh_pairs"]["recall"] >= 0.9
    assert rows["ivf_topk"]["recall"] >= 0.7


def test_declared_neardup_precision(spark):
    """q_neardup_precision cross-validates MinHash-LSH candidates against
    exact n-gram Jaccard: most est_jaccard≥0.3 candidates must be true
    ≥0.2 Jaccard pairs."""
    from legislative_bills_database_spark.plans import QUERIES

    row = QUERIES["q_neardup_precision"](spark, SF_DIR).collect()[0]
    assert row["n_candidates"] > 0, "vacuous precision check"
    assert row["precision"] >= 0.9


def test_incremental_lsh_pairs_match_from_scratch_run(spark):
    """Index-reuse incremental near-dup must equal the from-scratch LSH
    run restricted to pairs touching the batch — even when batch ids
    interleave with corpus ids."""
    from legislative_bills_database_spark.operators.dedup import (
        incremental_lsh_pairs,
        minhash_band_index,
        minhash_lsh_pairs,
    )

    docs = load_table(spark, SF_DIR, "documents")
    # interleaved split: corpus = even ids, batch = odd ids
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)

    full = minhash_lsh_pairs(
        docs, "doc_id", "text", min_est_jaccard=0.3
    ).collect()
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    expected = {
        (r["id_a"], r["id_b"], r["est_jaccard"])
        for r in full
        if r["id_a"] in batch_ids or r["id_b"] in batch_ids
    }

    corpus_index = minhash_band_index(corpus, "doc_id", "text")
    got = {
        (r["id_a"], r["id_b"], r["est_jaccard"])
        for r in incremental_lsh_pairs(
            corpus_index, batch, "doc_id", "text", min_est_jaccard=0.3
        ).collect()
    }
    assert got == expected
    assert len(expected) > 0  # the fixture must actually exercise pairs
    # and no corpus-vs-corpus pair leaks through
    assert all(a in batch_ids or b in batch_ids for a, b, _ in got)


def test_merge_rollup_equals_full_recompute(spark):
    from legislative_bills_database_spark.operators.aggregates import (
        merge_rollup,
    )

    events = load_table(spark, SF_DIR, "events")

    def partial(df):
        return df.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("s"),
        )

    half_a = partial(events.filter(F.col("event_id") % 2 == 0))
    half_b = partial(events.filter(F.col("event_id") % 2 == 1))
    merged = merge_rollup(
        half_a, half_b, ["event_type"], {"n": "sum", "s": "sum"}
    )
    full = partial(events)
    got = {
        r["event_type"]: (r["n"], r["s"]) for r in merged.collect()
    }
    want = {r["event_type"]: (r["n"], r["s"]) for r in full.collect()}
    assert got == want


def test_connected_components_fast_path_equals_loop(spark):
    """The driver union-find fast path and the distributed loop must
    produce IDENTICAL labels (min node id per component), including
    isolated nodes keeping their own id."""
    import random

    from legislative_bills_database_spark.operators.dedup import (
        connected_components,
    )

    rng = random.Random(11)
    n = 120
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
    edges = [(a, b) for a, b in edges if a != b]
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = sorted(map(tuple, connected_components(pairs, ids).collect()))
    loop = sorted(
        map(
            tuple,
            connected_components(
                pairs, ids, small_graph_threshold=0
            ).collect(),
        )
    )
    assert fast == loop


def test_connected_components_id_col_node_both_paths(spark):
    """Regression (VERDICT r5 #2): ``id_col="node"`` used to collide
    with an internal frame column in the union-find fast path's label
    join. Internal columns are now ``__cc_``-prefixed, so caller
    columns named ``node`` (or ``component``) work on BOTH paths with
    no call-site rename."""
    from legislative_bills_database_spark.operators.dedup import (
        connected_components,
    )

    ids = spark.createDataFrame([(i,) for i in range(8)], "node long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    want = {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4, 6: 6, 7: 7}
    fast = {
        r["node"]: r["component"]
        for r in connected_components(pairs, ids, id_col="node").collect()
    }
    assert fast == want
    loop = {
        r["node"]: r["component"]
        for r in connected_components(
            pairs, ids, id_col="node", small_graph_threshold=0
        ).collect()
    }
    assert loop == want
