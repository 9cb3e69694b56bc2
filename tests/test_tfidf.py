"""Unit tests for TF-IDF top-terms and bigram-PMI collocation mining.

Known-answer checks on tiny corpora (scores computed by hand) plus plan
shape: the corpus-statistics feedback edges must be broadcasts, never
shuffled joins of the fact side.
"""

from __future__ import annotations

import math

from legislative_bills_database_spark.operators.tfidf import (
    bigram_pmi,
    tfidf_top_terms,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_tfidf_known_answer(spark):
    docs = _docs(
        spark,
        [
            "apple apple banana",  # tf(apple)=2, df(apple)=1 → idf=ln(3)
            "banana cherry",  # banana in all 3 docs → idf=0
            "banana cherry cherry",
        ],
    )
    out = tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: apple scores 2·ln(3/1); banana scores 1·ln(3/3)=0
    top0 = by_doc[0][0]
    assert top0["term"] == "apple"
    assert abs(top0["score"] - 2 * math.log(3.0)) < 1e-6
    # banana appears in every doc → idf 0 → score 0 everywhere
    assert all(
        r["score"] == 0.0 for rs in by_doc.values() for r in rs
        if r["term"] == "banana"
    )
    # rank ties break on term asc: doc 1 has cherry(ln 1.5) > banana(0)
    assert [r["term"] for r in by_doc[1]] == ["cherry", "banana"]


def test_tfidf_rank_is_dense_topk(spark):
    docs = _docs(spark, ["a b c d e", "a b", "c d"])
    out = tfidf_top_terms(docs, k=3).collect()
    for doc_id in {r["doc_id"] for r in out}:
        ranks = sorted(r["rank"] for r in out if r["doc_id"] == doc_id)
        assert ranks == list(range(1, len(ranks) + 1))


def test_bigram_pmi_known_answer(spark):
    # "x y" always adjacent (4×); "a b" co-occur but also apart
    docs = _docs(
        spark,
        ["x y a", "x y b", "a x y", "b x y a b"],
    )
    out = bigram_pmi(docs, min_count=4, k=5).collect()
    assert out, "x y passes min_count=4"
    top = out[0]
    assert (top["w1"], top["w2"]) == ("x", "y")
    # T=14 unigrams, B=10 bigrams, c_xy=4, c_x=4, c_y=4
    expected = math.log((4 / 10) / ((4 / 14) * (4 / 14)))
    assert abs(top["pmi"] - expected) < 1e-6
    assert top["pair_count"] == 4


def test_bigram_pmi_min_count_filters(spark):
    docs = _docs(spark, ["p q", "p q", "r s"])
    out = bigram_pmi(docs, min_count=2, k=10).collect()
    pairs = {(r["w1"], r["w2"]) for r in out}
    assert ("p", "q") in pairs and ("r", "s") not in pairs


def test_bigram_single_token_docs_ignored(spark):
    docs = _docs(spark, ["solo", "a b", "a b"])
    out = bigram_pmi(docs, min_count=1, k=10).collect()
    assert all((r["w1"], r["w2"]) != ("solo", "solo") for r in out)


def test_corpus_stats_feedback_edges_are_broadcast(spark):
    docs = _docs(spark, ["a b c", "b c d", "c d e"])
    for df in (tfidf_top_terms(docs), bigram_pmi(docs, min_count=1)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
        assert "CartesianProduct" not in plan


class TestSparseCosine:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_identical_docs_score_one(self, spark):
        from legislative_bills_database_spark.operators.tfidf import (
            sparse_cosine_pairs,
        )

        docs = self._docs(
            spark,
            [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta")],
        )
        got = {
            (r.doc_a, r.doc_b): r.cosine
            for r in sparse_cosine_pairs(docs, threshold=0.3).collect()
        }
        assert got == {(1, 2): 1.0}

    def test_hot_terms_pruned_before_pairing(self, spark):
        """Docs sharing ONLY a term above max_df never pair — the
        O(df²) guard is semantic, and cheap terms carry ~no weight."""
        from legislative_bills_database_spark.operators.tfidf import (
            sparse_cosine_pairs,
        )

        rows = [(i, f"common w{i}") for i in range(10)]
        docs = self._docs(spark, rows)
        # 'common' has df=10 > max_df=5; each w{i} is unique
        assert (
            sparse_cosine_pairs(docs, threshold=0.01, max_df=5).count() == 0
        )

    def test_partial_overlap_below_one(self, spark):
        from legislative_bills_database_spark.operators.tfidf import (
            sparse_cosine_pairs,
        )

        docs = self._docs(
            spark, [(1, "a b c d"), (2, "a b x y"), (3, "p q r s")]
        )
        got = {
            (r.doc_a, r.doc_b): r.cosine
            for r in sparse_cosine_pairs(docs, threshold=0.05).collect()
        }
        assert set(got) == {(1, 2)}
        assert 0 < got[(1, 2)] < 1


def test_weighted_median_exposes_whale_docs(spark):
    """Plain median doc length = 1; the character-weighted median is the
    whale's length because it holds 97% of the corpus mass."""
    from legislative_bills_database_spark.plans import QUERIES, ORACLE  # noqa: F401

    rows = [(1, "s", 1), (2, "s", 1), (3, "s", 1), (4, "s", 97)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = (
        Window.partitionBy("source")
        .orderBy("n_chars", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("source")
    out = (
        df.select(
            "source",
            "n_chars",
            F.sum("n_chars").over(w).alias("cum"),
            F.sum("n_chars").over(wt).alias("total"),
        )
        .filter(F.col("cum") * 2 >= F.col("total"))
        .groupBy("source")
        .agg(F.min("n_chars").alias("wm"))
        .collect()
    )
    assert out[0].wm == 97
