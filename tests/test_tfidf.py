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
