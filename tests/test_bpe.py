"""BPE training/encoding semantics: hand-computed merges on the classic
'low/lower/lowest' corpus, encode round-trip properties, determinism."""

from __future__ import annotations

from legislative_bills_database_spark.operators.bpe import (
    bpe_encode,
    bpe_train,
    bpe_train_merges,
    word_frequencies,
)

CORPUS = [(1, "low low low"), (2, "lower lowest")]


def test_merges_hand_computed():
    wf = [("low", 3), ("lower", 1), ("lowest", 1)]
    merges = bpe_train_merges(wf, n_merges=10)
    # counts: (o,w)=5 ties (l,o)=5 → lexicographic pair break picks (o,w);
    # then (l,ow)=5; then (low,e)=2; every remaining pair is unique → stop
    assert merges == [
        (0, "o", "w", 5),
        (1, "l", "ow", 5),
        (2, "low", "e", 2),
    ]


def test_word_frequencies_bounded_and_deterministic(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    wf = word_frequencies(docs, max_words=2)
    assert wf == [("low", 3), ("lower", 1)]  # count DESC, word ASC


def test_encode_applies_ranked_merges(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = bpe_train(docs, n_merges=10)
    out = {r.doc_id: r for r in bpe_encode(docs, merges).collect()}
    # doc 1: "low" ×3 → one token each
    assert (out[1].n_words, out[1].n_tokens) == (3, 3)
    # doc 2: lower → [lowe, r]; lowest → [lowe, s, t]
    assert (out[2].n_words, out[2].n_tokens) == (2, 5)
    # tokens never exceed chars, never fewer than words
    for r in out.values():
        assert r.n_words <= r.n_tokens


def test_training_is_deterministic_on_fixtures(spark):
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    a = bpe_train(docs, n_merges=15).collect()
    b = bpe_train(docs, n_merges=15).collect()
    assert a == b
    assert len(a) > 0 and all(r.pair_count >= 2 for r in a)
