"""Sampling, sequence-packing, BM25 and repetition operator tests.

The oracle-parity sweep (test_oracle_parity / scripts/preflight) covers
value equality for the SQL-expressible queries; these tests pin the
operator INVARIANTS — determinism, capacity, exactly-once, rate bounds —
that a hash check can't express, especially for the rows-only
first-fit packer.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from legislative_bills_database_spark.functions import text as T
from legislative_bills_database_spark.io import load_table
from legislative_bills_database_spark.operators.packing import (
    first_fit_pack,
    pack_chunks,
    pack_stats,
)
from legislative_bills_database_spark.operators.ranking import bm25_topk
from legislative_bills_database_spark.operators.sampling import (
    mixture_sample,
    stratified_sample,
    unit_hash,
)

from conftest import SF_DIR


# ---------------------------------------------------------------- sampling


def test_unit_hash_range_and_determinism(spark):
    df = spark.range(0, 2000).select(unit_hash("id").alias("u"))
    row = df.agg(
        F.min("u").alias("lo"), F.max("u").alias("hi"), F.avg("u").alias("mu")
    ).collect()[0]
    assert 0.0 <= row.lo and row.hi < 1.0
    assert abs(row.mu - 0.5) < 0.05  # equidistributed over sequential ids
    again = spark.range(0, 2000).select(unit_hash("id").alias("u"))
    assert df.collect() == again.collect()


def test_stratified_sample_rates_and_subset(spark):
    docs = load_table(spark, SF_DIR, "documents")
    rates = {"en": 0.2, "zh": 1.0}
    kept = stratified_sample(docs, "lang", rates, "doc_id", default_rate=0.5)
    n = {
        r["lang"]: (r["k"], r["t"])
        for r in docs.join(
            kept.select("doc_id").withColumn("__k", F.lit(1)), "doc_id", "left"
        )
        .groupBy("lang")
        .agg(F.sum("__k").alias("k"), F.count("*").alias("t"))
        .collect()
    }
    assert n["zh"][0] == n["zh"][1]  # rate 1.0 keeps everything
    for lang, (k, t) in n.items():
        rate = rates.get(lang, 0.5)
        assert abs(k / t - rate) < 0.15, (lang, k, t)
    # sample is a subset: no invented rows
    assert kept.join(docs, "doc_id", "left_anti").count() == 0


def test_mixture_sample_hits_target_composition(spark):
    docs = load_table(spark, SF_DIR, "documents")
    weights = {"en": 0.4, "es": 0.15, "fr": 0.15, "de": 0.15, "zh": 0.15}
    kept = mixture_sample(docs, "lang", weights, 300, "doc_id")
    counts = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    total = sum(counts.values())
    assert abs(total - 300) < 60  # expected total ≈ target
    for lang, w in weights.items():
        assert abs(counts[lang] / 300 - w) < 0.08, (lang, counts)
    # deterministic: second run identical row set
    again = mixture_sample(docs, "lang", weights, 300, "doc_id")
    assert kept.select("doc_id").exceptAll(again.select("doc_id")).count() == 0


# ----------------------------------------------------------------- packing


def _tok_counts(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return docs, F.size(T.tokens(F.col("text")))


def test_pack_chunks_spans_are_contiguous(spark):
    docs, tok = _tok_counts(spark)
    out = pack_chunks(docs, "doc_id", tok, n_groups=8, chunk_len=64).collect()
    by_grp: dict[int, list] = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r)
    assert sum(len(v) for v in by_grp.values()) == docs.count()
    for grp, rows in by_grp.items():
        rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rows:
            assert r["grp"] == r["doc_id"] % 8
            assert r["start_chunk"] == cum // 64
            assert r["end_chunk"] == (cum + max(r["n_tok"], 1) - 1) // 64
            assert r["start_chunk"] <= r["end_chunk"]
            cum += r["n_tok"]


def test_first_fit_pack_invariants(spark):
    docs, tok = _tok_counts(spark)
    cap = 128
    packed = first_fit_pack(docs, "doc_id", tok, capacity=cap, n_groups=8)
    rows = packed.collect()
    # exactly-once: every doc assigned to exactly one bin
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )
    fill: dict[tuple[int, int], int] = {}
    oversize: dict[tuple[int, int], int] = {}
    for r in rows:
        key = (r["grp"], r["bin"])
        fill[key] = fill.get(key, 0) + r["n_tok"]
        if r["n_tok"] > cap:
            oversize[key] = oversize.get(key, 0) + 1
    for key, used in fill.items():
        if key in oversize:  # an oversize doc sits alone in its bin
            assert oversize[key] == 1 and used == max(
                r["n_tok"] for r in rows if (r["grp"], r["bin"]) == key
            )
        else:
            assert used <= cap, (key, used)
    # bins are contiguous 0..max per group
    bins_by_grp: dict[int, set] = {}
    for r in rows:
        bins_by_grp.setdefault(r["grp"], set()).add(r["bin"])
    for grp, bins in bins_by_grp.items():
        assert bins == set(range(len(bins))), (grp, bins)
    # FFD beats one-doc-per-bin and can't beat the token lower bound
    stats = pack_stats(packed, cap).collect()
    for s in stats:
        lower = math.ceil(s["tokens_total"] / cap)
        assert lower <= s["n_bins"] < s["n_docs"], s
    # deterministic
    again = first_fit_pack(docs, "doc_id", tok, capacity=cap, n_groups=8)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


# ------------------------------------------------------------------- bm25


def test_bm25_matches_hand_computation(spark):
    rows = [
        (1, "cat dog cat"),
        (2, "dog fish"),
        (3, "fish fish fish cat"),
        (4, "bird"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(df, ["cat", "fish"], k=10).collect()
    }
    # hand BM25: N=4, avgdl=10/4, df_cat=2, df_fish=2
    k1, b = 1.2, 0.75
    n, avgdl = 4.0, 10 / 4

    def score(tf_cat, tf_fish, dl):
        s = 0.0
        for tf, dft in ((tf_cat, 2.0), (tf_fish, 2.0)):
            if tf == 0:
                continue
            idf = math.log(1 + (n - dft + 0.5) / (dft + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        return math.floor(s * 1e6 + 0.5) / 1e6

    assert out[1] == pytest.approx(score(2, 0, 3))
    assert out[2] == pytest.approx(score(0, 1, 2))
    assert out[3] == pytest.approx(score(1, 3, 4))
    assert 4 not in out  # zero-score docs filtered


def test_bm25_plan_has_no_fact_shuffle(spark):
    docs = load_table(spark, SF_DIR, "documents")
    plan = (
        bm25_topk(docs, ["table", "spark"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # stats agg exchanges a single row; the scored side must go straight
    # to TakeOrderedAndProject with no hash-partition exchange
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange hashpartitioning") == 0, plan


# -------------------------------------------------------------- repetition


def test_ngrams_all_keeps_duplicates(spark):
    df = spark.createDataFrame([("a a a a",)], ["text"])
    grams = df.select(
        T.ngrams_all(T.tokens(F.col("text")), 2).alias("g")
    ).collect()[0]["g"]
    assert grams == ["a a", "a a", "a a"]


# ------------------------------------------------------- incremental dedup


def test_incremental_dedup_semantics(spark):
    from legislative_bills_database_spark.operators.dedup import (
        incremental_dedup,
    )

    existing = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], ["doc_id", "text"]
    )
    incoming = spark.createDataFrame(
        [
            (10, "alpha"),  # exact dup of corpus → dropped
            (11, "gamma"),  # new → kept
            (12, "gamma"),  # within-batch dup, higher id → dropped
            (13, "delta"),  # new → kept
        ],
        ["doc_id", "text"],
    )
    out = sorted(
        r["doc_id"]
        for r in incremental_dedup(existing, incoming, "text", "doc_id").collect()
    )
    assert out == [11, 13]


# ------------------------------------------------------ split / compaction


def test_group_split_never_leaks_groups(spark):
    from legislative_bills_database_spark.operators.sampling import (
        group_split,
    )

    docs = load_table(spark, SF_DIR, "documents")
    src_num = F.regexp_extract(F.col("source"), "[0-9]+", 0).cast("bigint")
    labeled = docs.withColumn(
        "split", group_split(src_num, {"train": 0.8, "val": 0.1, "test": 0.1})
    )
    # leakage-safety: every source maps to exactly ONE split
    per_src = labeled.groupBy("source").agg(
        F.countDistinct("split").alias("k")
    )
    assert per_src.filter(F.col("k") != 1).count() == 0
    # all three labels exist over 20 sources, train is the plurality
    counts = {
        r["split"]: r["n"]
        for r in labeled.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    import glob

    from legislative_bills_database_spark.sources.sinks import compact_parquet

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    frag = str(tmp_path / "frag")
    docs.repartition(40).write.parquet(frag)
    n_before = len(glob.glob(f"{frag}/part-*.parquet"))
    assert n_before == 40
    packed = str(tmp_path / "packed")
    compact_parquet(spark, frag, packed, target_rows_per_file=200)
    n_after = len(glob.glob(f"{packed}/part-*.parquet"))
    n_rows = docs.count()
    assert n_after == max(1, -(-n_rows // 200))
    # content preserved
    assert spark.read.parquet(packed).exceptAll(docs).count() == 0
    assert docs.exceptAll(spark.read.parquet(packed)).count() == 0


def test_weighted_sample_matches_numpy_aes(spark):
    """A-ES selection == the same exponential-race formula in numpy
    (same hash, same ln, same tie-break)."""
    import math

    from legislative_bills_database_spark.operators.sampling import (
        KNUTH,
        M32,
        weighted_sample_fixed_k,
    )

    rows = [(i, float(1 + (i * 7) % 13)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    k, seed = 20, 3
    got = {
        r.id for r in weighted_sample_fixed_k(df, "doc_id", "w", k, seed).collect()
    }
    keyed = sorted(
        (
            -math.log((((i + seed) * KNUTH) % M32 + 0.5) / M32) / w,
            i,
        )
        for i, w in rows
    )
    want = {i for _, i in keyed[:k]}
    assert got == want


def test_weighted_sample_prefers_heavy_rows(spark):
    """Inclusion frequency across seeds tracks weight: a row with 50x
    the weight of the rest is picked in (nearly) every seed."""
    from legislative_bills_database_spark.operators.sampling import (
        weighted_sample_fixed_k,
    )

    rows = [(i, 50.0 if i == 0 else 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    hits = sum(
        any(
            r.id == 0
            for r in weighted_sample_fixed_k(df, "doc_id", "w", 10, seed).collect()
        )
        for seed in range(8)
    )
    assert hits >= 7  # P(miss) ~ (1 - 50/149)^10 per seed — tiny


def test_weighted_sample_k_and_weight_edges(spark):
    import pytest

    from legislative_bills_database_spark.operators.sampling import (
        weighted_sample_fixed_k,
    )

    df = spark.createDataFrame(
        [(1, 2.0), (2, 0.0), (3, -1.0), (4, 5.0)], "doc_id long, w double"
    )
    # nonpositive weights excluded; k larger than survivors returns all
    got = {r.id for r in weighted_sample_fixed_k(df, "doc_id", "w", 10).collect()}
    assert got == {1, 4}
    with pytest.raises(ValueError):
        weighted_sample_fixed_k(df, "doc_id", "w", 0)


def test_weighted_sample_plan_is_topk_not_global_sort(spark):
    from legislative_bills_database_spark.operators.sampling import (
        weighted_sample_fixed_k,
    )

    df = spark.createDataFrame(
        [(i, 1.0 + i) for i in range(50)], "doc_id long, w double"
    )
    plan = (
        weighted_sample_fixed_k(df, "doc_id", "w", 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
