"""Round-4 operator pins: prefix-filtered exact Jaccard join, heavy
hitters, approx-quantile rollup, exact-N stratified sampling.

The oracle-parity sweep covers their SQL twins; these pin the semantics
an oracle can't see — prefix completeness at the threshold boundary,
sketch rank-error bounds, fixed-N determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from legislative_bills_database_spark.operators.profile import (
    approx_quantiles_rollup,
    heavy_hitters,
)
from legislative_bills_database_spark.operators.sampling import (
    stratified_fixed_n,
)
from legislative_bills_database_spark.operators.setjoin import (
    prefix_jaccard_join,
)
from tests.conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prefix_jaccard_exact_boundary(spark):
    """A pair EXACTLY at the threshold must survive (completeness is
    tightest at the boundary, where an FP prefix-length error bites)."""
    # 1-gram shingle sets {a,b,c,d} vs {a,b,c,e}: J = 3/5 = 0.6
    docs = _docs(spark, [(1, "a b c d"), (2, "a b c e")])
    got = prefix_jaccard_join(docs, shingle_n=1, threshold=0.6).collect()
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in got] == [(1, 2, 0.6)]
    # and just above the pair's similarity: excluded
    assert (
        prefix_jaccard_join(docs, shingle_n=1, threshold=0.61).count() == 0
    )


def test_prefix_jaccard_matches_bruteforce(spark):
    """Seeded random corpus: prefix filtering == quadratic brute force."""
    import itertools
    import random

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(40)]
    base = {i: rng.sample(vocab, 12) for i in range(20)}
    rows = []
    for i, words in base.items():
        rows.append((i, " ".join(words)))
        if i % 3 == 0:  # planted near-dup: one word swapped
            mutated = list(words)
            mutated[0] = "zz"
            rows.append((100 + i, " ".join(mutated)))
    docs = _docs(spark, rows)
    theta = 0.5
    got = {
        (r.doc_a, r.doc_b)
        for r in prefix_jaccard_join(
            docs, shingle_n=1, threshold=theta
        ).collect()
    }
    sets = {i: set(t.split()) for i, t in rows}
    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(sets), 2)
        if len(sets[a] & sets[b]) / len(sets[a] | sets[b]) >= theta
    }
    assert got == want and want  # nonempty by construction


def test_heavy_hitters_counts_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(k,) for k in ["a"] * 5 + ["b"] * 3 + ["c"] * 3 + ["d"]],
        "k string",
    )
    got = [(r.key, r.n, r.share) for r in heavy_hitters(df, "k", k=3).collect()]
    # b before c on the key tie-break; shares over the FULL 12 rows
    assert got == [
        ("a", 5, round(5 / 12, 6)),
        ("b", 3, 0.25),
        ("c", 3, 0.25),
    ]


def test_approx_quantiles_rank_error_vs_exact(spark):
    from legislative_bills_database_spark.io import load_table

    lineitem = load_table(spark, SF_DIR, "lineitem")
    got = {
        r.grp: (r.p50, r.p90, r.p99)
        for r in approx_quantiles_rollup(
            lineitem, "l_returnflag", "l_extendedprice"
        ).collect()
    }
    n = lineitem.count()
    vals = sorted(r[0] for r in lineitem.select("l_extendedprice").collect())
    # rank error <= n/accuracy + 1 positions around the exact rank
    slack = n // 10_000 + 2
    for p, idx in ((0.5, 0), (0.9, 1), (0.99, 2)):
        r = int(p * (n - 1))
        lo, hi = vals[max(0, r - slack)], vals[min(n - 1, r + slack)]
        assert lo <= got["ALL"][idx] <= hi, (p, got["ALL"][idx], lo, hi)
    assert set(got) == {"ALL"} | {
        r.l_returnflag
        for r in lineitem.select("l_returnflag").distinct().collect()
    }


def test_stratified_fixed_n_exact_and_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        "id long, stratum string",
    )
    out1 = stratified_fixed_n(df, "stratum", "id", 25, seed=7)
    counts = {r.stratum: r.n for r in out1.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": 25, "small": 25}
    # a stratum smaller than N returns whole stratum
    tiny = stratified_fixed_n(
        df.filter("stratum = 'small'").limit(10), "stratum", "id", 25
    )
    assert tiny.count() == 10
    # deterministic: same seed → same membership; different seed → different
    ids = lambda o: {r.id for r in o.select("id").collect()}  # noqa: E731
    assert ids(out1) == ids(stratified_fixed_n(df, "stratum", "id", 25, seed=7))
    assert ids(out1) != ids(stratified_fixed_n(df, "stratum", "id", 25, seed=8))
