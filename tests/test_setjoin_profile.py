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


def test_containment_asymmetric_embedding(spark):
    """The case Jaccard can't see: a tiny doc embedded in a huge one.
    Containment fires inner→outer only; Jaccard at the same threshold
    fires neither direction."""
    from legislative_bills_database_spark.operators.setjoin import (
        containment_join,
    )

    small = "a b c d e"
    big = small + " " + " ".join(f"x{i}" for i in range(200))
    docs = _docs(spark, [(1, small), (2, big)])
    got = [
        (r.inner_doc, r.outer_doc, r.containment)
        for r in containment_join(
            docs, shingle_n=1, threshold=0.9
        ).collect()
    ]
    assert got == [(1, 2, 1.0)]
    assert prefix_jaccard_join(docs, shingle_n=1, threshold=0.9).count() == 0


def test_containment_matches_bruteforce(spark):
    """Seeded random corpus: probe-prefix filtering == quadratic brute
    force over ORDERED pairs (the completeness proof, locally)."""
    import random

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(18):
        words = rng.sample(vocab, rng.randint(4, 14))
        rows.append((i, " ".join(words)))
        if i % 4 == 0:  # planted subset doc
            rows.append((100 + i, " ".join(words[: max(3, len(words) // 2)])))
    from legislative_bills_database_spark.operators.setjoin import (
        containment_join,
    )

    docs = _docs(spark, rows)
    t = 0.7
    got = {
        (r.inner_doc, r.outer_doc)
        for r in containment_join(docs, shingle_n=1, threshold=t).collect()
    }
    sets = {i: set(txt.split()) for i, txt in rows}
    want = {
        (a, b)
        for a in sets
        for b in sets
        if a != b and len(sets[a] & sets[b]) / len(sets[a]) >= t
    }
    assert got == want and want


def test_containment_threshold_validation(spark):
    from legislative_bills_database_spark.operators.setjoin import (
        containment_join,
    )

    docs = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        containment_join(docs, threshold=0.0)


def test_basket_lift_hand_computed(spark):
    """4 baskets: (a,b) together in 2 of their cheap appearances →
    lift above 1; (a,c) independent-ish → at or below 1."""
    from legislative_bills_database_spark.operators.basket import basket_lift

    baskets = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "c"), (4, "d"),
        (4, "a"),  # a in 4 baskets; b in 2; ab together 2
    ]
    df = spark.createDataFrame(baskets, "b long, i string")
    out = {
        (r.item_a, r.item_b): (r.n_ab, r.lift)
        for r in basket_lift(df, "b", "i", min_support=2).collect()
    }
    # lift(a,b) = n_ab·N/(n_a·n_b) = 2·4/(4·2) = 1.0
    assert out[("a", "b")] == (2, 1.0)
    # lift(a,c) = 2·4/(4·2) = 1.0 as well; min_support=2 keeps both
    assert out[("a", "c")] == (2, 1.0)
    # pairs below support are absent
    assert ("c", "d") not in out


def test_basket_lift_dedups_repeated_items(spark):
    """The same item twice in one basket counts once (DISTINCT guard)."""
    from legislative_bills_database_spark.operators.basket import basket_lift

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")],
        "b long, i string",
    )
    out = {
        (r.item_a, r.item_b): r.n_ab
        for r in basket_lift(df, "b", "i", min_support=1).collect()
    }
    assert out[("a", "b")] == 2


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


def test_survivorship_keeps_highest_quality_per_cluster(spark):
    from legislative_bills_database_spark.operators.dedup import (
        survivorship_by_quality,
    )

    docs = spark.createDataFrame(
        [
            (1, 0.2),  # cluster {1,2,3}: 2 wins on quality
            (2, 0.9),
            (3, 0.9),  # ties 2 on quality → 2 wins on id
            (4, 0.5),  # singleton
            (5, 0.1),  # cluster {5,6}: 6 wins
            (6, 0.8),
        ],
        "doc_id long, quality double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    got = {
        r.doc_id: r.n_members
        for r in survivorship_by_quality(docs, pairs, "doc_id").collect()
    }
    assert got == {2: 3, 4: 1, 6: 2}


# ---------------------------------------------------------------------------
# Physical-plan audits (same contract as tests/test_plan_audit.py)
# ---------------------------------------------------------------------------

from legislative_bills_database_spark.plans import QUERIES  # noqa: E402


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_prefix_join_plan_all_hash_joins_no_python(spark):
    """Candidate generation and verification are equi-joins end to end —
    no theta/cartesian fallback, no Python evaluation."""
    plan = _plan(spark, "q_prefix_jaccard_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_heavy_hitters_plan_is_topk_not_global_sort(spark):
    """Top-k must plan as TakeOrderedAndProject (per-task heaps); the
    only nested-loop join allowed is the 1-row broadcast total."""
    plan = _plan(spark, "q_heavy_hitters")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_stratified_fixed_n_single_shuffle(spark):
    """One shuffle on the stratum; rank + filter ride the same
    partitioning."""
    plan = _plan(spark, "q_stratified_fixed_n")
    assert plan.count("Exchange hashpartitioning") == 1


def test_approx_quantiles_single_shuffle_rollup(spark):
    """rollup() plans one Expand + ONE shuffle of mergeable sketch
    summaries — per-group and grand-total quantiles, no rescan."""
    plan = _plan(spark, "q_approx_quantiles")
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_ewma_chunked_no_python_bounded_shuffles(spark):
    """The chunked fold stays JVM-side (aggregate() HOF over chunk
    arrays); at most rank + chunk-agg + key-agg shuffles."""
    plan = _plan(spark, "q_ewma_chunked")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") <= 3


def test_cdc_apply_latest_change_wins(spark):
    from legislative_bills_database_spark.operators.scd import cdc_apply

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    chg = spark.createDataFrame(
        [
            (1, "a2", "U", 1),
            (1, "a3", "U", 2),  # later seq wins
            (2, None, "D", 1),  # delete
            (4, "d", "I", 1),  # insert
            (3, "zzz", "U", 1),
            (3, None, "D", 2),  # update then delete → gone
        ],
        "k long, v string, op string, seq int",
    )
    got = {r.k: r.v for r in cdc_apply(base, chg, "k", ["v"]).collect()}
    assert got == {1: "a3", 4: "d"}


def test_cdc_apply_idempotent_replay(spark):
    """Applying the same changelog twice == once (retried batch)."""
    from legislative_bills_database_spark.operators.scd import cdc_apply

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    chg = spark.createDataFrame(
        [(1, "a2", "U", 5), (2, None, "D", 5)], "k long, v string, op string, seq int"
    )
    once = cdc_apply(base, chg, "k", ["v"])
    twice = cdc_apply(once, chg, "k", ["v"])
    assert sorted((r.k, r.v) for r in once.collect()) == sorted(
        (r.k, r.v) for r in twice.collect()
    ) == [(1, "a2")]


def test_max_concurrency_hand_built(spark):
    import datetime as dt

    from legislative_bills_database_spark.operators.temporal import (
        max_concurrency,
    )

    d = lambda day: dt.date(2024, 1, day)  # noqa: E731
    # [1,5) [2,4) [3,6) overlap 3 on day 3; [4,9) joins as [2,4) ends
    # (end-before-start at day 4 keeps the peak at 3, not 4)
    iv = spark.createDataFrame(
        [(d(1), d(5)), (d(2), d(4)), (d(3), d(6)), (d(4), d(9))],
        "s date, e date",
    )
    row = max_concurrency(iv, "s", "e").collect()[0]
    assert (row.peak_concurrency, str(row.peak_start)) == (3, "2024-01-03")


def test_minhash_calibration_error_within_budget(spark):
    """16-hash MinHash on the fixture corpus: MAE within ~2× the
    √(J(1−J)/16) theoretical budget, and estimates unbiased enough that
    the means agree to 0.15."""
    from legislative_bills_database_spark.io import load_table
    from legislative_bills_database_spark.operators.dedup import (
        minhash_estimate_error,
    )

    docs = load_table(spark, SF_DIR, "documents").filter("doc_id < 500")
    row = minhash_estimate_error(docs).collect()[0]
    assert row.n_pairs > 0
    assert row.mae <= 0.25, row
    assert abs(row.mean_est - row.mean_exact) <= 0.15, row


def test_token_budget_fill_exact_prefix(spark):
    from legislative_bills_database_spark.operators.sampling import (
        token_budget_fill,
    )

    df = spark.createDataFrame(
        [
            # domain a, budget 100: quality order 3(40) → 1(50) → 2(30):
            # cum 40, 90, 120 → doc 2 cut
            (1, "a", 50, 0.5),
            (2, "a", 30, 0.1),
            (3, "a", 40, 0.9),
            # domain b, default budget 10: first doc already too big
            (4, "b", 25, 0.9),
        ],
        "id long, dom string, toks long, q double",
    )
    got = {
        r.id: r.cum_tokens
        for r in token_budget_fill(
            df, "dom", "toks", "q", "id", budgets={"a": 100}, default_budget=10
        ).collect()
    }
    assert got == {3: 40, 1: 90}


def test_leakage_safe_split_clusters_never_straddle(spark):
    from legislative_bills_database_spark.operators.dedup import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(40)], "doc_id long, text string"
    )
    # chains of 4: {0..3}, {4..7}, ... 10 clusters
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(39) if i % 4 != 3],
        "id_a long, id_b long",
    )
    out = leakage_safe_split(
        docs, pairs, "doc_id", {"train": 0.5, "val": 0.5}, seed=1
    ).collect()
    by_cluster: dict[int, set] = {}
    for r in out:
        by_cluster.setdefault(r.component, set()).add(r.split)
    assert len(out) == 40
    assert all(len(s) == 1 for s in by_cluster.values())  # never straddles
    assert len({r.split for r in out}) == 2  # both splits used
