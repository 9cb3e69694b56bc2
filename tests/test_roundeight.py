"""Round-8 additions: the exact-plan hot-key guard on
cooccurrence_pairs, bitmask multi-source BFS chunking (>62 seeds), and
the conditional REAL-decoder proof for the multimodal injection seam.
"""

from __future__ import annotations

import io
import random

import pytest

SF1 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# cooccurrence_pairs hot-key guard (VERDICT r7 item #3)
# ---------------------------------------------------------------------------


def _hot_edges(spark, hot_degree: int):
    """One hot key with ``hot_degree`` items plus a few cold keys."""
    rows = [("hot", f"i{j}") for j in range(hot_degree)]
    # cold keys share an item set disjoint from the hot key's, so the
    # expected row count is C(hot, 2) + C(3, 2) exactly
    rows += [(f"k{k}", f"c{j}") for k in range(5) for j in range(3)]
    return spark.createDataFrame(rows, "k string, i string")


def test_cooccurrence_guard_warns_past_threshold(spark):
    from legislative_bills_database_spark.operators.basket import (
        cooccurrence_pairs,
    )

    edges = _hot_edges(spark, hot_degree=50)
    with pytest.warns(UserWarning, match="degree_capped_edges"):
        df = cooccurrence_pairs(edges, "k", "i", max_degree=10)
    # warn, don't refuse: the plan must still run (the skew bench runs
    # the exact plans past the threshold on purpose)
    assert df.count() == 50 * 49 // 2 + 3


def test_cooccurrence_guard_strict_raises(spark):
    from legislative_bills_database_spark.operators.basket import (
        cooccurrence_pairs,
    )

    edges = _hot_edges(spark, hot_degree=50)
    with pytest.raises(ValueError, match="q_graph_jaccard_approx"):
        cooccurrence_pairs(edges, "k", "i", max_degree=10, strict=True)


def test_cooccurrence_guard_silent_under_threshold(spark, recwarn):
    from legislative_bills_database_spark.operators.basket import (
        cooccurrence_pairs,
    )

    edges = _hot_edges(spark, hot_degree=8)
    n = cooccurrence_pairs(edges, "k", "i", max_degree=10).count()
    assert n == 8 * 7 // 2 + 3
    assert not [w for w in recwarn if issubclass(w.category, UserWarning)]


def test_exact_graph_queries_run_unchanged_on_fixtures(spark):
    """The driver/bench fixtures sit under the default threshold — the
    guarded exact plans run warning-free."""
    import warnings

    from legislative_bills_database_spark.plans import QUERIES

    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        assert QUERIES["q_graph_jaccard"](spark, SF1).count() > 0


# ---------------------------------------------------------------------------
# bitmask multi-source BFS: >62-seed chunking
# ---------------------------------------------------------------------------


@pytest.mark.slow  # r15 fast-lane: measured-heavy (see pytest.ini)
def test_multi_source_bfs_chunks_past_62_seeds(spark):
    """70 seeds forces two mask passes; the union must equal per-seed
    BFS exactly (the chunking is invisible in the result)."""
    from legislative_bills_database_spark.operators.graph import (
        bfs_hops,
        multi_source_bfs,
    )

    rng = random.Random(8)
    edges = [
        (f"n{rng.randrange(80)}", f"n{rng.randrange(80)}") for _ in range(200)
    ]
    edf = spark.createDataFrame(edges, "src string, dst string")
    seed_names = [f"n{i}" for i in range(70)]
    seeds = spark.createDataFrame([(s,) for s in seed_names], "seed string")
    got = sorted(
        (r.seed, r.node, r.dist)
        for r in multi_source_bfs(edf, seeds, max_hops=4).collect()
    )
    want = []
    for s in seed_names:
        one = spark.createDataFrame([(s,)], "node string")
        for r in bfs_hops(edf, one, max_hops=4).collect():
            want.append((s, r.node, r.dist))
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# multimodal seam vs a REAL decoder (VERDICT r7 item #7): exercises the
# injection seam with PIL when the environment provides it, skips
# cleanly where it doesn't (this container).
# ---------------------------------------------------------------------------

def test_injection_seam_with_real_pil_decoder(spark):
    pytest.importorskip("PIL", reason="PIL not installed in this container")
    from PIL import Image

    from legislative_bills_database_spark.sources.multimodal import (
        FEATURE_DIM,
        image_features,
        resize_images,
    )

    def make_png(w, h, color):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), color).save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        (1, make_png(13, 7, (255, 0, 0)), "image/png"),
        (2, make_png(4, 9, (0, 128, 255)), "image/png"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, mime string"
    )

    def real_extractor(payload: bytes) -> list[float]:
        img = Image.open(io.BytesIO(payload))
        w, h = img.size
        px = img.convert("RGB").getpixel((0, 0))
        feats = [float(w), float(h), *(float(c) for c in px)]
        return (feats + [0.0] * FEATURE_DIM)[:FEATURE_DIM]

    got = {
        r.doc_id: r.features
        for r in image_features(df, extractor=real_extractor).collect()
    }
    assert got[1][:5] == [13.0, 7.0, 255.0, 0.0, 0.0]
    assert got[2][:5] == [4.0, 9.0, 0.0, 128.0, 255.0]

    def real_resizer(payload: bytes, w: int, h: int) -> bytes:
        img = Image.open(io.BytesIO(payload)).resize((w, h))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    out = resize_images(
        df.select("doc_id", "payload"), 5, 6, resizer=real_resizer
    ).collect()
    for r in out:
        img = Image.open(io.BytesIO(bytes(r.payload)))
        assert img.size == (5, 6)
        assert (r.width, r.height) == (5, 6)


# ---------------------------------------------------------------------------
# Phase-44 semantic pins (oracle parity is covered by
# test_oracle_parity.py; these pin the SEMANTICS the SQL can't state)
# ---------------------------------------------------------------------------


def test_confusion_matrix_identities(spark):
    from legislative_bills_database_spark.plans import QUERIES

    r = QUERIES["q_confusion_matrix"](spark, SF1).collect()[0]
    n = r.tp + r.fp + r.fn + r.tn
    import duckdb

    total = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF1}/orders.parquet')"
    ).fetchone()[0]
    assert n == total  # cells partition the population
    if r.tp:
        # f1 is the harmonic mean of the unrounded precision/recall
        p = r.tp / (r.tp + r.fp)
        rc = r.tp / (r.tp + r.fn)
        assert abs(r.f1 - 2 * p * rc / (p + rc)) < 1e-6


def test_group_mode_is_argmax(spark):
    from legislative_bills_database_spark.plans import QUERIES

    rows = QUERIES["q_group_mode"](spark, SF1).collect()
    assert rows and len({r.n_name for r in rows}) == len(rows)
    assert all(r.n_items > 0 for r in rows)


def test_temperature_mixture_flattens(spark):
    """τ=0.5 weights must sum to ~1 and compress the mixture: the
    largest source is down-weighted, the smallest up-weighted."""
    from legislative_bills_database_spark.plans import QUERIES

    rows = QUERIES["q_temperature_mixture"](spark, SF1).collect()
    assert abs(sum(r.w_tau for r in rows) - 1.0) < 1e-4
    big = max(rows, key=lambda r: r.n_docs)
    small = min(rows, key=lambda r: r.n_docs)
    if big.n_docs != small.n_docs:
        assert big.boost <= 1.0 + 1e-9
        assert small.boost >= 1.0 - 1e-9


def test_bloom_fpr_bounds(spark):
    from legislative_bills_database_spark.plans import QUERIES

    r = QUERIES["q_bloom_fpr_cert"](spark, SF1).collect()[0]
    assert 0 < r.n_bits_set <= 3 * r.n_members  # k distinct positions max
    assert 0 <= r.n_false_pos <= r.n_probes
    # occupancy is low on the fixture → FPR must be well under 50%
    assert r.fpr < 0.5
    assert r.occupancy_ppm == r.n_bits_set * 1_000_000 // 16384


def test_random_walk_is_a_walk(spark):
    """Every step's node must be adjacent to the previous step's node,
    and the walk must be deterministic across invocations."""
    from pyspark.sql import functions as F

    from legislative_bills_database_spark.io import load_tables
    from legislative_bills_database_spark.plans import QUERIES

    rows = sorted(
        map(tuple, QUERIES["q_random_walk"](spark, SF1).collect())
    )
    again = sorted(
        map(tuple, QUERIES["q_random_walk"](spark, SF1).collect())
    )
    assert rows == again
    orders, lineitem = load_tables(spark, SF1, "orders", "lineitem")
    edges = {
        (r.src, r.dst)
        for r in orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        )
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
        .collect()
    }
    adj = edges | {(b, a) for a, b in edges}
    walks: dict = {}
    for seed, step, node in rows:
        walks.setdefault(seed, {})[step] = node
    for seed, path in walks.items():
        for t in range(1, max(path) + 1):
            assert (path[t - 1], path[t]) in adj


def test_hits_authorities_positive_and_bounded(spark):
    from legislative_bills_database_spark.plans import QUERIES

    rows = QUERIES["q_hits_scores"](spark, SF1).collect()
    assert rows and rows[0].auth_ppm == 1_000_000  # top authority = max
    assert all(0 < r.auth_ppm <= 1_000_000 for r in rows)
    ppms = [r.auth_ppm for r in rows]
    assert ppms == sorted(ppms, reverse=True)


def test_weighted_jaccard_bounds(spark):
    from legislative_bills_database_spark.plans import QUERIES

    rows = QUERIES["q_weighted_jaccard"](spark, SF1).collect()
    assert rows
    assert all(0 < r.wjaccard <= 1.0 for r in rows)


def test_lexical_diversity_buckets(spark):
    from legislative_bills_database_spark.plans import QUERIES

    rows = QUERIES["q_lexical_diversity"](spark, SF1).collect()
    assert sum(r.n_docs for r in rows) == 500  # doc fixture size at sf0.001
    assert all(0 <= r.ttr_bucket <= 9 for r in rows)
    assert all(0 < r.pooled_ttr <= 1.0 for r in rows)


def test_harmonic_centrality_consistency(spark):
    """harmonic_ppm and eccentricity must be consistent with the
    closeness query's BFS on the same graph/seeds."""
    from legislative_bills_database_spark.plans import QUERIES

    hc = {r.seed: r for r in QUERIES["q_harmonic_centrality"](spark, SF1).collect()}
    cl = {r.seed: r for r in QUERIES["q_closeness"](spark, SF1).collect()}
    assert set(hc) == set(cl)
    for s in hc:
        assert hc[s].n_reached == cl[s].n_reached
        assert 1 <= hc[s].eccentricity <= 6
        # Σ 1e6/d ≤ 1e6 · n_reached, and ≥ 1e6·n/ecc
        assert hc[s].harmonic_ppm <= 1_000_000 * hc[s].n_reached
        assert hc[s].harmonic_ppm >= 1_000_000 * hc[s].n_reached // hc[s].eccentricity


def test_edit_distance_join_blocked(spark):
    """Pairs only within (brand, size) blocks; distances exact."""
    from legislative_bills_database_spark.plans import QUERIES

    rows = QUERIES["q_edit_distance_join"](spark, SF1).collect()
    # the sf0.001 part table has few same-(brand,size) blocks — the
    # top-15 cut may be under-full there; non-empty + ordered is the pin
    assert 1 <= len(rows) <= 15
    dists = [r.dist for r in rows]
    assert dists == sorted(dists)
    assert all(r.k1 < r.k2 for r in rows)


def test_zipf_fit_slope_negative(spark):
    from legislative_bills_database_spark.plans import QUERIES

    r = QUERIES["q_zipf_fit"](spark, SF1).collect()[0]
    # the synthetic doc fixture has a ~31-token vocabulary — the
    # top-200 cut is vocabulary-bounded, not always full
    assert 10 <= r.n_ranks <= 200
    assert r.zipf_slope < 0  # frequency falls with rank, always
    # intercept ≈ ln(top frequency) scale — must be positive and finite
    assert 0 < r.intercept < 50


def test_ngram_entropy_rate_bounds(spark):
    from legislative_bills_database_spark.plans import QUERIES

    rows = QUERIES["q_ngram_entropy_rate"](spark, SF1).collect()
    assert rows
    for r in rows:
        # 0 ≤ H(w2|w1) ≤ ln(vocab) — loose cap via bigram count
        assert 0 <= r.entropy_rate <= 20
        assert r.n_bigrams > 0


def test_minmax_scale_mean_in_unit_interval(spark):
    from legislative_bills_database_spark.plans import QUERIES

    rows = QUERIES["q_minmax_scale"](spark, SF1).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.mean_scaled <= 1.0
        assert r.vmin <= r.vmax


def test_simpson_check_counts_partition_nations(spark):
    from legislative_bills_database_spark.plans import QUERIES

    r = QUERIES["q_simpson_check"](spark, SF1).collect()[0]
    assert r.n_groups_up + r.n_groups_down <= 25
    assert r.simpson_flag in (0, 1)
    assert r.pooled_lift > 0


def test_mann_whitney_identities(spark):
    """U ∈ [0, n_a·n_b], rank-biserial consistent with U, z finite."""
    from legislative_bills_database_spark.plans import QUERIES

    r = QUERIES["q_mann_whitney"](spark, SF1).collect()[0]
    assert r.n_a > 0 and r.n_b > 0
    assert 0 <= r.u_stat <= r.n_a * r.n_b
    # rank_biserial = 2U/(na·nb) − 1 exactly (both sides round to 6dp)
    assert abs(r.rank_biserial - (2 * r.u_stat / (r.n_a * r.n_b) - 1)) < 2e-6
    assert -1.0 <= r.rank_biserial <= 1.0
    assert abs(r.z_score) < 50


def test_mann_whitney_matches_closed_form(spark):
    """Engine U equals the brute-force average-rank computation on the
    same rows (pulled once through DuckDB, ranked in Python)."""
    import duckdb

    from legislative_bills_database_spark.plans import QUERIES

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
        FROM read_parquet('{SF1}/orders.parquet') o
        JOIN read_parquet('{SF1}/customer.parquet') c
          ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
        """
    ).fetchall()
    vals = sorted(v for _, v in rows)
    # average rank per value (1-based, ties share the mean rank)
    first, avg_rank = {}, {}
    for i, v in enumerate(vals):
        first.setdefault(v, i + 1)
    from collections import Counter

    cnt = Counter(vals)
    for v, c in cnt.items():
        avg_rank[v] = first[v] + (c - 1) / 2.0
    ra = sum(avg_rank[v] for a, v in rows if a == 1)
    na = sum(a for a, _ in rows)
    u_expected = ra - na * (na + 1) / 2.0
    r = QUERIES["q_mann_whitney"](spark, SF1).collect()[0]
    assert r.n_a == na
    assert r.u_stat == u_expected


def test_anova_f_identities(spark):
    """k/n pinned to fixture shape; F ≥ 0; eta² ∈ [0,1) and consistent
    with F via eta² = F(k−1) / (F(k−1) + N−k)."""
    from legislative_bills_database_spark.plans import QUERIES

    r = QUERIES["q_anova_f"](spark, SF1).collect()[0]
    assert r.k_groups == 5
    assert r.n_total == 1500  # every order joins exactly one customer
    assert r.f_stat >= 0
    assert 0 <= r.eta_sq < 1
    recon = (r.f_stat * (r.k_groups - 1)) / (
        r.f_stat * (r.k_groups - 1) + r.n_total - r.k_groups
    )
    assert abs(recon - r.eta_sq) < 1e-4
    assert r.grand_mean_cents > 0


def test_kendall_tau_bounds_and_counts(spark):
    from legislative_bills_database_spark.plans import QUERIES

    rows = QUERIES["q_kendall_tau"](spark, SF1).collect()
    assert rows
    for r in rows:
        n0 = r.n_years * (r.n_years - 1) // 2
        assert r.concordant + r.discordant <= n0
        assert -1.0 <= r.tau_b <= 1.0


def test_cohens_kappa_identities(spark):
    """kappa reconstructible from the emitted confusion counts."""
    from legislative_bills_database_spark.plans import QUERIES

    r = QUERIES["q_cohens_kappa"](spark, SF1).collect()[0]
    n = r.n11 + r.n10 + r.n01 + r.n00
    assert n == 1500
    chance = (r.n11 + r.n10) * (r.n11 + r.n01) + (r.n01 + r.n00) * (
        r.n10 + r.n00
    )
    expect = (n * (r.n11 + r.n00) - chance) / (n * n - chance)
    assert abs(r.kappa - expect) < 2e-6
    assert -1.0 <= r.kappa <= 1.0


def test_levene_nonnegative(spark):
    from legislative_bills_database_spark.plans import QUERIES

    r = QUERIES["q_levene_test"](spark, SF1).collect()[0]
    assert r.k_groups == 5
    assert r.n_total == 1500
    assert r.f_bf >= 0


def test_runs_test_consistency(spark):
    """Runs count bounded by sign changes + 1; z finite."""
    from legislative_bills_database_spark.plans import QUERIES

    r = QUERIES["q_runs_test"](spark, SF1).collect()[0]
    assert r.n_pos > 0 and r.n_neg > 0
    assert 1 <= r.n_runs <= r.n_pos + r.n_neg
    assert abs(r.z_score) < 50


def test_jackknife_se_positive(spark):
    from legislative_bills_database_spark.plans import QUERIES

    r = QUERIES["q_jackknife_ratio"](spark, SF1).collect()[0]
    assert r.k_groups == 25
    assert r.theta_mean_cents > 0
    assert r.jk_se_cents > 0
    # SE of the mean must be far below the mean itself on this fixture
    assert r.jk_se_cents < r.theta_mean_cents


def test_monetary_unit_sample_certificates(spark):
    """~400 sampling points, certainty stratum never missed, and the
    sample sum is within the top-400-by-value / interval bounds."""
    from legislative_bills_database_spark.plans import QUERIES

    r = QUERIES["q_monetary_unit_sample"](spark, SF1).collect()[0]
    assert r.n_certainty_missed == 0
    assert 350 <= r.n_sampled <= 401
    assert r.interval_cents >= 1
    assert 0 < r.sampled_cents
    # every hit row contains ≥1 sampling point ⇒ sampled value sum is
    # at least n_sampled (each order ≥ 1 cent) and can't exceed total
    assert r.sampled_cents >= r.n_sampled


def test_global_running_sum_matches_window(spark):
    """Two-level prefix scan == the single-partition window on a frame
    small enough to run both."""
    from pyspark.sql import Window, functions as F

    from legislative_bills_database_spark.operators.ordering import (
        global_running_sum,
    )

    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97 + 1).alias("v")
    )
    got = {
        r.k: r.cum
        for r in global_running_sum(df, [F.asc("k")], "v", "cum").collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.k: r.cum
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want
