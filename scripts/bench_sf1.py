#!/usr/bin/env python
"""Scaling bench: the 21 BASELINE.md-comparable headline queries at
sf1.0 (10x sf0.1), with per-query sf1.0/sf0.1 ratios.

VERDICT r5 #7: at sf0.1 many queries are scheduler-bound, so the
100x-design claims rested on plan shape alone. This run turns the
posture into measurements — a query whose ratio is ~O(10) (or less,
where a fixed overhead dominated at sf0.1) scales linearly; anything
superlinear is flagged. Writes BENCH_SF1.json.

Usage: python scripts/bench_sf1.py   (expects scripts/make_sf1.py ran)
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1_DIR = os.path.join(REPO, ".benchdata", "sf1.0")
# heaviest non-baseline plans: iterative graph loops, the CF/jaccard
# self-joins, the hash-certified fixed-point sweeps — the queries whose
# 100x posture most needs a measured scaling point
EXTRA_HEAVY = [
    "q_item_cf_recs", "q_graph_jaccard", "q_cc_labels", "q_sssp",
    "q_pagerank_exact", "q_star_join", "q_closeness",
    "q_frequent_triples",
    # VERDICT r6 #8: every remaining query >2 s at sf0.1 (BENCH_FULL)
    # gets a measured 10x point — streams, graph loops, round-6
    # newcomers — plus the round-7 approx siblings
    "q_stream_join", "q_label_prop", "q_silhouette", "q_bfs_hops",
    "q_leakage_safe_split", "q_stream_sessions", "q_stream_parity",
    "q_kcore", "q_stream_late", "q_triangle_count", "q_stream_dedup",
    "q_quarantine", "q_ivf_sweep", "q_basket_lift", "q_spearman",
    "q_fuzzy_decontaminate",
    "q_graph_jaccard_approx", "q_item_cf_recs_approx",
    "q_kcore_exact", "q_label_prop_exact",
    # round-8/9 newcomers with the heaviest sf0.1 plans — degree-
    # sensitive graph work, the permutation fan-out, the greedy loops
    "q_weighted_jaccard", "q_harmonic_centrality", "q_random_walk",
    "q_hits_scores", "q_clustering_coeff", "q_kruskal_wallis",
    "q_permutation_test", "q_table_fingerprint", "q_mmr_select",
    "q_greedy_coverage", "q_binseg_changepoint", "q_ljung_box",
    # round-10 newcomers with the heaviest sf0.1 plans: the capped
    # weighted-jaccard twin (its exact sibling is the suite's worst
    # skew cell), the temporal-split recommender evaluation pair, the
    # stump split search, and the survival risk-set chain.
    # (q_fuzzy_join is deliberately ABSENT: the sf1 replication keeps
    # each copy's p_names verbatim, so the ed≤2 join's TRUE output is
    # ~95M pairs — 10× sf0.1's 9.5M — and the run OOMs materializing a
    # result that is a fixture artifact, the same class as the
    # verbatim-copy LSH blowup make_sf1.py rotates embeddings to
    # avoid. Its sf0.1 cost is measured in BENCH_TEXTSKEW.json.)
    "q_weighted_jaccard_approx", "q_map_at_k", "q_mrr",
    "q_best_split", "q_logrank",
    # round-11 newcomers with data-sized plans: the ExactSubstr pair
    # (token-count-scale digest shuffles), the FIFO interval join, the
    # zero-shuffle paragraph dedup (linearity control), the global-
    # ntile t-closeness census, and the AQE skew certificate (runs its
    # hot join twice per invocation)
    "q_substr_dup_spans", "q_substr_dedup_strip", "q_fifo_allocation",
    "q_dedup_paragraphs", "q_t_closeness", "q_aqe_skew_census",
    # round-11 phases 69-71 data-sized plans: the bigram-shuffle KN LM,
    # the signed-delta IVM (base agg + delta merge), the two-pass
    # quantized Brandes loop, and the distinct-project IND sweep
    "q_kneser_ney", "q_ivm_join", "q_betweenness_sample",
    "q_inclusion_deps",
    # round-11 phases 72-75 data-sized plans: the multi-chunk seasonal
    # matrix fold (events-scale window + groupBy), the 6-sweep max-plus
    # relaxation, the (lhs,rhs)-grain g3 aggregate over lineitem, and
    # the per-key isotonic array program (calendar-bounded arrays — a
    # linearity control like q_dedup_paragraphs)
    "q_holt_winters", "q_critical_path", "q_approx_fd",
    "q_isotonic_points",
    # phase 76: the 150-candidate broadcast support sweep over the
    # (user, day) sequence frame — the only newcomer whose work grows
    # as candidates × sequences
    "q_seq_patterns",
    # phase 81: per-order brand-duel self-join (basket-bounded fan-out)
    "q_bradley_terry",
    # phases 83-84: events-scale collect + bounded wavefront/max-plus
    # folds (linearity controls like q_isotonic_points)
    "q_dtw", "q_viterbi",
    # round-12 newcomers: wavefront alignment + forward filter
    # (bounded folds, linearity controls), the pair-grain approx-IND
    # sweep over lineitem, and the layout-writing row-group certificate
    "q_needleman", "q_hmm_forward", "q_approx_ind",
    "q_rowgroup_skip_census",
    # phase 94: log-round Borůvka loop (per-round joins over the edge
    # list + component-grain contraction)
    "q_boruvka_mst",
    # round-13 newcomers with data-sized plans: the 1000-term search
    # head-to-head (AC mapInPandas vs folded-OR — the crossover must
    # hold at 10x corpus), the two-pass Kalman fold + the subsequence
    # self-joins (linearity controls), the grid-stencil DBSCAN and
    # the sequential-CUSUM fold, the greedy-matching loop, and the
    # layout-writing bloom census
    "q_multiterm_scale", "q_multiterm_folded", "q_kalman",
    "q_subseq_support", "q_dbscan", "q_page_cusum",
    "q_greedy_matching", "q_parquet_bloom_census", "q_f2_sketch",
    "q_fellegi_sunter", "q_window_topk_census",
    # (q_lof deliberately ABSENT at sf1: its exact all-pairs baseline
    # is CAPPED at vec_id < 1500 by design, so the sf1 point measures
    # the cap, not scaling; the ANN candidate path is the documented
    # scale story, certified by the recall family)
    # round-14 newcomers with data-sized plans: the ER composition
    # (blocked self-join + CC + survivorship window), the SAX/matrix-
    # profile series pipelines (banded self-join for the latter), the
    # cell-capped DBSCAN + its two-pipeline agreement certificate, the
    # MIS loop, the series xcorr + IVM/uplift/bitemporal fact scans,
    # the shard-rank quantile merge, the KMV distinct pre-passes, and
    # the runtime-filter census (runs its join twice per invocation).
    # (q_stream_rate_limit ABSENT like the other stream censuses —
    # wall time is micro-batch overhead by design.)
    "q_er_clusters", "q_sax_motifs", "q_dbscan_capped",
    "q_dbscan_recall", "q_luby_mis", "q_xcorr_matrix",
    "q_kmv_resemblance", "q_matrix_profile", "q_ivm_agg",
    "q_runtime_filter_census", "q_uplift_qini", "q_quantile_merge",
    "q_bitemporal_asof",
]
BASELINE_21 = [
    "q_pivot_count", "q_rowwise_total", "q_fallback_join",
    "q_exact_dedup", "q_near_dedup", "q_simhash", "q_ngram_jaccard",
    "q_embedding_neardup", "q_cosine_topk", "q_ann_lsh_pairs",
    "q_ann_ivf_topk", "q_text_stats", "q_quality_score", "q_sessionize",
    "q_tumbling_window_batch", "q_salted_count", "q_asof_join",
    "q_range_join", "q_near_dedup_corpus", "q_pipeline_legislator_counts",
    "q_pipeline_keyword_search",
]
N_RUNS = 2
# VERDICT r11 #7: the two cells that read >10x in the r11 artifact get
# min-of-3 at BOTH ends (their extra repeats + per-plan sf0.1
# denominators below) so a single co-tenant stall cannot flag a
# linear plan as superlinear
HOT_CELLS = {"q_substr_dedup_strip", "q_item_cf_recs_approx"}


def main() -> None:
    from pyspark.sql import functions as F

    from legislative_bills_database_spark.session import materialize_fully

    from legislative_bills_database_spark.plans import QUERIES
    from legislative_bills_database_spark.session import get_spark

    spark = get_spark(app_name="lbd-bench-sf1", cpus=os.environ.get(
        "SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    for t in ["region", "customer", "orders", "lineitem", "events",
              "documents", "embeddings"]:
        spark.read.parquet(f"{SF1_DIR}/{t}.parquet").count()

    # machine-speed calibration token (same job as bench.py's): lets
    # sf1/sf0.1 ratios be read against the drift denominator when the
    # two sweeps ran under different machine load
    def _calibration() -> float:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(200_000_000).agg(
                F.expr("bit_xor(xxhash64(id))").alias("h")
            ).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    calib = _calibration()
    print(f"  calibration token: {calib:.3f}s", file=sys.stderr)

    timings: dict[str, float] = {}
    for name in BASELINE_21 + EXTRA_HEAVY:
        best = None
        for _ in range(3 if name in HOT_CELLS else N_RUNS):
            # per-PLAN semantics (the bench_skew rationale): clear the
            # similarity-chain memos so each run pays its own chain
            from legislative_bills_database_spark.plans import (
                roundseven_queries as _r7,
            )

            _r7.clear_sim_caches()
            t0 = time.perf_counter()
            df = QUERIES[name](spark, SF1_DIR)
            materialize_fully(df)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"  {name}: {best:.3f}s", file=sys.stderr)

    # ratio vs the most recent sf0.1 full-detail run. The CF/jaccard
    # family is memoized per (applicationId, sf_dir) since round 9, so
    # BENCH_FULL's sweep-marginal cells (~0.05 s checkpoint hits) are
    # NOT per-plan denominators — measure those four per-plan here
    # (cache-cleared min-of-2 at sf0.1, ~1 min) so the scaling ratio
    # compares like with like.
    MEMOIZED = {
        "q_graph_jaccard", "q_graph_jaccard_approx",
        "q_item_cf_recs", "q_item_cf_recs_approx",
        # r10: the weighted twin rides the same memo
        "q_weighted_jaccard_approx",
        # r11 (ADVICE r10 #3): the recommender-eval pair now shares one
        # memoized hits/nrel materialization, so BENCH_FULL's cells for
        # them are sweep-marginal too — without per-plan denominators
        # their sf1/sf0.1 ratios read 74-135x and flag a superlinear
        # cliff that is actually a denominator artifact
        "q_map_at_k", "q_mrr",
    }
    # SAME-SESSION sf0.1 denominators for EVERY timed query (r12
    # hardening): this round measured the machine running 2.45x slower
    # during the BENCH_FULL sweep than during this sf1 sweep (calib
    # 0.575 vs 0.216) with load varying WITHIN sweeps too, so any
    # cross-sweep ratio — even calibration-adjusted — is unreliable on
    # a loud machine. Measuring both ends in one session makes the
    # scaling ratio self-contained; the calibadj column then only
    # corrects residual BENCH_FULL fallbacks (none in a clean run).
    sf01_dir = "/root/testdata/sf0.1"
    perplan01: dict[str, float] = {}
    for name in sorted(set(timings)):
        best = None
        for _ in range(3 if name in HOT_CELLS else N_RUNS):
            from legislative_bills_database_spark.plans import (
                roundseven_queries as _r7,
            )

            _r7.clear_sim_caches()
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf01_dir)
            materialize_fully(df)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        perplan01[name] = round(best, 3)
        print(f"  {name} (sf0.1 per-plan): {best:.3f}s", file=sys.stderr)
    ratios = {}
    ratios_adj = {}
    prev_calib = None
    try:
        with open(os.path.join(REPO, "BENCH_FULL.json")) as fh:
            full = json.load(fh)
        prev = full.get("queries", {})
        prev_calib = full.get("calib_sec")
        prev.update(perplan01)
        ratios = {
            n: round(timings[n] / prev[n], 2)
            for n in timings if prev.get(n)
        }
        # drift-corrected ratio: per-plan sf0.1 denominators were
        # measured THIS run (same machine state as the sf1 sweep), so
        # only BENCH_FULL-sourced denominators get the calib scaling
        if prev_calib:
            ratios_adj = {
                n: round(
                    r / (calib / prev_calib)
                    if n not in perplan01
                    else r,
                    2,
                )
                for n, r in ratios.items()
            }
    except (OSError, json.JSONDecodeError):
        pass
    out = {
        "metric": "baseline21_sf1_wall",
        "value": round(sum(timings[n] for n in BASELINE_21), 3),
        "extra_heavy": {n: timings[n] for n in EXTRA_HEAVY},
        "unit": "sec",
        "sf": 1.0,
        "queries": timings,
        "ratio_vs_sf0.1": ratios,
        "ratio_vs_sf0.1_calibadj": ratios_adj,
        "calib_sec": calib,
        "sf0.1_calib_sec": prev_calib,
        "note": "10x data; ratio ~<=10 = linear-or-better scaling "
                "(fixed overheads amortize); >10 flags superlinearity",
        "sf0.1_per_plan_denominators": perplan01,
    }
    with open(os.path.join(REPO, "BENCH_SF1.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({k: out[k] for k in
                      ("metric", "value", "unit", "sf")}))


if __name__ == "__main__":
    main()
