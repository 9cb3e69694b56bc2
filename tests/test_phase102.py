"""Round-13 pins (phases 103-106): sequential CUSUM, AMS F2 sketch,
Fellegi-Sunter linkage, grid DBSCAN. Oracle parity runs in
test_oracle_parity/preflight; these pin the algorithm-level invariants
the hash can't express.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


class TestPageCusum:
    def test_planted_step_alarm_timing(self, spark, tmp_path):
        """A planted +60% level shift on day 20 must raise the UP alarm
        within a few days of onset and never the DOWN alarm; a stable
        twin type must stay silent. Integer replay of the recursion
        doubles as the expected-value computation."""
        import datetime as dt

        from legislative_bills_database_spark.plans import QUERIES

        rows = []
        eid = 0
        for day in range(1, 31):
            for i in range(50 if day < 20 else 80):  # 'shift' type
                eid += 1
                rows.append(
                    (eid, dt.datetime(2024, 1, day, 6), 1, "shift", 1.0, "{}")
                )
            for i in range(50):  # 'flat' type
                eid += 1
                rows.append(
                    (eid, dt.datetime(2024, 1, day, 7), 2, "flat", 1.0, "{}")
                )
        d = tmp_path / "cusum_step"
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        ).write.parquet(f"{d}/events.parquet")
        got = {
            r.event_type: r
            for r in QUERIES["q_page_cusum"](spark, str(d)).collect()
        }
        shift, flat = got["shift"], got["flat"]
        # per-mille deviation after the step: 7000·80//350 − 1000 = 600
        # per day, minus slack 50 → S⁺ grows 550/day, crosses 400 on
        # the FIRST post-shift day
        assert shift.first_up == 20
        assert shift.first_dn == 0
        assert shift.max_sn == 0
        assert shift.n_alarm == 11  # days 20..30 # noqa: ERA001
        assert flat.first_up == 0 and flat.first_dn == 0
        assert flat.n_alarm == 0 and flat.max_sp == 0

    def test_fixture_types_all_present_and_bounded(self, spark):
        from legislative_bills_database_spark.plans import QUERIES

        rows = QUERIES["q_page_cusum"](spark, SF_DIR).collect()
        assert len(rows) == 5  # every event type has a baseline week
        for r in rows:
            assert r.base > 0
            assert r.max_sp >= 0 and r.max_sn >= 0
            # fold covers days 8..30 (the dense grid is 30 days), 23 iterations
            assert 0 <= r.n_alarm <= 23


class TestF2Sketch:
    def test_error_within_variance_bound(self, spark):
        """Var[mean of n estimators] ≤ 2F₂²/n ⇒ sd ≤ F₂·√(2/16) ≈
        0.354·F₂. Pin at 3 sd — a fixed-hash sketch either sits inside
        this forever or the implementation is wrong."""
        from legislative_bills_database_spark.plans import QUERIES

        r = QUERIES["q_f2_sketch"](spark, SF_DIR).collect()[0]
        assert r.n_estimators == 16
        assert r.f2_exact > 0
        assert r.rel_err_ppm <= int(3 * 0.354 * 1_000_000)

    def test_exact_f2_matches_python(self, spark):
        from collections import Counter

        from legislative_bills_database_spark.plans import QUERIES

        events = spark.read.parquet(f"{SF_DIR}/events.parquet")
        counts = Counter(
            r.user_id for r in events.select("user_id").collect()
        )
        want = sum(c * c for c in counts.values())
        r = QUERIES["q_f2_sketch"](spark, SF_DIR).collect()[0]
        assert r.f2_exact == want

    def test_signs_are_balanced_ish(self, spark):
        """md5 parity should split keys ~50/50 per estimator — a
        degenerate sign function (all +1) would make Z_i = Σf and the
        estimator useless. |Z_i| < Σf for every estimator proves signs
        actually alternate."""
        from pyspark.sql import functions as F

        from legislative_bills_database_spark.plans import QUERIES  # noqa: F401

        events = spark.read.parquet(f"{SF_DIR}/events.parquet")
        total = events.count()
        # recompute one estimator driver-side
        import hashlib

        keys = [
            (str(r.k), r.c)
            for r in events.groupBy(
                F.col("user_id").cast("string").alias("k")
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ]
        for i in ("0", "7", "15"):
            z = sum(
                (1 - 2 * (int(hashlib.md5(f"{k}_{i}".encode()).hexdigest()[0], 16) % 2)) * c
                for k, c in keys
            )
            assert abs(z) < total


class TestFellegiSunter:
    def test_score_space_and_partition(self, spark):
        """Scores must come from the 16-combo lattice of the weight
        literals, and the verdict must be a function of score."""
        from itertools import product

        from legislative_bills_database_spark.plans import QUERIES
        from legislative_bills_database_spark.plans.roundthirteen_queries import (
            _FS_MATCH,
            _FS_POSSIBLE,
            _FS_WA,
            _FS_WD,
        )

        lattice = {
            sum(wa if bit else wd for bit, wa, wd in zip(bits, _FS_WA, _FS_WD))
            for bits in product((0, 1), repeat=4)
        }
        rows = QUERIES["q_fellegi_sunter"](spark, SF_DIR).collect()
        assert rows
        for r in rows:
            assert r.score in lattice
            want = (
                "match"
                if r.score >= _FS_MATCH
                else "possible"
                if r.score >= _FS_POSSIBLE
                else "non-match"
            )
            assert r.verdict == want
            assert r.n_pairs > 0

    def test_pair_count_matches_blocking_math(self, spark):
        """Σ n_pairs must equal Σ_blocks C(|block|, 2) — the blocking
        arithmetic the 100 TB posture is built on."""
        from pyspark.sql import functions as F

        from legislative_bills_database_spark.plans import QUERIES

        cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
        blocks = (
            cust.groupBy("c_nationkey", "c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        want = sum(b.n * (b.n - 1) // 2 for b in blocks)
        got = sum(
            r.n_pairs
            for r in QUERIES["q_fellegi_sunter"](spark, SF_DIR).collect()
        )
        assert got == want
        assert want < 1_000_000_000  # far below the refusal cliff


class TestDbscan:
    @pytest.fixture(scope="class")
    def result(self, spark):
        from legislative_bills_database_spark.plans import QUERIES

        return QUERIES["q_dbscan"](spark, SF_DIR).collect()

    def test_partition_and_roles(self, spark, result):
        n_emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
        assert len(result) == n_emb  # every point exactly once
        roles = {r.role for r in result}
        assert roles == {"core", "border", "noise"}
        for r in result:
            assert (r.cluster is None) == (r.role == "noise")

    def test_core_semantics_bruteforce(self, spark, result):
        """Core ⟺ ≥ minPts points within eps (incl. self), recomputed
        brute-force in numpy — certifies the grid stencil found every
        neighbor (completeness), not just the ones the oracle hash
        already covers at this SF."""
        import numpy as np

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
        ids = np.array([r.vec_id for r in emb])
        xy = np.array(
            [
                [round(float(r.embedding[0]) * 1000), round(float(r.embedding[1]) * 1000)]
                for r in emb
            ],
            dtype=np.int64,
        )
        d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, 10**9)
        n_nb = (d2 <= 400).sum(1)
        want_core = {int(i) for i, n in zip(ids, n_nb) if n >= 4}
        got_core = {r.vec_id for r in result if r.role == "core"}
        assert got_core == want_core

    def test_labels_are_component_minima(self, result):
        """Every cluster label equals the min vec_id among its CORE
        members (deterministic labeling contract)."""
        from collections import defaultdict

        by_cluster = defaultdict(list)
        for r in result:
            if r.role == "core":
                by_cluster[r.cluster].append(r.vec_id)
        assert by_cluster
        for label, members in by_cluster.items():
            assert label == min(members)

    def test_cell_occupancy_far_below_cliff(self, spark):
        """Stencil fan-out is 9·max-occupancy per point; the fixture
        must sit far below anything quadratic-shaped."""
        from pyspark.sql import functions as F

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        pts = emb.select(
            F.round(F.element_at("embedding", 1).cast("double") * 1000)
            .cast("long")
            .alias("x"),
            F.round(F.element_at("embedding", 2).cast("double") * 1000)
            .cast("long")
            .alias("y"),
        )
        occ = (
            pts.groupBy(
                F.floor((F.col("x") + (1 << 20)) / 20).alias("cx"),
                F.floor((F.col("y") + (1 << 20)) / 20).alias("cy"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n"))
            .collect()[0][0]
        )
        assert occ <= 1000  # 9·occ² pairs/cell — nowhere near 2e9


class TestGreedyMatching:
    def _match(self, spark, edges, **kw):
        from legislative_bills_database_spark.operators.graph import (
            greedy_maximal_matching,
        )

        df = spark.createDataFrame(edges, "src long, dst long, w long")
        return sorted(
            (r.src, r.dst, r.w)
            for r in greedy_maximal_matching(df, **kw).collect()
        )

    def test_equals_sequential_greedy_replay(self, spark):
        """The fixture co-purchase graph: parallel locally-dominant
        rounds == python sequential greedy over (w, src, dst) order."""
        from legislative_bills_database_spark.plans import QUERIES
        from legislative_bills_database_spark.plans.roundfive_queries import (
            _copurchase_edges,
        )

        edges = sorted(
            (r.w, r.src, r.dst)
            for r in _copurchase_edges(spark, SF_DIR).collect()
        )
        matched: set[int] = set()
        want = []
        for w, s, d in edges:
            if s not in matched and d not in matched:
                matched.update((s, d))
                want.append((s, d, w))
        got = {
            (r.src, r.dst, r.w)
            for r in QUERIES["q_greedy_matching"](spark, SF_DIR).collect()
        }
        assert got == set(want)

    def test_is_matching_and_maximal(self, spark):
        from collections import Counter

        from legislative_bills_database_spark.plans import QUERIES
        from legislative_bills_database_spark.plans.roundfive_queries import (
            _copurchase_edges,
        )

        rows = QUERIES["q_greedy_matching"](spark, SF_DIR).collect()
        nodes = Counter()
        for r in rows:
            nodes[r.src] += 1
            nodes[r.dst] += 1
        assert all(c == 1 for c in nodes.values())  # a matching
        # maximal: every graph edge touches a matched node
        for e in _copurchase_edges(spark, SF_DIR).collect():
            assert e.src in nodes or e.dst in nodes

    def test_monotone_path_worst_case(self, spark):
        """A path with increasing weights resolves ONE edge per round
        (the adversarial case the docstring names): greedy picks the
        odd edges."""
        edges = [(i, i + 1, i) for i in range(1, 10)]
        got = self._match(spark, edges)
        assert got == [
            (1, 2, 1), (3, 4, 3), (5, 6, 5), (7, 8, 7), (9, 10, 9),
        ]

    def test_round_exhaustion_raises(self, spark):
        import pytest as _pytest

        edges = [(i, i + 1, i) for i in range(1, 10)]
        with _pytest.raises(RuntimeError, match="non-maximal"):
            self._match(spark, edges, max_rounds=1)


class TestParquetBloomCensus:
    @pytest.fixture(scope="class")
    def census(self, spark):
        from legislative_bills_database_spark.plans import QUERIES

        return {
            (r.layout, r.probe): r
            for r in QUERIES["q_parquet_bloom_census"](
                spark, "/root/testdata/sf0.01"
            ).collect()
        }

    def test_interior_probes_bloom_prunes_stats_cannot(self, census):
        """Interior rank keys sit inside every row group's [min,max]:
        the plain layout decodes the WHOLE file, the bloom layout at
        most ~2 row groups."""
        for probe in ("k_q1", "k_med", "k_q3"):
            plain = census[("plain", probe)]
            bloom = census[("bloom", probe)]
            assert plain.n_rowgroups > 1  # sf0.01: multi-group file
            assert plain.scan_rows == plain.total_rows  # full decode
            per_group = plain.total_rows / plain.n_rowgroups
            assert bloom.scan_rows <= 2 * per_group
            assert bloom.scan_rows < plain.scan_rows

    def test_absent_key_stats_prune_both(self, census):
        for layout in ("plain", "bloom"):
            r = census[(layout, "k_absent")]
            assert r.scan_rows == 0 and r.result_rows == 0

    def test_value_parity_across_layouts(self, census):
        """Layouts must agree on WHAT — only decoded I/O differs."""
        for probe in ("k_min", "k_max", "k_q1", "k_med", "k_q3"):
            p = census[("plain", probe)]
            b = census[("bloom", probe)]
            assert (p.result_rows, p.cents) == (b.result_rows, b.cents)
            assert p.result_rows == 1


class TestLof:
    def test_numpy_replay_exact(self, spark):
        """Full quantized LOF pipeline replayed in python ints."""
        import numpy as np

        from legislative_bills_database_spark.plans import QUERIES

        emb = [
            r
            for r in spark.read.parquet(
                f"{SF_DIR}/embeddings.parquet"
            ).collect()
            if r.vec_id < 1500
        ]
        ids = [r.vec_id for r in emb]
        xy = np.array(
            [
                [round(float(r.embedding[0]) * 1000), round(float(r.embedding[1]) * 1000)]
                for r in emb
            ],
            dtype=np.int64,
        )
        n = len(ids)
        d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
        order = {i: sorted((int(d2[i][j]), ids[j], j) for j in range(n) if j != i)[:5] for i in range(n)}
        kdist = {ids[i]: max(d for d, _, _ in order[i]) for i in range(n)}
        nk = {ids[i]: len(order[i]) for i in range(n)}
        sr = {
            ids[i]: sum(max(kdist[bid], d) for d, bid, _ in order[i])
            for i in range(n)
        }
        lrd = {a: (nk[a] * 10**9) // max(sr[a], 1) for a in sr}
        want = {}
        for i in range(n):
            a = ids[i]
            slrd = sum(lrd[bid] for _, bid, _ in order[i])
            want[a] = (slrd * 10**6) // (nk[a] * max(lrd[a], 1))
        got = {
            r.vec_id: r
            for r in QUERIES["q_lof"](spark, SF_DIR).collect()
        }
        assert set(got) == set(want)
        for a, lof in want.items():
            assert got[a].lof_q == lof, a
            assert got[a].kdist2 == kdist[a], a
            assert got[a].lrd_q == lrd[a], a

    def test_scores_center_on_one(self, spark):
        """LOF ≈ 1 for in-density points: the bulk of the corpus must
        sit near 10⁶ on the G2 grid, with a tail above."""
        from legislative_bills_database_spark.plans import QUERIES

        rows = QUERIES["q_lof"](spark, SF_DIR).collect()
        assert rows
        med = sorted(r.lof_q for r in rows)[len(rows) // 2]
        assert 800_000 <= med <= 1_300_000
        n_out = sum(r.is_outlier for r in rows)
        assert 0 < n_out < len(rows) // 4  # flagged set is a minority


class TestSubseqSupport:
    def test_hand_journey_replay(self, spark, tmp_path):
        """Journeys with known gappy containments: view..purchase with
        a gap must count; purchase-before-view must not."""
        import datetime as dt

        from legislative_bills_database_spark.plans import QUERIES

        t0 = dt.datetime(2024, 1, 1)

        def mk(uid, types):
            return [
                (uid * 100 + i, t0 + dt.timedelta(minutes=i), uid, ty, 1.0, "{}")
                for i, ty in enumerate(types)
            ]

        rows = (
            mk(1, ["view", "click", "purchase"])   # view>purchase yes
            + mk(2, ["purchase", "view"])           # view>purchase no
            + mk(3, ["view", "view", "purchase"])   # also view>view
        )
        d = tmp_path / "subseq"
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        ).write.parquet(f"{d}/events.parquet")
        got = {
            (r.length, r.seq): r.n_users
            for r in QUERIES["q_subseq_support"](spark, str(d)).collect()
        }
        assert got[(2, "view>purchase")] == 2  # users 1 and 3
        assert got[(2, "purchase>view")] == 1  # user 2 only
        assert got[(2, "view>view")] == 1      # user 3 only
        assert got[(3, "view>view>purchase")] == 1
        assert (3, "purchase>view>purchase") not in got

    def test_support_monotonicity(self, spark):
        """support(a>b>c) ≤ support(a>b) and ≤ support(b>c): dropping
        an element never loses a supporting user."""
        from legislative_bills_database_spark.plans import QUERIES

        got = {
            r.seq: r.n_users
            for r in QUERIES["q_subseq_support"](spark, SF_DIR).collect()
        }
        triples = [s for s in got if s.count(">") == 2]
        assert triples
        for s in triples:
            a, b, c = s.split(">")
            assert got[s] <= got[f"{a}>{b}"]
            assert got[s] <= got[f"{b}>{c}"]


class TestWindowTopkCensus:
    def test_pushdown_cuts_shuffle_and_preserves_values(self, spark):
        from legislative_bills_database_spark.plans import QUERIES

        got = {
            r.mode: r
            for r in QUERIES["q_window_topk_census"](
                spark, SF_DIR
            ).collect()
        }
        on, off = got["pushdown-on"], got["pushdown-off"]
        n_orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
        assert on.n_wgl_nodes > 0 and off.n_wgl_nodes == 0
        assert off.shuffle_records >= n_orders  # every fact row shuffled
        assert on.shuffle_records < off.shuffle_records / 3
        assert (on.result_rows, on.cents) == (off.result_rows, off.cents)


class TestFellegiBlocked:
    def test_match_set_is_band_restricted_coarse(self, spark):
        """Fine blocking keeps all four scoring fields (band trivially
        agrees inside a block, +2000 constant), so its score histogram
        must equal the coarse histogram restricted to band-agreeing
        pairs — i.e. every fine (score, n) ≤ coarse (score, n), and
        fine scores all carry the +2000 band term."""
        from legislative_bills_database_spark.plans import QUERIES
        from legislative_bills_database_spark.plans.roundthirteen_queries import (
            _FS_WA,
            _FS_WD,
        )

        coarse = {
            r.score: r.n_pairs
            for r in QUERIES["q_fellegi_sunter"](spark, SF_DIR).collect()
        }
        fine = {
            r.score: r.n_pairs
            for r in QUERIES["q_fellegi_blocked"](spark, SF_DIR).collect()
        }
        assert fine  # escape produces pairs on the fixture
        base = _FS_WA[0]  # band term always +2000 in fine blocks
        lattice_wo_band = {
            base + sum(w)
            for w in __import__("itertools").product(
                *[(wa, wd) for wa, wd in zip(_FS_WA[1:], _FS_WD[1:])]
            )
        }
        for score, n in fine.items():
            assert score in lattice_wo_band
            assert n <= coarse.get(score, 0)

    def test_retained_match_fraction_measured(self, spark):
        """The trade's cost, pinned at sf0.01 (sf0.001's 150 customers
        produce ZERO match-verdict pairs — blocks of ~6 never agree on
        two high-weight fields): fine blocking loses exactly the
        coarse MATCH pairs whose bands differ. Measured 2026-08-16:
        coarse 11 matches → fine 10 (91% retained) while candidate
        pairs drop 8965 → 1002 (9×)."""
        from legislative_bills_database_spark.plans import QUERIES
        from legislative_bills_database_spark.plans.roundthirteen_queries import (
            _FS_MATCH,
        )

        sf = "/root/testdata/sf0.01"
        coarse = QUERIES["q_fellegi_sunter"](spark, sf).collect()
        fine = QUERIES["q_fellegi_blocked"](spark, sf).collect()
        coarse_m = sum(r.n_pairs for r in coarse if r.score >= _FS_MATCH)
        fine_m = sum(r.n_pairs for r in fine if r.score >= _FS_MATCH)
        assert 0 < fine_m <= coarse_m
        assert fine_m / coarse_m >= 0.7
        # the whole point of the escape: an order fewer candidates
        assert sum(r.n_pairs for r in fine) * 5 < sum(
            r.n_pairs for r in coarse
        )
