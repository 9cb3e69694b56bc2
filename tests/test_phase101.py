"""Round-13 pins (phases 100-102): Aho-Corasick dictionary search,
quantized-exact Kalman filter + RTS smoother, transformWithState
census. Oracle parity runs in test_oracle_parity/preflight; these pin
what the hash can't express — algorithm-level replays, the
variable-length-dictionary parity the uniform-3 oracle can't cover,
and the environment-classified streaming refusals.
"""

from __future__ import annotations

import datetime as dt

import pytest

from tests.conftest import SF_DIR


class TestAhoCorasick:
    def test_textbook_overlaps_and_nesting(self, spark):
        """The canonical he/she/his/hers dictionary: output links must
        report nested ('he' inside 'she'/'hers') and overlapping
        occurrences. 'ushers' contains she, he, hers."""
        from legislative_bills_database_spark.operators.search import (
            ahocorasick_hit_census,
        )

        df = spark.createDataFrame(
            [(1, "ushers"), (2, "SHE sells"), (3, "xyz"), (4, None)],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: r
            for r in ahocorasick_hit_census(
                df, "doc_id", "text", ["he", "she", "his", "hers"]
            ).collect()
        }
        assert set(got) == {1, 2}  # no-hit and NULL rows drop
        assert got[1].n_hits == 3 and got[1].n_terms == 3
        assert (got[1].first_term, got[1].last_term) == ("he", "she")
        assert got[2].n_hits == 2  # case-insensitive: she + nested he
        assert got[2].n_terms == 2

    def test_self_overlapping_term_counts_every_position(self, spark):
        from legislative_bills_database_spark.operators.search import (
            ahocorasick_hit_census,
        )

        df = spark.createDataFrame(
            [(1, "aaaa")], "doc_id long, text string"
        )
        row = ahocorasick_hit_census(df, "doc_id", "text", ["aa"]).collect()[0]
        assert row.n_hits == 3  # positions 1,2,3 — overlap-exact

    def test_variable_length_parity_vs_folded_or(self, spark):
        """The reference's OWN 15 affordability stems
        (legiscan_search_all_bills.R:52) — variable lengths 3..12, the
        case the uniform-3 oracle twin can't certify: the set of
        matching docs must equal the folded-OR plan's, and every
        n_terms must count exactly the stems that substring-match."""
        from legislative_bills_database_spark.operators.search import (
            ahocorasick_hit_census,
            multiterm_search,
        )

        stems = [
            "affordab", "cost", "saving", "competiti", "fee", "charge",
            "burden", "deposit", "subscription", "cancellation",
            "credit", "consumer", "debt", "price", "discount",
        ]
        texts = [
            (1, "An act to reduce housing COSTS and rental fees"),
            (2, "Affordability of consumer credit and debt relief"),
            (3, "subscription cancellation rights; service charges"),
            (4, "competitive pricing disclosures; deposits"),
            (5, "an unrelated water rights measure"),
            (6, "feedback on discounted transit fares"),  # fee⊂feedback
        ]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        ac = {
            r.doc_id: r
            for r in ahocorasick_hit_census(
                df, "doc_id", "text", stems
            ).collect()
        }
        folded = {
            r.doc_id
            for r in multiterm_search(df, ["text"], stems).collect()
        }
        assert set(ac) == folded
        # per-doc term sets against a python reference count
        for did, text in texts:
            want = {s for s in stems if s in text.lower()}
            if want:
                assert ac[did].n_terms == len(want), did
                assert ac[did].first_term == min(want), did
                assert ac[did].last_term == max(want), did
            else:
                assert did not in ac

    def test_dictionary_is_1000_prefix_free_trigrams(self):
        from legislative_bills_database_spark.plans.roundthirteen_queries import (
            _MT_TERMS,
        )

        assert len(_MT_TERMS) == 1000
        assert all(len(t) == 3 for t in _MT_TERMS)  # uniform ⇒ prefix-free
        assert _MT_TERMS == sorted(set(_MT_TERMS))


def _py_kalman(zs, g=100_000, q=100, r=400, p1=400):
    """Driver-side integer replay of the exact quantized recursion."""

    def td(a, b):  # trunc toward zero, python ints
        quo = abs(a) // abs(b)
        return quo if (a >= 0) == (b >= 0) else -quo

    fm, fp = [zs[0]], [p1]
    for z in zs[1:]:
        ppred = fp[-1] + q
        kq = td(ppred * g, ppred + r)
        fm.append(fm[-1] + td(kq * (z - fm[-1]), g))
        fp.append(td((g - kq) * ppred, g))
    ms = [fm[-1]]
    for k in range(len(zs) - 2, -1, -1):
        cq = td(fp[k] * g, fp[k] + q)
        ms.insert(0, fm[k] + td(cq * (ms[0] - fm[k]), g))
    return fm, fp, ms


class TestKalman:
    def test_integer_replay_exact(self, spark):
        """The full quantized two-pass recursion replayed in python
        ints must reproduce every output column for every user."""
        from pyspark.sql import functions as F

        from legislative_bills_database_spark.plans import QUERIES

        events = spark.read.parquet(f"{SF_DIR}/events.parquet")
        series = {
            r.user_id: [int(round(v * 100)) for v in r.vs]
            for r in events.groupBy("user_id")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "value")
                        )
                    ),
                    lambda s: s["value"],
                ).alias("vs")
            )
            .collect()
        }
        got = {
            r.user_id: r
            for r in QUERIES["q_kalman"](spark, SF_DIR).collect()
        }
        assert set(got) == set(series)
        for uid, zs in series.items():
            fm, fp, ms = _py_kalman(zs)
            r = got[uid]
            assert r.m_final == fm[-1], uid
            assert r.p_final == fp[-1], uid
            assert r.ms_first == ms[0], uid
            diffs = [m - f for m, f in zip(ms, fm)]
            assert r.n_moves == sum(1 for d in diffs if d != 0), uid
            assert r.max_abs_adj == max(abs(d) for d in diffs), uid

    def test_quantized_tracks_float_kalman(self, spark):
        """The 10⁵-grid quantization must stay within a few cents of
        the float filter/smoother — the grid is 1e-5 relative on the
        gain, so drift over ≤200 steps is bounded."""
        import numpy as np

        from legislative_bills_database_spark.plans import QUERIES

        rows = QUERIES["q_kalman"](spark, SF_DIR).limit(20).collect()
        events = spark.read.parquet(f"{SF_DIR}/events.parquet")
        import pyspark.sql.functions as F

        for r in rows:
            vs = [
                float(x.value)
                for x in events.filter(F.col("user_id") == r.user_id)
                .orderBy("ts", "event_id")
                .select("value")
                .collect()
            ]
            zs = np.array([round(v * 100) for v in vs], dtype=float)
            m, p = zs[0], 400.0
            fm = [m]
            fps = [p]
            for z in zs[1:]:
                pp = p + 100.0
                k = pp / (pp + 400.0)
                m = m + k * (z - m)
                p = (1 - k) * pp
                fm.append(m)
                fps.append(p)
            msf = [fm[-1]]
            for k in range(len(zs) - 2, -1, -1):
                c = fps[k] / (fps[k] + 100.0)
                msf.insert(0, fm[k] + c * (msf[0] - fm[k]))
            # each trunc-div step biases ≤1 toward zero; the forward
            # pass's bias decays by (1-K)≈0.44/step, the backward one
            # by C≈0.31/step from the far end — geometric sums bound
            # the drift at ~2 and ~1.5 cents plus gain-grid wobble;
            # measured ≤2 (filter) / ≤5 (smoother) at sf0.001
            assert abs(r.m_final - fm[-1]) <= 5, r.user_id
            assert abs(r.ms_first - msf[0]) <= 15, r.user_id

    def test_p_sequence_reaches_riccati_fixed_point(self, spark):
        """P's recursion is data-independent; the steady state solves
        P = (1-K)(P+Q) with K=(P+Q)/(P+Q+R) — quantized, every user
        must land on the same p_final."""
        from legislative_bills_database_spark.plans import QUERIES

        pf = {
            r.p_final
            for r in QUERIES["q_kalman"](spark, SF_DIR).collect()
        }
        assert len(pf) == 1
        (p,) = pf
        # fixed point of the exact quantized recursion
        fm, fp, _ = _py_kalman([0] * 50)
        assert p == fp[-1]

    def test_single_event_user_guard(self, spark, tmp_path):
        """n=1: both folds fall back to seeds — smoother == filter ==
        first observation, no crash (the r12 sequence-boundary class)."""
        from legislative_bills_database_spark.plans import QUERIES

        d = tmp_path / "kal_n1"
        spark.createDataFrame(
            [
                (1, dt.datetime(2024, 3, 1, 10), 7, "view", 1.25, "{}"),
            ],
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        ).write.parquet(f"{d}/events.parquet")
        row = QUERIES["q_kalman"](spark, str(d)).collect()[0]
        assert row.n_events == 1
        assert row.m_final == row.ms_first == 125
        assert row.p_final == 400
        assert row.n_moves == 0 and row.max_abs_adj == 0


class TestTwsCensus:
    @pytest.fixture(scope="class")
    def census(self, spark):
        from legislative_bills_database_spark.plans import QUERIES

        return {
            (r.api, r.provider): r
            for r in QUERIES["q_stream_tws_totals"](
                spark, "/root/testdata/sf0.001"
            ).collect()
        }

    def test_legacy_api_green_under_rocksdb(self, census):
        r = census[("applyInPandasWithState", "rocksdb")]
        assert r.ran and r.batch_equal and r.failure is None
        assert r.n_users > 0

    def test_tws_rows_classified_or_green(self, census):
        """In a protobuf-less environment both tws attempts must be
        classified python-worker-protobuf-missing; if this environment
        ever gains protobuf, the rocksdb row must be a REAL green
        batch-diff and the heap row a provider rejection — this pin
        flips loudly instead of rotting."""
        try:
            import importlib.util

            have = (
                importlib.util.find_spec("google.protobuf") is not None
            )
        except ModuleNotFoundError:
            have = False
        rock = census[("transformWithStateInPandas", "rocksdb")]
        heap = census[("transformWithStateInPandas", "hdfs-heap")]
        if not have:
            assert not rock.ran
            assert rock.failure == "python-worker-protobuf-missing"
            assert not heap.ran
            assert heap.failure == "python-worker-protobuf-missing"
        else:
            assert rock.ran and rock.batch_equal
            assert not heap.ran  # RocksDB-only API
