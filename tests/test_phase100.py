"""Round-13 pins for the ADVICE r12 hardening: boruvka_msf's
partial-forest interlock and the HMM n=1 sequence-boundary guards.

The HMM fixtures never go below 45 events/user, so the n=1 paths
(sequence(2,1) silently yields the DESCENDING [2,1] and reads b0[2]
out of bounds; sequence(1,2,-1) throws 'Illegal sequence boundaries')
were latent — these tests build a 1-event corpus and run the real
queries over it.
"""

from __future__ import annotations

import datetime as dt

import pytest


def _msf(spark, edges, **kw):
    from legislative_bills_database_spark.operators.graph import boruvka_msf

    df = spark.createDataFrame(edges, "src long, dst long, w long")
    return boruvka_msf(df, **kw)


class TestBoruvkaInterlock:
    EDGES = [(1, 2, 5), (2, 3, 3), (3, 4, 7), (1, 4, 9), (5, 6, 1)]

    def test_round_exhaustion_raises_not_partial(self, spark):
        """max_rounds=0 leaves every cross-component edge unprocessed;
        returning the empty forest silently would break the
        'hash-matches Kruskal' certificate — it must raise instead."""
        with pytest.raises(RuntimeError, match="cross-component edges"):
            _msf(spark, self.EDGES, max_rounds=0).collect()

    def test_exhaustion_recheck_passes_when_last_round_finished(self, spark):
        """A path that contracts fully in exactly max_rounds rounds must
        NOT raise: the post-loop recheck sees zero cross edges. Two
        2-node components merge in one Borůvka round."""
        got = _msf(spark, [(1, 2, 4), (5, 6, 2)], max_rounds=1).collect()
        assert sorted((r.src, r.dst, r.w) for r in got) == [
            (1, 2, 4),
            (5, 6, 2),
        ]

    def test_default_budget_solves_path_graph(self, spark):
        """Worst case for Borůvka round count is a path; 32 nodes needs
        5 rounds, comfortably under the raised default of 20."""
        edges = [(i, i + 1, 100 - i) for i in range(1, 32)]
        got = _msf(spark, edges).collect()
        assert len(got) == 31  # a path IS its own spanning tree


@pytest.fixture(scope="module")
def one_event_dir(spark, tmp_path_factory):
    """An events table whose users have exactly ONE event each — the
    n=1 edge the sf fixtures (min 45 events/user) never exercise."""
    d = tmp_path_factory.mktemp("hmm_n1")
    rows = [
        (1, dt.datetime(2024, 3, 1, 10), 101, "view", 1.0, "{}"),
        (2, dt.datetime(2024, 3, 1, 11), 102, "purchase", 2.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return str(d)


class TestHmmSingleEventGuards:
    def test_forward_n1_returns_seed(self, spark, one_event_dir):
        from legislative_bills_database_spark.plans import QUERIES

        got = {
            r.user_id: r
            for r in QUERIES["q_hmm_forward"](spark, one_event_dir).collect()
        }
        assert set(got) == {101, 102}
        for r in got.values():
            assert r.n_events == 1
            # floor-quantized normalization: a0+a1 within 2 of the grid
            assert 99_998 <= r.a0_q + r.a1_q <= 100_000
            assert r.peak_step == 1
            assert r.peak_a1_q == r.a1_q
            assert r.intent_steps in (0, 1)
        # purchase is the strongest intent emission; view favors browse
        assert got[101].a0_q > got[101].a1_q
        assert got[102].a1_q > got[102].a0_q

    def test_posterior_n1_seed_smoothing(self, spark, one_event_dir):
        from legislative_bills_database_spark.plans import QUERIES

        got = {
            r.user_id: r
            for r in QUERIES["q_hmm_posterior"](
                spark, one_event_dir
            ).collect()
        }
        assert set(got) == {101, 102}
        for r in got.values():
            assert r.n_events == 1
            assert r.peak_step == 1
            # with a flat backward message, gamma == the forward filter:
            # hindsight can't flip a single-step belief
            assert r.n_flips == 0
            assert 0 <= r.g1_final <= 100_000
