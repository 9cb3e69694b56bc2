"""Round-11 phase-87 pin: LEFT OUTER stream-stream watermark expiry.

The census must certify the full three-way decomposition on the real
sf0.001 stream: matched rows multiset-equal to batch, null emissions
a phantom-free subset of the batch-unmatched lefts, every withheld
row inside the expiry-horizon tail — and nulls must actually FLOW
(n_null_emitted > 0), since a mis-configured run (no-data micro-batch
suppressed, or micro-batches delivered out of event-time order) fails
exactly there. The mtime-stamping determinism fix is what makes this
pin stable; before it the first run in a session delivered tertiles
out of order and dropped ~40% of the nulls.
"""

from __future__ import annotations

from legislative_bills_database_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def test_stream_outer_join_census_sound(spark):
    r = QUERIES["q_stream_outer_join"](spark, SF).collect()[0]
    assert r.sound
    assert r.matched_equal
    assert r.n_matched_stream == r.n_matched_batch > 0
    assert r.n_phantom == 0
    assert r.n_withheld_outside_tail == 0
    assert 0 < r.n_null_emitted <= r.n_unmatched_batch
    assert r.n_withheld == r.n_unmatched_batch - r.n_null_emitted
    # the semantics this census exists to document: append-mode outer
    # is NOT batch outer while rows sit inside the expiry horizon
    assert r.n_withheld >= 0
