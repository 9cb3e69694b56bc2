"""Round-11 phase-79 pin: partition-pruning certificate.

The census must prove, from runtime scan metrics (not directory math):
the year-partitioned read under a year filter touches exactly 1 of the
|years| files on disk, the unfiltered read touches all of them, and
the pruned read returns bit-identical rows/cents to the same filter on
the original unpartitioned layout.
"""

from __future__ import annotations

from legislative_bills_database_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def test_partition_pruning_fires_and_preserves_values(spark):
    rows = {
        r.scope: r
        for r in QUERIES["q_partition_pruning_census"](
            spark, SF
        ).collect()
    }
    assert set(rows) == {"pruned", "full", "unpartitioned_filter"}
    pruned, full, anchor = (
        rows["pruned"], rows["full"], rows["unpartitioned_filter"],
    )
    assert full.files_on_disk > 1
    assert full.files_read == full.files_on_disk
    assert pruned.files_read == 1 < pruned.files_on_disk
    assert pruned.partitions_read == 1
    # value parity: pruning changed I/O, not answers
    assert (pruned.rows, pruned.sum_cents) == (
        anchor.rows, anchor.sum_cents,
    )
    assert 0 < pruned.rows < full.rows
