"""Pareto skyline (non-dominated frontier) over two objectives.

Query shape the reference's ranking scripts approximate with single-key
sorts (CA_Legislation_Topic_Modeling.R orders bills by one score at a
time): return every row not *dominated* — no other row at least as good
on both objectives and strictly better on one.

Distributed strategy (the classic two-phase skyline):

1. **Local phase** — each partition computes its own skyline with the
   exact 2-D sort-scan: sort by the minimized objective ascending (ties:
   maximized objective descending), keep a row iff it strictly improves
   the running best of the maximized objective, or ties the immediately
   preceding kept row on BOTH objectives (duplicate frontier points
   don't dominate each other). O(n log n), no cross-partition traffic,
   and provably a superset filter: a global skyline point is undominated
   in every subset, so it survives its partition's local scan.
2. **Global phase** — local skylines are tiny (bounded by the number of
   distinct frontier points per partition), so the union is re-scanned
   once more with the same algorithm in a single task.

At 100 TB the local phase does all the discarding at the scan; only
frontier candidates — typically thousands of rows — ever move. The
quadratic NOT EXISTS oracle on ``q_skyline`` is the completeness proof.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def _scan_frontier(
    pdf: pd.DataFrame, minimize: str, maximize: str
) -> pd.DataFrame:
    """Exact 2-D skyline of one pandas frame via sort + linear scan."""
    if pdf.empty:
        return pdf
    pdf = pdf.sort_values(
        [minimize, maximize], ascending=[True, False], kind="mergesort"
    )
    lo = pdf[minimize].to_numpy()
    hi = pdf[maximize].to_numpy()
    keep = []
    best_hi = None
    kept_lo = kept_hi = None
    for i in range(len(pdf)):
        if best_hi is None or hi[i] > best_hi:
            keep.append(i)
            best_hi = hi[i]
            kept_lo, kept_hi = lo[i], hi[i]
        elif lo[i] == kept_lo and hi[i] == kept_hi:
            # exact duplicate of the LAST KEPT frontier point (dups sort
            # adjacently): mutually non-dominating, both belong. Compare
            # against the kept point, not the previous row — a duplicate
            # of a *dominated* row is dominated too.
            keep.append(i)
    return pdf.iloc[keep]


def skyline(df: DataFrame, minimize: str, maximize: str) -> DataFrame:
    """Rows of ``df`` not dominated under (min ``minimize``,
    max ``maximize``); both phases run the same exact sort-scan."""
    schema = df.schema

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _scan_frontier(pdf, minimize, maximize)

    def global_scan(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        # Arrow slices the coalesced partition into batches of
        # spark.sql.execution.arrow.maxRecordsPerBatch rows; a per-batch
        # scan would let a point dominated by a row in ANOTHER batch
        # survive. Fold batches into a running frontier instead: after
        # each batch the carried frame is the exact skyline of
        # everything seen, so memory stays bounded by the true frontier
        # size, not the candidate-union size.
        frontier: pd.DataFrame | None = None
        for pdf in batches:
            if pdf.empty:
                continue
            merged = (
                pdf
                if frontier is None
                else pd.concat([frontier, pdf], ignore_index=True)
            )
            frontier = _scan_frontier(merged, minimize, maximize)
        if frontier is not None:
            yield frontier

    candidates = df.mapInPandas(local, schema=schema)
    # global pass over the (small) candidate union in one task — the
    # coalesce is safe precisely because phase 1 already discarded
    # everything dominated within any partition
    return candidates.coalesce(1).mapInPandas(global_scan, schema=schema)
