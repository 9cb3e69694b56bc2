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
   distinct frontier points per partition), so the union is folded by a
   bounded two-level fan-in tree: a ``coalesce(fan_in)`` pass first
   reduces each group of partition frontiers to its own frontier, then
   a single task folds the ≤ ``fan_in`` surviving frontiers. The final
   task's input is bounded by ``fan_in`` × max-frontier-size, not by
   the number of scan partitions — at 100k scan tasks the old single
   ``coalesce(1)`` funnel would pull 100k frontiers into one task.

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


def _frontier_fold(minimize: str, maximize: str):
    """mapInPandas fn: fold a partition's Arrow batches into ONE exact
    frontier. Arrow slices the partition into batches of
    spark.sql.execution.arrow.maxRecordsPerBatch rows; a per-batch scan
    would let a point dominated by a row in ANOTHER batch survive. The
    running-frontier fold keeps memory bounded by the true frontier
    size, not the partition's candidate-union size."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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

    return fold


def skyline(
    df: DataFrame, minimize: str, maximize: str, fan_in: int = 16
) -> DataFrame:
    """Rows of ``df`` not dominated under (min ``minimize``,
    max ``maximize``); every phase runs the same exact sort-scan.

    ``fan_in`` bounds the single-task final fold: the intermediate
    ``coalesce(fan_in)`` level reduces each group of partition
    frontiers to its own frontier first (a frontier of frontiers is a
    frontier, so the fold is associative and every level is exact).
    """
    schema = df.schema
    fold = _frontier_fold(minimize, maximize)

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _scan_frontier(pdf, minimize, maximize)

    candidates = df.mapInPandas(local, schema=schema)
    # two-level fan-in tree (coalesce is narrow — no shuffle at either
    # level): level 1 folds partition frontiers in groups, so the final
    # task's input is ≤ fan_in already-reduced frontiers instead of one
    # frontier per scan partition
    level1 = candidates.coalesce(fan_in).mapInPandas(fold, schema=schema)
    return level1.coalesce(1).mapInPandas(fold, schema=schema)
