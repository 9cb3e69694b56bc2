"""Declarative data-quality constraints and table snapshot diffing.

The publish-gate pair: ``dq_check`` evaluates a constraint suite
(not-null / unique / range / allowed-values / foreign-key) into one
census row per constraint, and ``snapshot_diff`` classifies every key of
two table versions as added/removed/changed/unchanged — the regression
report a pipeline runs between yesterday's snapshot and today's before
swapping the published view.

Scale posture:

- ``dq_check`` builds ONE lazy plan: each constraint is an aggregate
  (or aggregate-after-join for uniqueness/FK) producing a single row,
  all unioned — no per-constraint driver actions, constraints over the
  same table share the scan via Spark's plan-level reuse.
- ``snapshot_diff`` is one full-outer join on the key with a struct
  comparison on the tracked columns, aggregated to a 4-row census —
  the two scans and one shuffle you cannot avoid, and nothing more.
  At 100 TB both sides are bucketed by key so the join co-locates.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _one(df: DataFrame, name: str, checked, violations) -> DataFrame:
    return df.agg(
        F.lit(name).alias("constraint"),
        checked.cast("long").alias("checked"),
        violations.cast("long").alias("violations"),
    )


def dq_check(df: DataFrame, constraints: list[tuple]) -> DataFrame:
    """Evaluate constraints; returns (constraint, checked, violations).

    Constraint forms:
      ("name", "not_null", col)
      ("name", "unique", col)              — NULLs don't count as dups
      ("name", "range", col, lo, hi)       — inclusive, NULLs violate
      ("name", "allowed", col, [values])   — NULLs violate
      ("name", "foreign_key", col, parent_df, parent_col)
    """
    out = None
    cnt = F.count(F.lit(1))
    for spec in constraints:
        name, kind = spec[0], spec[1]
        if kind == "not_null":
            col = F.col(spec[2])
            row = _one(df, name, cnt, F.sum(col.isNull().cast("long")))
        elif kind == "unique":
            col = F.col(spec[2])
            dups = (
                df.filter(col.isNotNull())
                .groupBy(spec[2])
                .agg(F.count(F.lit(1)).alias("__n"))
            )
            row = _one(
                dups,
                name,
                F.coalesce(F.sum("__n"), F.lit(0)),
                F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)),
            )
        elif kind == "range":
            col, lo, hi = F.col(spec[2]), spec[3], spec[4]
            ok = col.isNotNull() & (col >= lo) & (col <= hi)
            row = _one(df, name, cnt, F.sum((~ok).cast("long")))
        elif kind == "allowed":
            col, values = F.col(spec[2]), spec[3]
            ok = col.isin(values)
            row = _one(df, name, cnt, F.sum((~F.coalesce(ok, F.lit(False))).cast("long")))
        elif kind == "foreign_key":
            col, parent, pk = spec[2], spec[3], spec[4]
            keys = parent.select(F.col(pk).alias("__pk")).distinct()
            j = df.select(F.col(col).alias("__fk")).join(
                keys, F.col("__fk") == F.col("__pk"), "left"
            )
            row = _one(
                j,
                name,
                cnt,
                F.sum(
                    (F.col("__fk").isNotNull() & F.col("__pk").isNull()).cast("long")
                ),
            )
        else:
            raise ValueError(f"unknown constraint kind {kind!r}")
        out = row if out is None else out.unionByName(row)
    return out


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    compare_cols: list[str],
) -> DataFrame:
    """4-row census of the key-level delta between two table versions:
    (status ∈ added|removed|changed|unchanged, n)."""
    o = old.select(
        F.col(key_col).alias("__k"),
        F.struct(*[F.col(c) for c in compare_cols]).alias("__ov"),
    )
    n = new.select(
        F.col(key_col).alias("__nk"),
        F.struct(*[F.col(c) for c in compare_cols]).alias("__nv"),
    )
    j = o.join(n, o["__k"] == n["__nk"], "full_outer")
    status = (
        F.when(F.col("__k").isNull(), F.lit("added"))
        .when(F.col("__nk").isNull(), F.lit("removed"))
        .when(F.col("__ov") != F.col("__nv"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.groupBy(status.alias("status")).agg(F.count(F.lit(1)).alias("n"))


def compression_ratio(
    docs: DataFrame,
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Append zlib ``compressed_bytes / raw_bytes`` per document — the
    classic compressibility quality signal for LLM corpora (near-1.0 =
    high-entropy noise or binary junk, near-0 = templated/repetitive
    boilerplate; both tails are curation targets the length/stopword
    heuristics in ``text_quality_score`` miss).

    Arrow-batched ``pandas_udf`` (one Python call per ~10k-row batch,
    zlib releases the GIL while deflating) — bytes never leave the
    executor, the driver only ever sees aggregates. DEFLATE with a
    pinned ``level`` is deterministic for a given zlib build, so the
    engine-vs-recompute parity is pinned exactly in pytest; there is no
    SQL oracle (DuckDB cannot deflate), so the declared query is
    rows-only by design.
    """
    import zlib

    @F.pandas_udf("long")
    def _zlen(s: pd.Series) -> pd.Series:
        lvl = level
        return s.map(
            lambda t: len(zlib.compress((t or "").encode("utf-8"), lvl))
        )

    raw = F.length(F.encode(F.col(text_col), "utf-8")).cast("long")
    return docs.withColumn("raw_bytes", raw).withColumn(
        "gzip_bytes", _zlen(F.col(text_col))
    )
