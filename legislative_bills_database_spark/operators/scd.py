"""Slowly-changing-dimension (SCD type 2) merge and referential-integrity
audit — the warehouse-maintenance ops around the reference's dimension
handling.

The reference rebuilds its legislator dimension from scratch every run
and keeps only the latest record per person (legislator_bill_counts_run.R:
63-67 — the `q_dedup_keep_latest` semantics). SCD2 is the production
version of that: instead of discarding history, each change closes the
current version row and opens a new one, so facts can join to the
dimension *as of* their own date (the as-of join in operators/temporal.py
is the natural consumer).

Scale posture:

- the merge is ONE shuffle on the business key: union(current, updates)
  → per-key window to version-order rows → derive valid_from/valid_to
  with lead(). No driver loop, no per-row MERGE statements.
- unchanged keys stream through the window untouched; at 100 TB the
  dimension is bucketed by key (sources/cache.stage_bucketed) and the
  merge reuses the layout.
- the FK audit is two left-anti joins; each is a plain shuffled (or
  broadcast, when the parent is dim-sized) hash join, and the output is
  a per-relationship census row, not the orphan rows themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str = "effective_ts",
) -> DataFrame:
    """Fold ``updates`` (key, attrs, effective_ts) into an SCD2 dimension.

    ``current`` holds version rows (key, attrs, valid_from, valid_to,
    is_current) — pass an empty frame (or one built by this function) to
    bootstrap. Consecutive versions with IDENTICAL attributes are
    collapsed (a no-op update does not open a new version).

    Returns the full version history: (key, *attrs, valid_from, valid_to,
    is_current), valid_to NULL on the open version.
    """
    cur_rows = current.select(
        key_col, *attr_cols, F.col("valid_from").alias(ts_col)
    )
    upd_rows = updates.select(key_col, *attr_cols, F.col(ts_col))
    merged = cur_rows.unionByName(upd_rows)

    w = Window.partitionBy(key_col).orderBy(ts_col, *attr_cols)
    # drop consecutive duplicates: a version opens only when attributes
    # actually change vs the previous version in time order
    attr_struct = F.struct(*[F.col(c) for c in attr_cols])
    changed = (
        F.lag(attr_struct).over(w).isNull()
        | (F.lag(attr_struct).over(w) != attr_struct)
    )
    versions = merged.withColumn("__chg", changed).filter(F.col("__chg"))
    w2 = Window.partitionBy(key_col).orderBy(ts_col, *attr_cols)
    return (
        versions.select(
            key_col,
            *attr_cols,
            F.col(ts_col).alias("valid_from"),
            F.lead(ts_col).over(w2).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def fk_orphan_audit(
    pairs: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity census over (name, child, fk, parent, pk)
    relationships: per relationship, total child rows, orphan rows (FK
    value with no parent, NULLs excluded), and NULL-FK rows.

    Each relationship is one left join onto the parent's distinct keys
    plus one aggregate; all census rows union into a SINGLE lazy plan —
    no per-relationship driver actions, one Spark job for the whole
    audit regardless of how many relationships it covers.
    """
    out = None
    for name, child, fk, parent, pk in pairs:
        keys = parent.select(F.col(pk).alias("__pk")).distinct()
        j = child.select(F.col(fk).alias("__fk")).join(
            keys, F.col("__fk") == F.col("__pk"), "left"
        )
        row = j.agg(
            F.lit(name).alias("relationship"),
            F.count(F.lit(1)).alias("child_rows"),
            F.sum(F.col("__fk").isNull().cast("long")).alias("null_fk"),
            F.sum(
                (F.col("__fk").isNotNull() & F.col("__pk").isNull()).cast("long")
            ).alias("orphans"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def cdc_apply(
    base: DataFrame,
    changelog: DataFrame,
    key_col: str,
    payload_cols: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Apply an ordered CDC changelog (op ∈ I/U/D, monotone ``seq``) to a
    base snapshot: each key's LATEST change wins — inserts/updates
    replace the row wholesale, deletes remove it; untouched keys pass
    through. The Delta/Iceberg MERGE semantics in plain DataFrame ops,
    and the batch twin of a foreachBatch CDC sink.

    Scale shape: one shuffle on the key for the latest-change window
    (row_number over seq DESC), one anti-join to drop replaced/deleted
    base rows, one union — no per-row MERGE, no driver loop. ``seq``
    must totally order each key's changes (CDC streams carry an LSN /
    commit version); (seq DESC, op) is the tie-break so replays with
    duplicated seq stay deterministic.

    Returns (key, *payload_cols).
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(seq_col).desc(), F.col(op_col)
    )
    latest = (
        changelog.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(key_col, op_col, *payload_cols)
    )
    upserts = latest.filter(F.col(op_col) != "D").select(key_col, *payload_cols)
    touched = latest.select(key_col)
    survivors = base.select(key_col, *payload_cols).join(
        touched, key_col, "left_anti"
    )
    return survivors.unionByName(upserts)


def cdc_extract(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    payload_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Diff two table versions into the minimal I/U/D changelog — the
    inverse of :func:`cdc_apply` (``cdc_apply(old, cdc_extract(old,
    new, ...) + seq, ...)`` reproduces ``new``; pinned in tests).

    What a change-data-feed produces when the upstream system can't:
    ONE full-outer join on the key classifies every row — new-only → I,
    old-only → D, both-with-any-payload-difference → U; identical rows
    never leave the join. Struct equality does the multi-column compare
    in a single null-safe expression (no per-column OR chain to keep in
    sync with the schema). One key shuffle total; output is bounded by
    the true change volume, not the table size.

    Returns (op, key, *payload_cols) — payload from ``new`` for I/U,
    from ``old`` for D.
    """
    o = old.select(
        F.col(key_col), F.struct(*payload_cols).alias("__old")
    )
    n = new.select(
        F.col(key_col), F.struct(*payload_cols).alias("__new")
    )
    j = o.join(n, key_col, "full_outer")
    op = (
        F.when(F.col("__old").isNull(), "I")
        .when(F.col("__new").isNull(), "D")
        .when(~F.col("__old").eqNullSafe(F.col("__new")), "U")
    )
    payload = F.coalesce(F.col("__new"), F.col("__old"))
    return (
        j.select(op.alias(op_col), F.col(key_col), payload.alias("__p"))
        .filter(F.col(op_col).isNotNull())
        .select(
            op_col,
            key_col,
            *[F.col("__p")[c].alias(c) for c in payload_cols],
        )
    )
