"""Z-order (Morton curve) data layout: multi-dimensional file clustering.

A sort can only cluster by its leading column: files laid out by
``ORDER BY a`` have tight ``a`` ranges but random ``b`` ranges, so a
filter on ``b`` reads every file. Interleaving the BITS of several
bucketed keys into one Morton code and range-sorting by it gives every
participating column locality — per-file min/max footer ranges stay
narrow on ALL of them, and parquet row-group / file skipping prunes
selective filters on any dimension. This is the layout trick behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``; at 100 TB it is the difference
between a point lookup touching a handful of files or the whole table.

Everything here is a pure integer expression tree (shifts, masks, adds)
— JVM codegen, oracle-reproducible in any engine with bit operators, no
UDF. Inputs must be pre-bucketed to ``bits``-bit non-negative ints;
:func:`int_bucket` is the equal-width bucketizer for bounded numeric
columns (rank-bucketing via ``ntile`` is the skew-robust alternative —
one window pass — when distributions are heavy-tailed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def int_bucket(
    col: Column | str, lo: int, hi: int, bits: int = 8
) -> Column:
    """Equal-width bucket of a bounded numeric into [0, 2^bits): the
    simplest z-order pre-bucketing (bounds from table stats)."""
    c = F.col(col) if isinstance(col, str) else col
    n = 1 << bits
    # explicit floor: a bare double→bigint cast TRUNCATES in Spark but
    # ROUNDS in DuckDB — floor is the one op both engines agree on
    scaled = F.floor((c.cast("double") - lo) / (hi - lo) * n)
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), scaled))


def sql_int_bucket(expr: str, lo: int, hi: int, bits: int = 8) -> str:
    """DuckDB twin of :func:`int_bucket`."""
    n = 1 << bits
    scaled = (
        f"CAST(floor((CAST({expr} AS DOUBLE) - {lo}) / ({hi} - {lo}) * {n})"
        f" AS BIGINT)"
    )
    return f"greatest(0, least({n - 1}, {scaled}))"


def z_value(cols: list[Column | str], bits: int = 8) -> Column:
    """Morton code: interleave the low ``bits`` bits of each (already
    bucketed, non-negative) column — bit ``i`` of column ``j`` lands at
    output position ``i * n_cols + j``. Pure shift/mask/add tree."""
    ncols = len(cols)
    z = F.lit(0).cast("bigint")
    for j, c in enumerate(cols):
        cc = (F.col(c) if isinstance(c, str) else c).cast("bigint")
        for i in range(bits):
            bit = F.shiftright(cc, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * ncols + j)
    return z


def sql_z_value(exprs: list[str], bits: int = 8) -> str:
    """DuckDB twin of :func:`z_value` (same shift/mask arithmetic)."""
    ncols = len(exprs)
    terms = []
    for j, e in enumerate(exprs):
        for i in range(bits):
            terms.append(
                f"((( CAST({e} AS BIGINT) >> {i}) & 1) << {i * ncols + j})"
            )
    return "(" + " + ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    path: str,
    z_col: Column,
    n_files: int,
) -> str:
    """Lay the table out in ``n_files`` files clustered along the Morton
    curve: range-partition on the z-value (each file owns a contiguous
    z-range) and sort within each file (tight row-group stats inside the
    file too). One shuffle — the same cost as any sorted write."""
    (
        df.withColumn("__z", z_col)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.parquet(path)
    )
    return path
