"""Z-order layout tests: the Morton code must be correct bit math, and
the z-ordered file layout must beat a linear sort at file-skipping on
the NON-leading dimension — measured from real parquet footer min/max
stats, the same stats the reader's row-group pruning uses.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from legislative_bills_database_spark.operators.layout import (
    int_bucket,
    z_value,
    zorder_write,
)


def _file_ranges(path: str, col: str) -> list[tuple[int, int]]:
    """Per-file (min, max) of ``col`` from parquet footer statistics."""
    ranges = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(
            md.row_group(g).column(idx).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(idx).statistics.max
            for g in range(md.num_row_groups)
        )
        ranges.append((lo, hi))
    return ranges


def test_z_value_interleaves_bits(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "a int, b int")
    row = df.select(z_value(["a", "b"], bits=3).alias("z")).first()
    # a=101, b=011 → z bits (a0,b0,a1,b1,a2,b2) = 1,1,0,1,1,0 → 0b011011
    assert row["z"] == 0b011011


def test_int_bucket_bounds(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (50.0,), (100.0,), (200.0,)],
                               "x double")
    vals = [
        r[0]
        for r in df.select(int_bucket("x", 0, 100, bits=8)).collect()
    ]
    assert vals[0] == 0 and vals[-1] == 255  # clamped
    assert 0 <= min(vals) and max(vals) <= 255


def test_zorder_layout_prunes_nonleading_dimension(spark, tmp_path):
    # 2-d uniform grid: every (a, b) combination once
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("a"),
        F.floor(F.col("id") / 64).cast("bigint").alias("b"),
        F.col("id").alias("payload"),
    )
    n_files = 16

    linear = str(tmp_path / "linear")
    (
        grid.repartitionByRange(n_files, "a")
        .sortWithinPartitions("a")
        .write.parquet(linear)
    )
    zpath = str(tmp_path / "zorder")
    zorder_write(grid, zpath, z_value(["a", "b"], bits=6), n_files)

    # same rows in both layouts
    assert spark.read.parquet(zpath).count() == 64 * 64

    # point-ish filter on b (the NON-leading dim for the linear layout):
    # count files whose footer [min,max] of b intersects [10, 13]
    def hits(path):
        return sum(
            1 for lo, hi in _file_ranges(path, "b") if hi >= 10 and lo <= 13
        )

    linear_hits, z_hits = hits(linear), hits(zpath)
    assert linear_hits == n_files  # linear-by-a: b spans full range everywhere
    assert z_hits <= n_files // 2  # z-order: most files' b-range excludes it
    # and the leading dimension still prunes reasonably on the z layout
    a_hits = sum(
        1 for lo, hi in _file_ranges(zpath, "a") if hi >= 10 and lo <= 13
    )
    assert a_hits < n_files
