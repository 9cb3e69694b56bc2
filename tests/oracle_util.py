"""Local replica of the driver's oracle-differential check.

Runs a Spark query and its DuckDB twin, normalizes both to canonical
(sorted-columns, sorted-rows, stringified-cells) form, and diffs. Stricter
than any reasonable driver hash: exact cell-string equality with floats at
12 significant digits.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.12g}"
    if isinstance(v, Decimal):
        return f"{float(v):.12g}"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canonical(rows: list[tuple], cols: list[str]) -> tuple[list[str], list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = sorted("|".join(_cell(r[i]) for i in order) for r in rows)
    return sorted_cols, out


def compare(spark_df, sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    con = duckdb_con(sf_dir)
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    con.close()

    sc, sv = canonical(s_rows, s_cols)
    dc, dv = canonical(d_rows, d_cols)
    if sc != dc:
        problems.append(f"columns differ: spark={sc} duckdb={dc}")
        return problems
    if len(sv) != len(dv):
        problems.append(f"row count differs: spark={len(sv)} duckdb={len(dv)}")
    mism = [i for i, (a, b) in enumerate(zip(sv, dv)) if a != b]
    if mism:
        i = mism[0]
        problems.append(
            f"{len(mism)} value mismatches; first at sorted row {i}:\n"
            f"  spark : {sv[i]}\n  duckdb: {dv[i]}"
        )
    return problems
