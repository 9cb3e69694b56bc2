"""Vector math over ``array<float>`` embedding columns — pure built-ins.

All arithmetic is done JVM-side with higher-order functions
(``zip_with`` + ``aggregate``); elements are cast float→double *before*
multiplying so Spark and the DuckDB oracle accumulate the same doubles in
the same left-to-right order. No pandas UDF in the hot path: at 100 TB a
64..4096-dim dot product per row stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column | str) -> Column:
    """Squared L2 norm (double)."""
    return F.aggregate(
        F.transform(_c(a), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(norm2(a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# ---------------------------------------------------------------------------
# DuckDB oracle twins. Same fold shape: cast each element to DOUBLE first.
# list_zip yields unnamed structs → numeric subscripts x[1], x[2].
# ---------------------------------------------------------------------------

def sql_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}),"
        f" x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    )


def sql_norm2(a: str) -> str:
    return f"list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / (sqrt({sql_norm2(a)}) * sqrt({sql_norm2(b)})))"
