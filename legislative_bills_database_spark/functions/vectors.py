"""Vector math over ``array<float>`` embedding columns — pure built-ins.

All arithmetic is done JVM-side with higher-order functions
(``zip_with`` + ``aggregate``); elements are cast float→double *before*
multiplying so Spark and the DuckDB oracle accumulate the same doubles in
the same left-to-right order. No pandas UDF in the hot path: at 100 TB a
64..4096-dim dot product per row stays inside whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Plain-identifier fast path: building a higher-order function through
# the PySpark Column API costs ~5-10 py4j ROUND-TRIPS per lambda
# (_create_lambda + invoke), ~0.4 s of driver wall per embedding query
# at 6 HOFs — overhead the JVM-bound bench calibration token cannot
# see (it is Python socket latency, not machine speed; measured while
# root-causing the r12 q_cosine_topk flag). A single F.expr parse
# yields the IDENTICAL Catalyst tree (same cast-to-double-first fold,
# same left-to-right accumulation — oracle hashes unchanged) in ONE
# round-trip, so when callers hand plain column names we parse instead
# of composing.
_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _plain(col: Column | str) -> str | None:
    # The generated expression backtick-quotes the name (r13 ADVICE):
    # unquoted, a column literally named current_date / order / etc.
    # would parse as a niladic function or keyword instead of the
    # attribute F.col would resolve — quoting keeps the one-parse fast
    # path while preserving F.col semantics for any identifier.
    return col if isinstance(col, str) and _IDENT.match(col) else None


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product in double precision."""
    pa, pb = _plain(a), _plain(b)
    if pa and pb:
        return F.expr(
            f"aggregate(zip_with(`{pa}`, `{pb}`, (x, y) ->"
            f" CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
            f" CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column | str) -> Column:
    """Squared L2 norm (double)."""
    pa = _plain(a)
    if pa:
        return F.expr(
            f"aggregate(transform(`{pa}`, x ->"
            f" CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
            f" CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
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


def sign_word(vec, bits: int = 62):
    """Sign-bit quantization of the first ``bits`` dims to ONE BIGINT —
    the 1-bit-per-dim binary embedding (Charikar hyperplane sketch with
    axis-aligned planes): bit d set iff element d > 0. Horner fold
    acc·2 + bit from the high dim down, all integer multiplies — no
    column-shift shiftleft (literal-only in Spark) and no 1<<63
    (checked BIGINT refuses it in DuckDB; 62 bits stay clear of the
    sign). Hamming distance between words ≈ angular distance: the
    64×-compressed ANN prefilter."""
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.aggregate(
        F.sequence(F.lit(bits), F.lit(1), F.lit(-1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc * 2
        + F.when(F.element_at(v, i) > 0, F.lit(1)).otherwise(F.lit(0)),
    )


def sql_sign_word(expr: str, bits: int = 62) -> str:
    """DuckDB twin of :func:`sign_word` (list_sum of powers — the plain
    integer-accumulator shape; same bits, same 1-based dims)."""
    return (
        f"CAST(list_sum(list_transform(generate_series(1, {bits}), i -> "
        f"CASE WHEN ({expr})[i] > 0 THEN (CAST(1 AS BIGINT) << (i - 1)) "
        f"ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"
    )
