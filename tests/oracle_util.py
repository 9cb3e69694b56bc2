"""Local replica of the driver's oracle-differential check.

Runs a Spark query and its DuckDB twin, normalizes both to canonical
(sorted-columns, sorted-rows, stringified-cells) form, and diffs. Floats
render at full round-trip precision (repr) since round 10 — the driver
hashes exact values, and the .12g rendering used through r9 passed
q_page_hinkley locally while the driver red-celled a last-ulp divergence.

DRIVER PARITY (hardened in round 4 after the q_dq_constraints miss): the
driver canonicalizes the DuckDB side via ``.df()`` (pandas), so dtype
coercions that pandas applies — DuckDB HUGEINT → float64 being the one
that bit — are visible to the driver's value hash. The old fetchall()
path here received HUGEINT as a Python int and string-matched Spark,
making the local gate *weaker* than the driver exactly where the driver
failed. compare() now (a) fetches DuckDB through ``.df()`` and
canonicalizes from the pandas frame, and (b) DESCRIBEs the oracle and
rejects any HUGEINT/UHUGEINT output column outright.
"""

from __future__ import annotations

import datetime as dt
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
    # float NaN and pandas NaT are non-self-equal; the driver's pandas
    # canonicalizer renders both as nulls (q_asof_join/q_scd2_merge
    # hash-passed r3 with NULL numeric/timestamp cells).
    if isinstance(v, (float, dt.datetime)) and v != v:
        return "NULL"
    if isinstance(v, float):
        # Round-trip precision (r10 hardening after the q_page_hinkley
        # driver red cell): the driver hashes exact values, so two
        # doubles differing in the last ulp must mismatch HERE too.
        # .12g hid exactly that (582269247.783963 vs …62 both rendered
        # "582269247.784"). repr() is the shortest round-trip form —
        # equal reprs <=> equal bit patterns (modulo -0.0, normalized).
        return repr(v + 0.0 if v == 0 else v)
    if isinstance(v, Decimal):
        # Driver parity: pandas coerces DECIMAL to float64 on the
        # DuckDB side; mirror that coercion at full precision.
        f = float(v)
        return repr(f + 0.0 if f == 0 else f)
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, dt.datetime):
        # Driver parity: DuckDB .df() promotes DATE to midnight
        # datetime64, yet date-producing queries (q_gap_fill, q_lookup_join,
        # q_scd2_merge, …) hash-passed the driver r3 — so its canonicalizer
        # renders midnight naive timestamps and dates identically. Mirror
        # that on both sides (Spark dates hit the dt.date branch below).
        if (
            v.tzinfo is None
            and v.hour == v.minute == v.second == v.microsecond == 0
        ):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if type(v).__name__ == "ndarray":  # pandas renders array columns as numpy
        return "[" + ",".join(_cell(x) for x in v.tolist()) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canonical(rows: list[tuple], cols: list[str]) -> tuple[list[str], list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = sorted("|".join(_cell(r[i]) for i in order) for r in rows)
    return sorted_cols, out


#: DuckDB output types that pandas coerces lossily (HUGEINT → float64);
#: any oracle producing one would hash-mismatch in the driver even with
#: equal values, so the local gate rejects them before comparing.
_PANDAS_LOSSY_TYPES = ("HUGEINT", "UHUGEINT")


def lossy_oracle_columns(sql: str, sf_dir: str) -> list[tuple[str, str]]:
    """(column, type) pairs of oracle outputs pandas cannot hold losslessly."""
    con = duckdb_con(sf_dir)
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    finally:
        con.close()
    return [
        (name, typ)
        for name, typ, *_ in desc
        if any(t in typ.upper() for t in _PANDAS_LOSSY_TYPES)
    ]


def compare(spark_df, sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    # Driver parity (r10 hardening, with the float-repr change): the
    # driver canonicalizes the SPARK side through Arrow toPandas() too,
    # so a nullable long column becomes float64 + NaN on BOTH sides
    # (q_cube_counts' CUBE year column hash-passed the driver r1-r9
    # with cells the old collect() path rendered as int 2001 vs pandas
    # 2001.0 — the driver can only have seen them equal if Spark also
    # went through the pandas coercion). collect() here would make the
    # gate FAIL queries the driver passes; toPandas() makes both lossy
    # coercions symmetric, exactly like the driver.
    # ADVICE r10 #2: save/restore the conf around the fetch — the old
    # unconditional set leaked a global side effect onto the shared
    # session for any test code running after a compare() call.
    _conf = spark_df.sparkSession.conf
    _arrow_key = "spark.sql.execution.arrow.pyspark.enabled"
    _arrow_prev = _conf.get(_arrow_key, None)
    _conf.set(_arrow_key, "true")
    try:
        s_pdf = spark_df.toPandas()
    finally:
        if _arrow_prev is None:
            _conf.unset(_arrow_key)
        else:
            _conf.set(_arrow_key, _arrow_prev)
    s_cols = list(s_pdf.columns)
    s_rows = [tuple(r) for r in s_pdf.itertuples(index=False, name=None)]
    con = duckdb_con(sf_dir)
    # Driver parity: DESCRIBE first, reject pandas-lossy output dtypes.
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    lossy = [
        (name, typ)
        for name, typ, *_ in desc
        if any(t in typ.upper() for t in _PANDAS_LOSSY_TYPES)
    ]
    if lossy:
        con.close()
        return [
            "oracle emits pandas-lossy dtype(s) "
            + ", ".join(f"{c}:{t}" for c, t in lossy)
            + " — CAST to BIGINT; the driver hashes these as float64"
        ]
    # Fetch via pandas exactly like the driver, so its dtype coercions
    # (nullable int → float64 + NaN, DECIMAL → float64) surface here too.
    d_pdf = con.execute(sql).df()
    d_cols = list(d_pdf.columns)
    d_rows = [tuple(r) for r in d_pdf.itertuples(index=False, name=None)]
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
