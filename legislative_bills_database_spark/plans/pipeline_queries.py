"""Composed pipeline queries (SURVEY.md §3) on the driver fixtures.

The three reference pipelines run for real on JSON document trees in
``pipelines/`` (tests/test_pipelines.py). These queries re-express their
full relational cores on the fixture tables so the driver's DuckDB oracle
ALSO verifies the composition end-to-end — not just the individual
operators.
"""

from __future__ import annotations

from functools import reduce
from operator import add, or_

from pyspark.sql import functions as F

from ..io import load_table
from ..operators.aggregates import pivot_count
from .registry import query
from .reference_queries import YEARS

_YCOLS = [f"y{y}" for y in YEARS]


def _sql_counts_pipeline() -> str:
    ycols = ", ".join(
        f"COUNT(CASE WHEN year(o_orderdate) = {y} THEN 1 END) AS y{y}"
        for y in YEARS
    )
    coal = [f"COALESCE(y{y}, 0)" for y in YEARS]
    total = " + ".join(coal)
    active = " + ".join(f"(CASE WHEN {c} > 0 THEN 1 ELSE 0 END)" for c in coal)
    return f"""
    WITH agg AS (
      SELECT o_custkey, {ycols}
      FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
    ), wide AS (
      SELECT replace(c_name, 'Customer#', 'C-') AS name,
             c_mktsegment AS segment,
             {', '.join(f'COALESCE(y{y}, 0) AS y{y}' for y in YEARS)},
             CAST({total} AS BIGINT) AS total_bills,
             CAST(({active}) * 2 AS BIGINT) AS years_in_data
      FROM customer LEFT JOIN agg ON c_custkey = o_custkey
      WHERE c_nationkey <> 3
    )
    SELECT *, CASE WHEN years_in_data > 0
                   THEN CAST(total_bills AS DOUBLE) / years_in_data END
              AS bills_per_year
    FROM wide
    """


@query("q_pipeline_legislator_counts", _sql_counts_pipeline())
def q_pipeline_legislator_counts(spark, sf_dir):
    """Full legislator-bill-counts pipeline core
    (legislator_bill_counts_run.R:89-153) on fixtures: passed facts →
    broadcast dim join → strict pivot → zero-fill for dim rows with no
    facts → Total / Years-in-Data / Bills-per-Year arithmetic → label
    cleanup → dim-attribute filter → key drop. One fact shuffle total."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    matches = (
        orders.filter(F.col("o_orderstatus") == "F")
        .withColumn("o_year", F.year("o_orderdate"))
        .select("o_custkey", "o_year")
    )
    wide = pivot_count(matches, "o_custkey", "o_year", YEARS, prefix="y")
    total = reduce(add, [F.col(c) for c in _YCOLS])
    active = reduce(add, [F.when(F.col(c) > 0, 1).otherwise(0) for c in _YCOLS])
    # no broadcast hint on `wide`: it is a FACT-DERIVED aggregate (one row
    # per active custkey — dimension-cardinality, growing with scale) whose
    # size the planner can't know up front. Both sides are custkey-keyed,
    # so this is one dim-sized exchange per side; AQE converts it to a
    # broadcast at runtime when the aggregate measures small.
    return (
        customer.join(wide, customer.c_custkey == wide.o_custkey, "left")
        .na.fill(0, _YCOLS)
        .filter(F.col("c_nationkey") != 3)
        .select(
            F.regexp_replace("c_name", "Customer#", "C-").alias("name"),
            F.col("c_mktsegment").alias("segment"),
            *_YCOLS,
            total.cast("bigint").alias("total_bills"),
            (active * 2).cast("bigint").alias("years_in_data"),
        )
        .withColumn(
            "bills_per_year",
            F.when(
                F.col("years_in_data") > 0,
                F.col("total_bills").cast("double") / F.col("years_in_data"),
            ),
        )
    )


_SEARCH_TERMS = ["spark", "batch"]


@query(
    "q_pipeline_keyword_search",
    "SELECT doc_id, lang, regexp_replace(source, '[0-9]+$', '') AS source_base"
    " FROM documents WHERE "
    + " OR ".join(f"text LIKE '%{t}%'" for t in _SEARCH_TERMS),
)
def q_pipeline_keyword_search(spark, sf_dir):
    """search_all_bills pipeline core (legiscan_search_all_bills.R:81-98)
    on fixtures: projection → case-SENSITIVE multi-term any-match filter
    → link cleanup regexp_replace. Zero shuffles: the whole pipeline is
    one scan with the OR folded into it."""
    docs = load_table(spark, sf_dir, "documents")
    any_match = reduce(
        or_, [F.col("text").contains(t) for t in _SEARCH_TERMS]
    )
    return docs.filter(any_match).select(
        "doc_id",
        "lang",
        F.regexp_replace("source", "[0-9]+$", "").alias("source_base"),
    )
