#!/usr/bin/env python
"""Generate a 10x-scaled sf1.0 dataset from /root/testdata/sf0.1.

Referential-integrity-preserving replication: each of the 10 copies
offsets every key family by a disjoint stride, so join fan-outs,
group cardinalities per key, and time density scale the way a 10x
bigger deployment would (10x customers each with the same order count,
10x orders with the same lineitem fan-out, 10x event stream density
over the same wall-clock range). Dims `region`/`nation` stay fixed
(they are bounded in the real world too). Document texts get a
per-copy token suffix so copies are NOT near-duplicates of each other
— without it the MinHash pair count would grow ~45x while the corpus
grows 10x, and the dedup benchmarks would measure a data artifact,
not the engine.

Output: /root/repo/.benchdata/sf1.0/*.parquet (gitignored; ~180 MB).
Deterministic — safe to re-run (overwrites).

``--skew`` (VERDICT r6 #3): the plain replication is skew-free BY
CONSTRUCTION — disjoint key strides keep per-key degree constant, so
the scaling bench structurally cannot surface hot-key quadratics; it
flatters exactly the plans that need scrutiny. The skew variant
Zipf-reuses BASE-copy customer keys across copies: in copies i>0, 10%
of orders (hash-selected, deterministic) are reassigned to hot base
customers with idx = 997 // (h % 997 + 1) — a Zipf(1)-shaped pick
where customer 1 absorbs ~half the reassigned mass — so hot-customer
degree GROWS with scale (their baskets span every copy's suppliers)
the way real power-law traffic does. Referential integrity holds
(base custkeys exist in copy 0). Output: .benchdata/sf1.0-skew/.
"""
import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SKEW = "--skew" in sys.argv
DST = os.path.join(_REPO, ".benchdata", "sf1.0-skew" if SKEW else "sf1.0")
STRIDE = 10_000_000
COPIES = 10

# deterministic Zipf(1)-shaped hot-customer reassignment for 10% of
# copy>0 orders: h1 selects, h2 picks the hot base customer
_SKEW_CUST = """
            CASE WHEN {i} > 0 AND hash(o_orderkey) % 10 = 0
                 THEN CAST(997 // ((hash(o_orderkey * 31) % 997) + 1)
                           AS BIGINT)
                 ELSE o_custkey + {off} END AS o_custkey"""


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
        print(f"{t}: copied (fixed dim)")

    # (table, select-template) — {i} is the copy index, {off} = i*STRIDE
    plans = {
        "customer": """
            SELECT c_custkey + {off} AS c_custkey,
                   c_name || CASE WHEN {i} = 0 THEN '' ELSE '_{i}' END AS c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM src""",
        "supplier": """
            SELECT s_suppkey + {off} AS s_suppkey,
                   s_name || CASE WHEN {i} = 0 THEN '' ELSE '_{i}' END AS s_name,
                   s_nationkey, s_acctbal
            FROM src""",
        "part": """
            SELECT p_partkey + {off} AS p_partkey,
                   p_name || CASE WHEN {i} = 0 THEN '' ELSE '_{i}' END AS p_name,
                   p_brand, p_type, p_size, p_retailprice
            FROM src""",
        "orders": """
            SELECT o_orderkey + {off} AS o_orderkey,"""
        + (_SKEW_CUST if SKEW else """
                   o_custkey + {off} AS o_custkey""") + """,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM src""",
        "lineitem": """
            SELECT l_orderkey + {off} AS l_orderkey,
                   l_partkey + {off} AS l_partkey,
                   l_suppkey + {off} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM src""",
        "events": """
            SELECT event_id + {off} AS event_id, ts,
                   user_id + {off} AS user_id, event_type, value, props
            FROM src""",
        "documents": """
            SELECT doc_id + {off} AS doc_id,
                   CASE WHEN {i} = 0 THEN text
                        ELSE regexp_replace(text, '(\\S+)', '\\1_{i}', 'g')
                   END AS text,
                   lang, source,
                   CAST(length(CASE WHEN {i} = 0 THEN text
                        ELSE regexp_replace(text, '(\\S+)', '\\1_{i}', 'g')
                   END) AS BIGINT) AS n_chars
            FROM src""",
        # rotate each vector by the copy index: identical replicated
        # vectors would make every LSH bucket quadratic in the copy
        # count (measured: q_ann_lsh_pairs 60.7 s at sf1.0 with
        # verbatim copies — a data artifact, not an engine cost).
        # Rotation preserves the norm and the intra-copy geometry.
        "embeddings": """
            SELECT vec_id + {off} AS vec_id,
                   CASE WHEN {i} = 0 THEN embedding
                        ELSE embedding[{i} + 1:] || embedding[1:{i}]
                   END AS embedding,
                   label
            FROM src""",
    }
    for t, tpl in plans.items():
        con.execute(
            f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{SRC}/{t}.parquet'"
        )
        selects = " UNION ALL ".join(
            tpl.format(i=i, off=i * STRIDE) for i in range(COPIES)
        )
        con.execute(
            f"COPY ({selects}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM '{DST}/{t}.parquet'"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
