#!/usr/bin/env python
"""Text-operator skew bench (VERDICT r9 item #7): the four remaining
exact-quadratic-risk plans — q_sparse_cosine, q_edit_distance_join,
q_fuzzy_join, q_containment_join — have blocking/prefix-filter designs
that *should* be skew-immune; this measures instead of assuming.

The sf1 Zipf fixture can't stress them: it skews o_custkey, while these
block on TEXT keys (terms, shingles, name segments, (brand, size)
grids), and three of them bound their input at doc_id < 300. So each
operator gets a purpose-built hot-key variant of its OWN blocking key,
same row count as the uniform input, built deterministically from
/root/testdata/sf0.1:

- edit-distance block join: 20% of parts remapped into ONE (brand,
  size) block — the |block|²/2 cliff the length-band can't bound.
- fuzzy_join (PassJoin segments): 20% of names collapsed to 5 shared
  stems — every segment key of those stems goes hot on BOTH sides.
- containment_join: one 40-token phrase appended to 25% of docs — hot
  shingles in every hot doc; the rarest-first prefix filter should
  refuse to probe them.
- sparse_cosine: same hot phrase — its terms exceed max_df and must be
  dropped BEFORE the pair join.

Any ratio > 2× needs a tuned filter or an implemented escape hatch; the
edit-distance block join also times `degree_capped_edges` on the block
key (cap = p95 block size) as that escape, expected ~flat under skew.

Writes BENCH_TEXTSKEW.json. Usage: python scripts/bench_textskew.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = 2
N_DOCS = 1500  # documents slice for the shingle/term operators


def _timed(fn) -> float:
    from pyspark.sql import functions as F

    from legislative_bills_database_spark.session import materialize_fully

    best = None
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        df = fn()
        materialize_fully(df)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def _block_edit_join(parts):
    """The q_edit_distance_join plan parameterized on its input: equi
    block join on (brand, size) + length band + levenshtein verify."""
    from pyspark.sql import functions as F

    a = parts.select(
        F.col("k").alias("k1"), F.col("name").alias("n1"), "brand", "size"
    )
    b = parts.select(
        F.col("k").alias("k2"),
        F.col("name").alias("n2"),
        F.col("brand").alias("b2"),
        F.col("size").alias("s2"),
    )
    pairs = a.join(
        b,
        (F.col("brand") == F.col("b2"))
        & (F.col("size") == F.col("s2"))
        & (F.col("k1") < F.col("k2"))
        & (F.abs(F.length("n1") - F.length("n2")) <= 6),
    ).select(
        "k1", "k2", F.levenshtein("n1", "n2").cast("long").alias("dist")
    )
    return pairs.orderBy("dist", "k1", "k2").limit(15)


def main() -> None:
    from pyspark.sql import functions as F

    from legislative_bills_database_spark.operators.basket import (
        degree_capped_edges,
    )
    from legislative_bills_database_spark.operators.fuzzy import fuzzy_join
    from legislative_bills_database_spark.operators.setjoin import (
        containment_join,
    )
    from legislative_bills_database_spark.operators.tfidf import (
        sparse_cosine_pairs,
    )
    from legislative_bills_database_spark.session import get_spark

    spark = get_spark(
        app_name="lbd-bench-textskew",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
    )
    spark.sparkContext.setLogLevel("ERROR")

    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") < N_DOCS)
        .select("doc_id", "text")
    )
    # pin the inputs so per-run timings measure the operator, not the scan
    hot_name = F.concat(
        F.lit("hot block stem variant "), (F.col("p_partkey") % 5).cast("string")
    )
    base = part.select(
        F.col("p_partkey").alias("k"),
        F.col("p_name").alias("name"),
        F.col("p_brand").alias("brand"),
        F.col("p_size").alias("size"),
    ).localCheckpoint()
    hot_parts = part.select(
        F.col("p_partkey").alias("k"),
        F.when(F.col("p_partkey") % 10 < 2, hot_name)
        .otherwise(F.col("p_name"))
        .alias("name"),
        F.when(F.col("p_partkey") % 10 < 2, F.lit("HOTBRAND"))
        .otherwise(F.col("p_brand"))
        .alias("brand"),
        F.when(F.col("p_partkey") % 10 < 2, F.lit(0))
        .otherwise(F.col("p_size"))
        .alias("size"),
    ).localCheckpoint()
    phrase = " ".join(f"hotword{i}" for i in range(40))
    docs_u = docs.localCheckpoint()
    docs_h = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0, F.concat("text", F.lit(" " + phrase))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).localCheckpoint()
    n_parts = base.count()
    print(
        f"inputs: {n_parts} parts ({n_parts // 5} in the hot block), "
        f"{docs_u.count()} docs ({docs_u.count() // 4} hot)",
        file=sys.stderr,
    )

    out: dict[str, dict[str, float]] = {}

    def row(name: str, uni, skew) -> None:
        tu, ts = _timed(uni), _timed(skew)
        out[name] = {
            "uniform": tu,
            "skew": ts,
            "ratio": round(ts / tu, 2) if tu else None,
        }
        print(f"  {name}: uniform {tu}s skew {ts}s "
              f"ratio {out[name]['ratio']}", file=sys.stderr)

    row(
        "edit_distance_block_join",
        lambda: _block_edit_join(base),
        lambda: _block_edit_join(hot_parts),
    )
    # the escape hatch: cap rows per block at the p95 block size via the
    # portable md5 sampler (same operator that guards the CF family)
    blocked = hot_parts.withColumn(
        "blk", F.concat_ws("|", F.col("brand"), F.col("size").cast("string"))
    )
    sizes = sorted(
        r["n"]
        for r in blocked.groupBy("blk").agg(F.count("*").alias("n")).collect()
    )
    cap = max(sizes[(19 * len(sizes) + 19) // 20 - 1], 30)
    print(f"  block cap (p95 of block sizes): {cap}", file=sys.stderr)
    capped = degree_capped_edges(blocked, "blk", "k", cap).drop("blk")
    capped = capped.localCheckpoint()
    out["edit_distance_block_join_capped_skew"] = {
        "skew": _timed(lambda: _block_edit_join(capped)),
        "cap": cap,
    }
    print(
        f"  capped-under-skew: {out['edit_distance_block_join_capped_skew']['skew']}s",
        file=sys.stderr,
    )

    def _fuzzy(parts):
        left = parts.select(F.col("k").alias("lid"), F.col("name").alias("lt"))
        pos = (F.col("k") % (F.length("name") - 2) + 2).cast("int")
        right = parts.select(
            (F.col("k") + 1_000_000).alias("rid"),
            F.concat(
                F.substring("name", F.lit(1), pos - 1),
                F.substring("name", pos + 1, F.length("name")),
            ).alias("rt"),
        )
        return fuzzy_join(left, right, "lid", "lt", "rid", "rt", max_dist=2)

    row("fuzzy_join", lambda: _fuzzy(base), lambda: _fuzzy(hot_parts))
    row(
        "containment_join",
        lambda: containment_join(docs_u, "doc_id", "text", 3, 0.7),
        lambda: containment_join(docs_h, "doc_id", "text", 3, 0.7),
    )
    row(
        "sparse_cosine",
        lambda: sparse_cosine_pairs(docs_u, threshold=0.3, max_df=50),
        lambda: sparse_cosine_pairs(docs_h, threshold=0.3, max_df=50),
    )

    # DBSCAN density cliff (VERDICT r13 #6): the grid stencil's hot key
    # is CELL OCCUPANCY, not a join key — squeeze the embedding head 8×
    # so per-cell occupancy grows ~64× and the stencil join quadratics.
    # The cell-capped escape must stay ~flat on the same dense input.
    from legislative_bills_database_spark.operators.density import (
        cell_cap_split,
        grid_dbscan,
        stencil_join,
        with_cells,
    )
    from legislative_bills_database_spark.plans.roundthirteen_queries import (
        _DB_EPS,
        _DB_EPS2,
        _DB_MINNB,
        _DB_OFF,
    )
    from legislative_bills_database_spark.plans.roundfourteen_queries import (
        _DBC_CAP,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pts_u = emb.select(
        "vec_id",
        F.round(F.element_at("embedding", 1).cast("double") * 1000)
        .cast("long")
        .alias("x"),
        F.round(F.element_at("embedding", 2).cast("double") * 1000)
        .cast("long")
        .alias("y"),
    ).localCheckpoint()
    pts_d = pts_u.select(
        "vec_id",
        F.expr("(x + 1048576) div 8 - 131072").alias("x"),
        F.expr("(y + 1048576) div 8 - 131072").alias("y"),
    ).localCheckpoint()

    def _grid(pts):
        return grid_dbscan(
            pts, _DB_EPS, _DB_EPS2, _DB_MINNB, _DB_OFF, max_candidates=None
        )

    def _capped(pts):
        kept, dropped = cell_cap_split(pts, _DB_EPS, _DB_OFF, _DBC_CAP)
        kept = kept.localCheckpoint(eager=False)
        base = _grid(kept).localCheckpoint(eager=False)
        core_xy = (
            base.filter(F.col("role") == "core")
            .select("vec_id", "cluster")
            .join(kept, "vec_id")
        )
        att = (
            stencil_join(
                with_cells(dropped, _DB_EPS, _DB_OFF),
                with_cells(
                    core_xy.select("vec_id", "x", "y"), _DB_EPS, _DB_OFF
                ),
                _DB_EPS2,
            )
            .join(
                core_xy.select(
                    F.col("vec_id").alias("b_id"),
                    F.col("cluster").alias("bcl"),
                ),
                "b_id",
            )
            .groupBy("a_id")
            .agg(F.min("bcl").alias("cluster"))
            .select(
                F.col("a_id").alias("vec_id"),
                F.lit("border").alias("role"),
                "cluster",
            )
        )
        noise = dropped.join(
            att.select("vec_id"), "vec_id", "left_anti"
        ).select(
            "vec_id",
            F.lit("noise").alias("role"),
            F.lit(None).cast("long").alias("cluster"),
        )
        return base.unionByName(att).unionByName(noise)

    row("dbscan_grid", lambda: _grid(pts_u), lambda: _grid(pts_d))
    out["dbscan_grid_capped_skew"] = {
        "skew": _timed(lambda: _capped(pts_d)),
        "cap": _DBC_CAP,
    }
    print(
        f"  dbscan capped-under-density: "
        f"{out['dbscan_grid_capped_skew']['skew']}s",
        file=sys.stderr,
    )

    doc = {
        "metric": "text_operator_skew",
        "sf_source": SF_DIR,
        "skew": "hot blocking keys: one (brand,size) block at 20%, "
        "5 shared name stems at 20%, one 40-token phrase in 25% of docs; "
        "embedding head squeezed 8x (cell occupancy ~64x) for the "
        "dbscan density cliff",
        "queries": out,
    }
    with open(os.path.join(REPO, "BENCH_TEXTSKEW.json"), "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
