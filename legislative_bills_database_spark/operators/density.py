"""Grid-based density clustering (DBSCAN) — the distributed stencil
plan shared by q_dbscan (exact) and q_dbscan_capped (the cell-capped
density escape), plus the predicted-candidate interlock that makes the
exact plan refuse, not OOM, on hostile densities.

Scale design: points land in eps-sized grid cells, candidate pairs
come from a 9-cell stencil equi-join (provably complete: two points
within eps differ by ≤1 cell per axis), and the exact d² ≤ eps² filter
prunes the stencil — O(n · local density) candidates, never all-pairs.
The failure mode is DENSITY, not key skew: candidates grow as the sum
over cells of occ(c)·occ(stencil(c)), which a degenerate corpus (all
points in a handful of cells) drives quadratic. ``predicted_candidates``
prices that sum at CELL grain (a frame with one row per occupied cell —
trivially cheap next to the pair join it guards) so ``grid_dbscan`` can
refuse past ``max_candidates`` naming the capped escape, the
``basket.refuse_excess_fanout`` discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cell(c, eps: int, off: int):
    """eps-grid cell index, exact in both engines: shift non-negative
    then floor-divide (pmod keeps the dividend sign convention out)."""
    v = c + F.lit(off).cast("long")
    e = F.lit(eps).cast("long")
    return ((v - F.pmod(v, e)) / e).cast("long")


def with_cells(pts: DataFrame, eps: int, off: int) -> DataFrame:
    """(vec_id, x, y) → + (cx, cy) eps-grid cell coordinates."""
    return pts.select(
        "vec_id", "x", "y",
        _cell(F.col("x"), eps, off).alias("cx"),
        _cell(F.col("y"), eps, off).alias("cy"),
    )


_STENCIL = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def predicted_candidates(cells: DataFrame) -> int:
    """Upper bound on the stencil join's candidate-pair output:
    Σ_cells occ(c) · occ(c′) over the 9-cell stencil — computed at
    CELL grain (one slim aggregate + one tiny self-join), the price
    check before the point-grain join."""
    occ = cells.groupBy("cx", "cy").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    probes = occ.select(
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(dx).cast("long").alias("dx"),
                        F.lit(dy).cast("long").alias("dy"),
                    )
                    for dx, dy in _STENCIL
                ]
            )
        ).alias("o"),
        "cx", "cy",
    ).select(
        F.col("n").alias("na"),
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    row = (
        probes.join(
            occ.select(
                F.col("n").alias("nb"),
                F.col("cx").alias("jx"),
                F.col("cy").alias("jy"),
            ),
            ["jx", "jy"],
        )
        .agg(F.sum(F.col("na") * F.col("nb")).alias("p"))
        .collect()[0]
    )
    return int(row["p"] or 0)


def stencil_join(
    cells_a: DataFrame, cells_b: DataFrame, eps2: int
) -> DataFrame:
    """(a_id, b_id) exact eps-neighbor pairs between two CELL frames
    (each (vec_id, x, y, cx, cy)) via the 9-cell stencil equi-join —
    the cross-frame form the cell-capped escape's attach stage uses
    (dropped points probing kept cores). Does NOT filter a_id == b_id;
    disjoint frames never collide, self-joins should use
    ``stencil_neighbors``."""
    probes = cells_a.select(
        F.col("vec_id").alias("a_id"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(dx).cast("long").alias("dx"),
                        F.lit(dy).cast("long").alias("dy"),
                    )
                    for dx, dy in _STENCIL
                ]
            )
        ).alias("o"),
        "cx", "cy",
    ).select(
        "a_id", "ax", "ay",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    cand = probes.join(
        cells_b.select(
            F.col("vec_id").alias("b_id"),
            F.col("x").alias("bx"),
            F.col("y").alias("by"),
            F.col("cx").alias("jx"),
            F.col("cy").alias("jy"),
        ),
        ["jx", "jy"],
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return cand.filter(d2 <= F.lit(eps2).cast("long")).select(
        "a_id", "b_id"
    )


def stencil_neighbors(cells: DataFrame, eps2: int) -> DataFrame:
    """(a_id, b_id) exact eps-neighbor pairs (both directions, a≠b)
    from the 9-cell stencil equi-join + d² ≤ eps² verify."""
    probes = cells.select(
        F.col("vec_id").alias("a_id"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(dx).cast("long").alias("dx"),
                        F.lit(dy).cast("long").alias("dy"),
                    )
                    for dx, dy in _STENCIL
                ]
            )
        ).alias("o"),
        "cx", "cy",
    ).select(
        "a_id", "ax", "ay",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    cand = probes.join(
        cells.select(
            F.col("vec_id").alias("b_id"),
            F.col("x").alias("bx"),
            F.col("y").alias("by"),
            F.col("cx").alias("jx"),
            F.col("cy").alias("jy"),
        ),
        ["jx", "jy"],
    ).filter(F.col("a_id") != F.col("b_id"))
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return cand.filter(d2 <= F.lit(eps2).cast("long")).select(
        "a_id", "b_id"
    )


def grid_dbscan(
    pts: DataFrame,
    eps: int,
    eps2: int,
    min_nb: int,
    off: int,
    max_candidates: int | None = None,
    route_hint: str = "q_dbscan_capped",
) -> DataFrame:
    """Full-semantics DBSCAN over (vec_id, x, y) integer points:
    (vec_id, role ∈ {core, border, noise}, cluster) with cluster = min
    core vec_id per density-connected component (deterministic).

    ``max_candidates``: refuse (ValueError naming ``route_hint``) when
    the cell-grain price check predicts more stencil candidates — the
    density analog of basket.refuse_excess_fanout. None skips (callers
    that bounded occupancy upstream, e.g. the cell-capped escape).
    """
    from .dedup import connected_components

    # r15 (VERDICT r14 #5, the r14 multi-consumer checkpoint rule):
    # cells feeds BOTH sides of the stencil self-join (plus the price
    # check); nbrs feeds deg, the core-core edge join and the border
    # attach; core feeds both edge-filter sides and the border
    # anti-join. All three were LAZY checkpoints — AQE materializes
    # independent query stages concurrently, so each consumer could
    # recompute the un-filled cache. EAGER computes each exactly once.
    cells = with_cells(pts, eps, off).localCheckpoint(eager=True)
    if max_candidates is not None:
        pred = predicted_candidates(cells)
        if pred > max_candidates:
            raise ValueError(
                f"exact grid-DBSCAN REFUSED: predicted stencil "
                f"candidates {pred:,} exceed max_candidates="
                f"{max_candidates:,} (density cliff: candidates grow "
                f"as Σ occ(cell)·occ(stencil) — measured 12.8× at sf1 "
                f"and quadratic on degenerate corpora). Use the "
                f"certified cell-capped route instead: {route_hint}; "
                f"or pass max_candidates=None to force the exact plan "
                f"deliberately."
            )
    nbrs = stencil_neighbors(cells, eps2).localCheckpoint(eager=True)
    deg = nbrs.groupBy("a_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_nb")
    )
    core = (
        deg.filter(F.col("n_nb") >= min_nb)
        .select(F.col("a_id").alias("vec_id"))
        .localCheckpoint(eager=True)
    )
    core_a = core.select(F.col("vec_id").alias("a_id"))
    core_b = core.select(F.col("vec_id").alias("b_id"))
    ce = (
        nbrs.join(core_a, "a_id")
        .join(core_b, "b_id")
        .select(F.col("a_id").alias("id_a"), F.col("b_id").alias("id_b"))
    )
    lab = connected_components(
        ce,
        core.select(F.col("vec_id").alias("n")),
        id_col="n",
        label_col="cluster",
    ).select(F.col("n").alias("vec_id"), "cluster")
    core_rows = lab.select(
        "vec_id", F.lit("core").alias("role"), "cluster"
    )
    border = (
        nbrs.join(
            core.select(F.col("vec_id").alias("a_id")), "a_id", "left_anti"
        )
        .join(
            lab.select(
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
    labeled = core_rows.unionByName(border)
    noise = pts.join(labeled.select("vec_id"), "vec_id", "left_anti").select(
        "vec_id",
        F.lit("noise").alias("role"),
        F.lit(None).cast("long").alias("cluster"),
    )
    return labeled.unionByName(noise)


def cell_cap_split(
    pts: DataFrame, eps: int, off: int, cap: int
) -> tuple[DataFrame, DataFrame]:
    """(kept, dropped) by the portable per-cell md5 rank: at most
    ``cap`` points survive per eps-cell (rank by
    md5('cx:cy:vec_id'), vec_id — engine-portable, deterministic, the
    degree_capped_edges sampling discipline). Hot cells cost cap²
    after this; uniform data is untouched."""
    from pyspark.sql import Window

    cells = with_cells(pts, eps, off)
    rk = F.row_number().over(
        Window.partitionBy("cx", "cy").orderBy(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("cx").cast("string"),
                    F.col("cy").cast("string"),
                    F.col("vec_id").cast("string"),
                )
            ),
            F.col("vec_id"),
        )
    )
    # r15: ranked feeds kept AND dropped — eager (multi-consumer rule)
    ranked = cells.select("vec_id", "x", "y", rk.alias("rk")).localCheckpoint(
        eager=True
    )
    kept = ranked.filter(F.col("rk") <= cap).select("vec_id", "x", "y")
    dropped = ranked.filter(F.col("rk") > cap).select("vec_id", "x", "y")
    return kept, dropped
