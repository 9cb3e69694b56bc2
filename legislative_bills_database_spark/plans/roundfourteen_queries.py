"""Round-14 phases 113+: the entity-resolution endgame (Fellegi-Sunter
match pairs → connected components → survivorship golden records),
SAX motif discovery, and the round's scale escapes.

VERDICT r13 "Next round" items 2-3 and 6-8. Discipline as everywhere:
exact-integer arithmetic wherever a value crosses engines, blocked /
bucketed candidate generation (never all-pairs), one data-sized
shuffle per query, quadratic-capable plans behind measured-refusal
interlocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..io import load_table
from .registry import query
from .roundthirteen_queries import (
    _FS_MATCH,
    _FS_SCORE_DUCK,
    _FS_WA,
    _FS_WD,
    _FSB_BAND_A,
    _FSB_BAND_B,
)

# ---------------------------------------------------------------------------
# phase 113: entity-resolution clusters (FS matches -> CC -> survivorship)
# ---------------------------------------------------------------------------


def _fs_match_pairs(cust: DataFrame) -> DataFrame:
    """(id_a, id_b) customer pairs the fine-blocked Fellegi-Sunter
    scorer classifies as matches (score ≥ _FS_MATCH) — the candidate
    generator of q_fellegi_blocked (roundthirteen_queries.py) re-emitted
    at PAIR grain instead of score-histogram grain. Same blocking
    (nation × segment × $1000 band), same four-field integer weights,
    so the pair set is exactly the one the blocked scorer's pinned
    histogram counts."""
    a = cust.alias("a")
    b = cust.alias("b")
    pa = F.round(F.col("a.c_acctbal") * 100).cast("long")
    pb = F.round(F.col("b.c_acctbal") * 100).cast("long")
    den = F.lit(100_000).cast("long")
    band_a = ((pa - pa % den) / den).cast("long")
    band_b = ((pb - pb % den) / den).cast("long")
    agree = [
        band_a == band_b,  # constant True inside a fine block
        pa % F.lit(100).cast("long") == pb % F.lit(100).cast("long"),
        F.expr("right(a.c_name, 3)") == F.expr("right(b.c_name, 3)"),
        (F.col("a.c_acctbal") >= 0) == (F.col("b.c_acctbal") >= 0),
    ]
    score = None
    for cond, wa, wd in zip(agree, _FS_WA, _FS_WD):
        term = F.when(cond, F.lit(wa).cast("long")).otherwise(
            F.lit(wd).cast("long")
        )
        score = term if score is None else score + term
    return (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
            & (band_a == band_b)
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("id_a"),
            F.col("b.c_custkey").alias("id_b"),
            score.alias("score"),
        )
        .filter(F.col("score") >= _FS_MATCH)
        .select("id_a", "id_b")
    )


@query(
    "q_er_clusters",
    f"""
    WITH RECURSIVE mp AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM customer a JOIN customer b
        ON a.c_nationkey = b.c_nationkey
       AND a.c_mktsegment = b.c_mktsegment
       AND {_FSB_BAND_A} = {_FSB_BAND_B}
       AND a.c_custkey < b.c_custkey
      WHERE {_FS_SCORE_DUCK} >= {_FS_MATCH}
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM mp
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM mp
    ), cc AS (
      SELECT src AS node, src AS lbl FROM edges
      UNION
      SELECT e.dst AS node, cc.lbl AS lbl
      FROM cc JOIN edges e ON e.src = cc.node
    ), lab AS (
      SELECT node, MIN(lbl) AS cluster_id FROM cc GROUP BY node
    ), mem AS (
      SELECT l.cluster_id, c.c_custkey, c.c_name, c.c_acctbal,
             ROW_NUMBER() OVER (
               PARTITION BY l.cluster_id
               ORDER BY c.c_acctbal DESC, c.c_custkey ASC) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY l.cluster_id)
                  AS BIGINT) AS n_members,
             CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) OVER (
                  PARTITION BY l.cluster_id) AS BIGINT) AS total_cents
      FROM lab l JOIN customer c ON c.c_custkey = l.node
    )
    SELECT cluster_id, n_members,
           c_custkey AS canon_custkey,
           c_name AS canon_name,
           ROUND(c_acctbal, 2) AS canon_acctbal,
           total_cents
    FROM mem WHERE rn = 1
    """,
)
def q_er_clusters(spark, sf_dir):
    """Entity-resolution clusters — the ER endgame the Fellegi-Sunter
    scorer exists for (its match verdicts are pair-grain; an MDM system
    needs ENTITY grain): fine-blocked FS match pairs
    (q_fellegi_blocked's exact pair set) → connected components
    (operators/dedup.connected_components — min-label propagation with
    pointer jumping, the MinHash-CC machinery reused on linkage edges)
    → survivorship golden record per cluster (q_survivorship's
    discipline: highest acctbal wins, custkey the deterministic
    tiebreak), with the cluster census (n_members, exact integer cents
    total) riding the same window shuffle.

    Hash-certified against a DuckDB RECURSIVE-CTE transitive closure:
    the oracle enumerates (node, reachable-label) pairs and takes
    MIN(label) per node — literally the definition of the min-label
    component — so the certificate is algorithm-independent: Spark's
    pointer-jumping loop and the oracle's naive closure must land on
    the IDENTICAL clustering. A pytest pin additionally replays
    union-find over the collected match pairs and checks membership +
    size histogram.

    Scale shape: pair generation is blocking-bounded (the measured
    q_fellegi_blocked escape — never all-pairs), CC is the distributed
    O(log diameter) loop with the ≤2M-edge driver fast path, and
    survivorship is ONE window shuffle at member grain. Matched-node
    count ≪ |customers| (only pair-participating ids enter CC), so
    every post-blocking frame is match-set-sized — at 100 TB the big
    surfaces are one blocked self-join plus a member-grain window.
    """
    cust = load_table(spark, sf_dir, "customer")
    pairs = _fs_match_pairs(cust).persist()
    from ..operators.dedup import connected_components

    nodes = (
        pairs.select(F.col("id_a").alias("node"))
        .unionByName(pairs.select(F.col("id_b").alias("node")))
        .distinct()
    )
    labels = connected_components(
        pairs, nodes, id_col="node", label_col="cluster_id"
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    w = Window.partitionBy("cluster_id")
    w_rank = w.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    mem = (
        labels.join(cust, labels["node"] == cust["c_custkey"])
        .select(
            "cluster_id",
            "c_custkey",
            "c_name",
            "c_acctbal",
            F.row_number().over(w_rank).alias("rn"),
            F.count(F.lit(1)).over(w).cast("long").alias("n_members"),
            F.sum(cents).over(w).cast("long").alias("total_cents"),
        )
    )
    return mem.filter(F.col("rn") == 1).select(
        "cluster_id",
        "n_members",
        F.col("c_custkey").alias("canon_custkey"),
        F.col("c_name").alias("canon_name"),
        F.round("c_acctbal", 2).alias("canon_acctbal"),
        "total_cents",
    )


# ---------------------------------------------------------------------------
# phase 114: SAX motif discovery (exact-integer symbolization)
# ---------------------------------------------------------------------------

_SAX_W = 7   # PAA window: days per segment
_SAX_L = 3   # motif word length in segments


@query(
    "q_sax_motifs",
    f"""
    WITH daily AS (
      SELECT n.n_name, o.o_orderdate AS d,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ), pos AS (
      SELECT n_name, rev,
             ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY d) - 1 AS p
      FROM daily
    ), paa AS (
      SELECT n_name, p // {_SAX_W} AS win_id,
             CAST(SUM(rev) AS BIGINT) AS v
      FROM pos GROUP BY 1, 2 HAVING COUNT(*) = {_SAX_W}
    ), ranked AS (
      SELECT n_name, win_id, v,
             ROW_NUMBER() OVER (
               PARTITION BY n_name ORDER BY v, win_id) - 1 AS rn
      FROM paa
    ), nw AS (
      SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_windows FROM paa
      GROUP BY 1
    ), bp AS (
      SELECT nw.n_name, k.k,
             4 * lo.v + (((nw.n_windows - 1) * k.k) % 4)
                 * (COALESCE(hi.v, lo.v) - lo.v) AS bp4
      FROM nw
      CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS k) k
      JOIN ranked lo ON lo.n_name = nw.n_name
       AND lo.rn = ((nw.n_windows - 1) * k.k) // 4
      LEFT JOIN ranked hi ON hi.n_name = nw.n_name
       AND hi.rn = ((nw.n_windows - 1) * k.k) // 4 + 1
    ), bps AS (
      SELECT n_name,
             MAX(CASE WHEN k = 1 THEN bp4 END) AS b1,
             MAX(CASE WHEN k = 2 THEN bp4 END) AS b2,
             MAX(CASE WHEN k = 3 THEN bp4 END) AS b3
      FROM bp GROUP BY 1
    ), sym AS (
      SELECT p.n_name, p.win_id,
             CASE WHEN 4 * p.v <= b.b1 THEN 'a'
                  WHEN 4 * p.v <= b.b2 THEN 'b'
                  WHEN 4 * p.v <= b.b3 THEN 'c'
                  ELSE 'd' END AS s
      FROM paa p JOIN bps b ON p.n_name = b.n_name
    ), words AS (
      SELECT n_name,
             s || LEAD(s, 1) OVER w || LEAD(s, 2) OVER w AS word
      FROM sym WINDOW w AS (PARTITION BY n_name ORDER BY win_id)
    ), cnt AS (
      SELECT n_name, word, CAST(COUNT(*) AS BIGINT) AS n_occur,
             ROW_NUMBER() OVER (
               PARTITION BY n_name
               ORDER BY COUNT(*) DESC, word) AS rk
      FROM words WHERE word IS NOT NULL GROUP BY 1, 2
    )
    SELECT c.n_name, c.word AS motif, c.n_occur, nw.n_windows
    FROM cnt c JOIN nw ON c.n_name = nw.n_name
    WHERE c.rk = 1
    """,
)
def q_sax_motifs(spark, sf_dir):
    """SAX motif discovery (Lin et al. 2003) over the per-nation daily
    revenue series — the classic series-mining pipeline (z-normalize →
    PAA → symbolize → most-frequent word) that q_sax_symbols'
    tercile-NTILE sketch gestured at, now with the REAL structure:
    fixed-width PAA segments ({_SAX_W} days), alphabet-4 symbolization
    against per-series linear-interpolated quartile breakpoints (the
    q_quantiles order-statistics machinery), and the motif = each
    series' most frequent {_SAX_L}-segment word.

    Engine-parity design (the documented blocker this query waited
    on): classic SAX z-normalizes then cuts at Gaussian breakpoints —
    both float. Equi-depth (quantile) breakpoints make z-normalization
    a PROVABLE no-op: z is a per-series monotone affine map, quantiles
    are equivariant and comparisons invariant under it, and PAA means
    over equal-width windows order like window SUMS — so the symbol
    sequence of the z-normed, PAA-meaned series equals that of the raw
    integer-cents window sums, and the plan computes the latter.
    Breakpoints stay exact by 4×-scaling the interpolation: at
    fractional position (n−1)k/4 the interpolated quantile is
    v_lo + frac·(v_hi − v_lo) with frac ∈ {{0, ¼, ½, ¾}}, so
    4·bp = 4·v_lo + ((n−1)k mod 4)·(v_hi − v_lo) is BIGINT and the
    symbol test is 4·v ≤ 4·bp — no float EVER materializes, both
    engines run the identical integer pipeline, and the oracle
    hash-certifies symbolization, words, and motif together.

    Scale shape: one fact-table shuffle (the daily grouped sum, dims
    broadcast), then everything is window/agg work partitioned by
    series key — per-task state bounded by series length, series
    parallelism unbounded. The breakpoint frames are series-grain
    (3 rows per series) and broadcast back; order statistics come from
    a per-series ranking window, not a global sort."""
    from ..io import load_tables

    orders, customer, nation = load_tables(
        spark, sf_dir, "orders", "customer", "nation"
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    daily = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.col("o_orderdate").alias("d"))
        .agg(F.sum(cents).cast("long").alias("rev"))
    )
    wpos = Window.partitionBy("n_name").orderBy("d")
    pos = daily.select(
        "n_name",
        "rev",
        (F.row_number().over(wpos) - 1).cast("long").alias("p"),
    )
    paa = (
        pos.groupBy("n_name", F.expr(f"p div {_SAX_W}").alias("win_id"))
        .agg(
            F.sum("rev").cast("long").alias("v"),
            F.count(F.lit(1)).alias("c"),
        )
        .filter(F.col("c") == _SAX_W)
        .select("n_name", "win_id", "v")
        # reused by ranked / nw / sym: truncate lineage so the fact
        # scan + window subtree executes once, not three times
        .localCheckpoint(eager=False)
    )
    wrank = Window.partitionBy("n_name").orderBy("v", "win_id")
    ranked = paa.select(
        "n_name",
        "v",
        (F.row_number().over(wrank) - 1).cast("long").alias("rn"),
    ).localCheckpoint(eager=False)  # probed twice (lo + hi)
    nw = paa.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_windows")
    )
    ks = (
        nw.select(
            "n_name",
            "n_windows",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("k"),
        )
        .withColumn("lo_idx", F.expr("((n_windows - 1) * k) div 4"))
        .withColumn("frac4", F.expr("((n_windows - 1) * k) % 4"))
    )
    lo = ranked.select(
        F.col("n_name").alias("lo_name"),
        F.col("rn").alias("lo_rn"),
        F.col("v").alias("v_lo"),
    )
    hi = ranked.select(
        F.col("n_name").alias("hi_name"),
        F.col("rn").alias("hi_rn"),
        F.col("v").alias("v_hi"),
    )
    bp = (
        ks.join(
            lo,
            (F.col("n_name") == F.col("lo_name"))
            & (F.col("lo_rn") == F.col("lo_idx")),
        )
        .join(
            hi,
            (F.col("n_name") == F.col("hi_name"))
            & (F.col("hi_rn") == F.col("lo_idx") + 1),
            "left",
        )
        .select(
            "n_name",
            "k",
            (
                4 * F.col("v_lo")
                + F.col("frac4")
                * (F.coalesce(F.col("v_hi"), F.col("v_lo")) - F.col("v_lo"))
            ).alias("bp4"),
        )
    )
    bps = bp.groupBy("n_name").agg(
        F.max(F.when(F.col("k") == 1, F.col("bp4"))).alias("b1"),
        F.max(F.when(F.col("k") == 2, F.col("bp4"))).alias("b2"),
        F.max(F.when(F.col("k") == 3, F.col("bp4"))).alias("b3"),
    )
    sym = paa.join(F.broadcast(bps), "n_name").select(
        "n_name",
        "win_id",
        F.when(4 * F.col("v") <= F.col("b1"), "a")
        .when(4 * F.col("v") <= F.col("b2"), "b")
        .when(4 * F.col("v") <= F.col("b3"), "c")
        .otherwise("d")
        .alias("s"),
    )
    wseq = Window.partitionBy("n_name").orderBy("win_id")
    words = sym.select(
        "n_name",
        F.concat(
            F.col("s"), F.lead("s", 1).over(wseq), F.lead("s", 2).over(wseq)
        ).alias("word"),
    ).filter(F.col("word").isNotNull())
    cnt = words.groupBy("n_name", "word").agg(
        F.count(F.lit(1)).cast("long").alias("n_occur")
    )
    wtop = Window.partitionBy("n_name").orderBy(
        F.col("n_occur").desc(), F.col("word").asc()
    )
    return (
        cnt.withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") == 1)
        .join(F.broadcast(nw), "n_name")
        .select(
            "n_name", F.col("word").alias("motif"), "n_occur", "n_windows"
        )
    )


# ---------------------------------------------------------------------------
# phase 115: cell-capped DBSCAN (the density cliff's escape hatch)
# ---------------------------------------------------------------------------

from .roundthirteen_queries import (  # noqa: E402
    _DB_EPS,
    _DB_EPS2,
    _DB_MINNB,
    _DB_OFF,
)

_DBC_CAP = 32  # max points per eps-cell entering the stencil join

_SQL_DB_POINTS = """p AS (
      SELECT vec_id,
             CAST(ROUND(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT)
               AS x,
             CAST(ROUND(CAST(embedding[2] AS DOUBLE) * 1000) AS BIGINT)
               AS y
      FROM embeddings
    )"""


def _sql_db_pipe(src: str, t: str) -> str:
    """Brute-force DBSCAN role CTE chain over ``src`` (vec_id, x, y):
    emits nb{t}/core{t}/ce{t}/r{t}/lab{t}/border{t}/rolled{t} — the
    q_dbscan oracle's pipeline parameterized so the capped twin and the
    recall twin can run it over different point sets in one query."""
    d2 = "(a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)"
    return f"""nb{t} AS (
      SELECT a.vec_id, count(*) AS n_nb
      FROM {src} a JOIN {src} b
        ON a.vec_id != b.vec_id AND {d2} <= {_DB_EPS2}
      GROUP BY 1
    ), core{t} AS (
      SELECT vec_id FROM nb{t} WHERE n_nb >= {_DB_MINNB}
    ), ce{t} AS (
      SELECT a.vec_id AS src, b.vec_id AS dst
      FROM {src} a JOIN {src} b
        ON a.vec_id != b.vec_id AND {d2} <= {_DB_EPS2}
      WHERE a.vec_id IN (SELECT vec_id FROM core{t})
        AND b.vec_id IN (SELECT vec_id FROM core{t})
    ), r{t} AS (
      SELECT vec_id AS node, vec_id AS label FROM core{t}
      UNION
      SELECT ce{t}.dst, r{t}.label
      FROM r{t} JOIN ce{t} ON r{t}.node = ce{t}.src
    ), lab{t} AS (
      SELECT node, MIN(label) AS label FROM r{t} GROUP BY 1
    ), border{t} AS (
      SELECT a.vec_id, MIN(l.label) AS label
      FROM {src} a
      JOIN {src} b ON a.vec_id != b.vec_id AND {d2} <= {_DB_EPS2}
      JOIN lab{t} l ON l.node = b.vec_id
      WHERE a.vec_id NOT IN (SELECT vec_id FROM core{t})
      GROUP BY 1
    ), rolled{t} AS (
      SELECT vec_id, 'core' AS role, CAST(label AS BIGINT) AS cluster
      FROM lab{t} JOIN core{t} ON node = vec_id
      UNION ALL
      SELECT vec_id, 'border', CAST(label AS BIGINT) FROM border{t}
      UNION ALL
      SELECT vec_id, 'noise', CAST(NULL AS BIGINT)
      FROM {src}
      WHERE vec_id NOT IN (SELECT node FROM lab{t})
        AND vec_id NOT IN (SELECT vec_id FROM border{t})
    )"""


_CX = f"((x + {_DB_OFF}) // {_DB_EPS})"
_CY = f"((y + {_DB_OFF}) // {_DB_EPS})"

_SQL_DB_CAPPED_BASE = f"""rkc AS (
      SELECT vec_id, x, y,
             ROW_NUMBER() OVER (
               PARTITION BY {_CX}, {_CY}
               ORDER BY md5(CAST({_CX} AS VARCHAR) || ':' ||
                            CAST({_CY} AS VARCHAR) || ':' ||
                            CAST(vec_id AS VARCHAR)), vec_id) AS rk
      FROM p
    ), kept AS (
      SELECT vec_id, x, y FROM rkc WHERE rk <= {_DBC_CAP}
    ), drp AS (
      SELECT vec_id, x, y FROM rkc WHERE rk > {_DBC_CAP}
    ), {_sql_db_pipe('kept', 'c')}, att AS (
      SELECT d.vec_id, MIN(l.label) AS label
      FROM drp d JOIN kept k
        ON (d.x - k.x) * (d.x - k.x) + (d.y - k.y) * (d.y - k.y)
           <= {_DB_EPS2}
      JOIN labc l ON l.node = k.vec_id
      GROUP BY 1
    ), capped AS (
      SELECT vec_id, role, cluster FROM rolledc
      UNION ALL
      SELECT vec_id, 'border' AS role, CAST(label AS BIGINT) AS cluster
      FROM att
      UNION ALL
      SELECT vec_id, 'noise' AS role, CAST(NULL AS BIGINT) AS cluster
      FROM drp WHERE vec_id NOT IN (SELECT vec_id FROM att)
    )"""


def _dbscan_capped_df(spark, sf_dir):
    from ..operators.density import (
        cell_cap_split,
        grid_dbscan,
        stencil_join,
        with_cells,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.round(F.element_at("embedding", 1).cast("double") * 1000)
        .cast("long")
        .alias("x"),
        F.round(F.element_at("embedding", 2).cast("double") * 1000)
        .cast("long")
        .alias("y"),
    )
    kept, dropped = cell_cap_split(pts, _DB_EPS, _DB_OFF, _DBC_CAP)
    kept = kept.localCheckpoint(eager=False)  # base + attach build side
    base = grid_dbscan(
        kept, _DB_EPS, _DB_EPS2, _DB_MINNB, _DB_OFF, max_candidates=None
    ).localCheckpoint(eager=False)  # output + attach labels
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
    drop_noise = (
        dropped.join(att.select("vec_id"), "vec_id", "left_anti")
        .select(
            "vec_id",
            F.lit("noise").alias("role"),
            F.lit(None).cast("long").alias("cluster"),
        )
    )
    return base.unionByName(att).unionByName(drop_noise)


@query(
    "q_dbscan_capped",
    f"""
    WITH RECURSIVE {_SQL_DB_POINTS}, {_SQL_DB_CAPPED_BASE}
    SELECT vec_id, role, cluster FROM capped
    """,
)
def q_dbscan_capped(spark, sf_dir):
    """q_dbscan's DENSITY escape (VERDICT r13 #6) — the eps-parameterized
    12.8× sf1 growth and the degenerate all-points-one-cell quadratic
    are both occupancy cliffs, so the cap goes where the cliff lives:
    at most {_DBC_CAP} points per eps-cell enter the stencil join
    (portable md5('cx:cy:vec_id') rank — the degree_capped_edges
    sampling discipline), bounding candidates by 9·cap·n REGARDLESS of
    density. Dropped points are then ATTACHED in one bounded stencil
    pass against the kept cores: within eps of a kept core → border
    with that core's min cluster label (classic DBSCAN border
    semantics), else noise — every input point still gets a row, same
    schema as q_dbscan.

    Approximation surface (honest): a dropped point that would have
    been core can only come back as border/noise, and neighbor counts
    see the subsample, so borderline cores may demote; clusters can
    split only if ALL ≥cap cross-edge witnesses in a cell were dropped
    (cap ≥ minPts makes same-cell density itself survive). When no
    cell exceeds the cap the plan IS q_dbscan — pinned exactly in
    pytest; quality at fixture grain is driver-visible via
    q_dbscan_recall.

    Scale: cap²-bounded hot cells, one extra rank window + one
    bounded attach join over the exact plan; refusal-free by
    construction (grid_dbscan runs with max_candidates=None because
    occupancy is pre-bounded)."""
    return _dbscan_capped_df(spark, sf_dir)


@query(
    "q_dbscan_recall",
    f"""
    WITH RECURSIVE {_SQL_DB_POINTS}, {_sql_db_pipe('p', 'e')},
    {_SQL_DB_CAPPED_BASE}
    SELECT CAST(count(*) AS BIGINT) AS n_points,
           CAST(SUM(CASE WHEN e.role = c.role
                     AND e.cluster IS NOT DISTINCT FROM c.cluster
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
           ROUND(CAST(SUM(CASE WHEN e.role = c.role
                     AND e.cluster IS NOT DISTINCT FROM c.cluster
                    THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
             AS recall
    FROM rollede e JOIN capped c USING (vec_id)
    """,
)
def q_dbscan_recall(spark, sf_dir):
    """Driver-visible quality certificate for q_dbscan_capped (the
    q_edit_distance_recall discipline): one (n_points, n_agree,
    recall) row where agreement means IDENTICAL (role, cluster) between
    the exact and cell-capped pipelines — stricter than set recall; a
    silent cap regression flips a driver hash instead of hiding. On
    fixtures where the cap never binds, recall is exactly 1.0 (the
    pytest pin); under the dense bench fixture the measured trade is
    recorded in BENCH_TEXTSKEW.json / ESCAPES.md."""
    from ..operators.density import grid_dbscan

    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.round(F.element_at("embedding", 1).cast("double") * 1000)
        .cast("long")
        .alias("x"),
        F.round(F.element_at("embedding", 2).cast("double") * 1000)
        .cast("long")
        .alias("y"),
    )
    exact = grid_dbscan(
        pts, _DB_EPS, _DB_EPS2, _DB_MINNB, _DB_OFF, max_candidates=None
    ).select(
        "vec_id",
        F.col("role").alias("e_role"),
        F.col("cluster").alias("e_cluster"),
    )
    capped = _dbscan_capped_df(spark, sf_dir).select(
        "vec_id",
        F.col("role").alias("c_role"),
        F.col("cluster").alias("c_cluster"),
    )
    agree = F.when(
        (F.col("e_role") == F.col("c_role"))
        & F.col("e_cluster").eqNullSafe(F.col("c_cluster")),
        1,
    ).otherwise(0)
    return (
        exact.join(capped, "vec_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.sum(agree).cast("long").alias("n_agree"),
            F.round(
                F.sum(agree).cast("double") / F.count(F.lit(1)), 6
            ).alias("recall"),
        )
    )
