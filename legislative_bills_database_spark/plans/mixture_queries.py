"""Round-6 phase-35 queries: corpus mixture & structure diagnostics.

The governance layer a training-data pipeline runs before shipping a
mixture: privacy re-identification risk beyond k-anonymity
(l-diversity), the community quality of an attribute partition over the
co-purchase graph (modularity — 'is this blocking key real structure'),
hash-certified iterative proportional fitting (IPF / raking — the
domain×language reweighting classic that hits target marginals), and
per-source Jensen-Shannon divergence from the corpus-wide word
distribution (which sources skew the mixture).

Reference parity note: the reference (patrick95350/legislative-bills-
database) has no mixture surface — this module extends the
training-pipeline superset (SURVEY.md §2.10) next to q_data_mixture /
q_domain_cap / q_dsir_weights.

Engine-parity notes: integer counts end-to-end where a statistic allows
it (modularity is a single rational — one IEEE division); the IPF
iterate follows the q_pagerank_exact / q_pca_power fixed-point
discipline (ppm-quantized integer weights, floor-divided scale factors,
driver loop on bounded |sources|x|langs| state mirrored term-for-term
by chained CTEs); ln-based terms (JS, entropy) ride single IEEE
expressions over exact integer counts — the q_mutual_info precedent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import text as T
from ..io import load_table
from .registry import query
from .roundfive_queries import _COPURCHASE_EDGES, _copurchase_edges

# ---------------------------------------------------------------------------
# l-diversity (privacy audit beyond k-anonymity)
# ---------------------------------------------------------------------------


@query(
    "q_l_diversity",
    """
    WITH g AS (
      SELECT o_orderpriority, year(o_orderdate) AS yr,
             CAST(COUNT(*) AS BIGINT) AS group_size,
             CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS l
      FROM orders GROUP BY 1, 2
    ), cells AS (
      SELECT o_orderpriority, year(o_orderdate) AS yr, o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY 1, 2, 3
    ), t AS (
      SELECT o_orderpriority, yr, CAST(SUM(c) AS DOUBLE) AS tot
      FROM cells GROUP BY 1, 2
    ), e AS (
      SELECT o_orderpriority, yr,
             SUM(-(CAST(c AS DOUBLE) / tot) * ln(CAST(c AS DOUBLE) / tot))
               AS ent
      FROM cells JOIN t USING (o_orderpriority, yr)
      GROUP BY 1, 2
    )
    SELECT l, CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(group_size) AS BIGINT) AS min_group_size,
           ROUND(MIN(ent), 6) AS min_entropy
    FROM g JOIN e USING (o_orderpriority, yr)
    GROUP BY l
    """,
)
def q_l_diversity(spark, sf_dir):
    """l-diversity audit over the (priority, order-year) quasi-identifier
    with order status as the sensitive attribute: for each distinct-l
    level, how many QI groups sit at that l, their smallest size
    (the k-anonymity tie-in), and the worst per-group entropy (entropy
    l-diversity — a group can have l=3 yet be 99% one value). Two
    hash-aggregation passes, integer counts, ln over exact ratios."""
    orders = load_table(spark, sf_dir, "orders")
    qi = [F.col("o_orderpriority"), F.year("o_orderdate").alias("yr")]
    g = orders.groupBy(*qi).agg(
        F.count("*").cast("long").alias("group_size"),
        F.countDistinct("o_orderstatus").cast("long").alias("l"),
    )
    cells = orders.groupBy(
        *qi, F.col("o_orderstatus")
    ).agg(F.count("*").alias("c"))
    tots = cells.groupBy("o_orderpriority", "yr").agg(
        F.sum("c").cast("double").alias("tot")
    )
    ent = (
        cells.join(tots, ["o_orderpriority", "yr"])
        .groupBy("o_orderpriority", "yr")
        .agg(
            F.sum(
                -(F.col("c").cast("double") / F.col("tot"))
                * F.log(F.col("c").cast("double") / F.col("tot"))
            ).alias("ent")
        )
    )
    return (
        g.join(ent, ["o_orderpriority", "yr"])
        .groupBy("l")
        .agg(
            F.count("*").cast("long").alias("n_groups"),
            F.min("group_size").cast("long").alias("min_group_size"),
            F.round(F.min("ent"), 6).alias("min_entropy"),
        )
    )


# ---------------------------------------------------------------------------
# Modularity of an attribute partition over the co-purchase graph
# ---------------------------------------------------------------------------


@query(
    "q_modularity",
    f"""
    WITH {_COPURCHASE_EDGES},
    lbl AS (SELECT p_partkey, p_brand FROM part),
    le AS (
      SELECT la.p_brand AS ba, lb.p_brand AS bb
      FROM e
      JOIN lbl la ON la.p_partkey = e.src
      JOIN lbl lb ON lb.p_partkey = e.dst
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM le),
    intra AS (
      SELECT CAST(COALESCE(SUM(CASE WHEN ba = bb THEN 1 ELSE 0 END), 0)
        AS BIGINT) AS ec
      FROM le
    ),
    deg AS (
      SELECT b, CAST(SUM(c) AS BIGINT) AS dc FROM (
        SELECT ba AS b, COUNT(*) AS c FROM le GROUP BY 1
        UNION ALL
        SELECT bb AS b, COUNT(*) AS c FROM le GROUP BY 1
      ) GROUP BY 1
    ),
    dsq AS (SELECT CAST(SUM(dc * dc) AS BIGINT) AS sd FROM deg)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_communities,
           m.m AS n_edges, intra.ec AS intra_edges,
           ROUND((4.0 * m.m * intra.ec - CAST(dsq.sd AS DOUBLE))
                 / (4.0 * m.m * m.m), 6) AS modularity
    FROM m, intra, dsq
    """,
)
def q_modularity(spark, sf_dir):
    """Newman modularity of the BRAND partition over the co-purchase
    part graph — 'does this attribute explain the graph's structure',
    the quality score behind any blocking/community choice. Exact as a
    single rational: Q·4m² = 4m·Σe_c − Σd_c², all 64-bit integer
    (edge counts and degree sums), one IEEE division at the end. The
    part→brand label is a broadcast dim onto the edge list; degrees
    come from one union-all aggregation — no second self-join."""
    edges = _copurchase_edges(spark, sf_dir).select("src", "dst")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    le = (
        edges.join(
            F.broadcast(part.withColumnRenamed("p_brand", "ba")),
            edges.src == F.col("p_partkey"),
        )
        .drop("p_partkey")
        .join(
            F.broadcast(part.withColumnRenamed("p_brand", "bb")),
            F.col("dst") == F.col("p_partkey"),
        )
        .select("ba", "bb")
    )
    deg = (
        le.select(F.col("ba").alias("b"))
        .unionByName(le.select(F.col("bb").alias("b")))
        .groupBy("b")
        .agg(F.count("*").cast("long").alias("dc"))
    )
    tot = le.agg(
        F.count("*").cast("long").alias("m"),
        F.coalesce(
            F.sum(F.when(F.col("ba") == F.col("bb"), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("ec"),
    )
    dstats = deg.agg(
        F.count("*").cast("long").alias("n_communities"),
        F.sum(F.col("dc") * F.col("dc")).cast("long").alias("sd"),
    )
    return (
        tot.join(F.broadcast(dstats))  # 1-row x 1-row: allowed BNLJ shape
        .select(
            "n_communities",
            F.col("m").alias("n_edges"),
            F.col("ec").alias("intra_edges"),
            F.round(
                (
                    4.0 * F.col("m") * F.col("ec")
                    - F.col("sd").cast("double")
                )
                / (4.0 * F.col("m") * F.col("m")),
                6,
            ).alias("modularity"),
        )
    )


# ---------------------------------------------------------------------------
# Hash-certified IPF raking (domain x language mixture reweighting)
# ---------------------------------------------------------------------------

_IPF_SCALE = 1_000_000
_IPF_ROUNDS = 3  # each round = one row sweep + one column sweep


def _sql_ipf(rounds: int) -> str:
    steps = []
    prev = "w0"
    for k in range(1, rounds + 1):
        steps.append(f"""
    rs{k} AS (
      SELECT source, SUM(n * w) AS s FROM {prev} GROUP BY 1
    ),
    rw{k} AS (
      SELECT w.source, w.lang, w.n,
             (w.w * ((SELECT tr FROM tgt) * {_IPF_SCALE} // rs{k}.s))
               // {_IPF_SCALE} AS w
      FROM {prev} w JOIN rs{k} ON rs{k}.source = w.source
    ),
    cs{k} AS (
      SELECT lang, SUM(n * w) AS s FROM rw{k} GROUP BY 1
    ),
    w{k} AS (
      SELECT w.source, w.lang, w.n,
             (w.w * ((SELECT tc FROM tgt) * {_IPF_SCALE} // cs{k}.s))
               // {_IPF_SCALE} AS w
      FROM rw{k} w JOIN cs{k} ON cs{k}.lang = w.lang
    )""")
        prev = f"w{k}"
    return f"""
    WITH cells AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2
    ),
    tgt AS (
      SELECT CAST(SUM(n) AS BIGINT) * {_IPF_SCALE}
               // COUNT(DISTINCT source) AS tr,
             CAST(SUM(n) AS BIGINT) * {_IPF_SCALE}
               // COUNT(DISTINCT lang) AS tc
      FROM cells
    ),
    w0 AS (
      SELECT source, lang, n, CAST({_IPF_SCALE} AS BIGINT) AS w FROM cells
    ),
    {",".join(steps)}
    SELECT source, lang, n AS n_docs, CAST(w AS BIGINT) AS weight_fp,
           ROUND(CAST(n * w AS DOUBLE)
                 / (SELECT SUM(CAST(n AS DOUBLE) * {_IPF_SCALE}) FROM w0),
                 6) AS weighted_share
    FROM {prev}
    """


@query("q_ipf_raking", _sql_ipf(_IPF_ROUNDS))
def q_ipf_raking(spark, sf_dir):
    """Iterative proportional fitting (raking) of the source×lang cell
    weights toward BALANCED marginals — the mixture-reweighting classic
    ('each source an equal share, each language an equal share') that
    q_data_mixture's fixed ratios can't express when both margins must
    hold at once. Hash-certified via the fixed-point discipline: ppm
    integer weights, each sweep multiplying by a floor-divided scale
    factor, mirrored term-for-term by the chained-CTE oracle. The
    data-sized job is ONE hash aggregation (the cell counts); the
    iteration runs on |sources|×|langs| driver cells (the pca.py
    bounded-state precedent — at 100 TB the margins still fit a laptop,
    only the counts pass scales). Arbitrary-precision driver ints; the
    oracle's BIGINT products error loudly, never wrap, if a margin ever
    outgrows 64 bits."""
    docs = load_table(spark, sf_dir, "documents")
    cells = (
        docs.groupBy("source", "lang")
        .agg(F.count("*").cast("long").alias("n"))
        .collect()
    )  # bounded: |sources| x |langs| cells, never data-sized
    n = {(r["source"], r["lang"]): int(r["n"]) for r in cells}
    total = sum(n.values())
    sources = sorted({s for s, _ in n})
    langs = sorted({l for _, l in n})
    tr = total * _IPF_SCALE // len(sources)
    tc = total * _IPF_SCALE // len(langs)
    w = {k: _IPF_SCALE for k in n}
    for _ in range(_IPF_ROUNDS):
        for s in sources:
            row_mass = sum(n[k] * w[k] for k in n if k[0] == s)
            f = tr * _IPF_SCALE // row_mass
            for k in n:
                if k[0] == s:
                    w[k] = w[k] * f // _IPF_SCALE
        for l in langs:
            col_mass = sum(n[k] * w[k] for k in n if k[1] == l)
            f = tc * _IPF_SCALE // col_mass
            for k in n:
                if k[1] == l:
                    w[k] = w[k] * f // _IPF_SCALE
    rows = [(s, l, n[(s, l)], w[(s, l)]) for s, l in n]
    out = spark.createDataFrame(
        rows, "source string, lang string, n_docs long, weight_fp long"
    )
    # the share rounds SPARK-side: Python's round() is banker's, while
    # Spark ROUND and DuckDB ROUND both tie away from zero
    base = float(total) * _IPF_SCALE
    return out.select(
        "source",
        "lang",
        "n_docs",
        "weight_fp",
        F.round(
            (F.col("n_docs") * F.col("weight_fp")).cast("double")
            / F.lit(base),
            6,
        ).alias("weighted_share"),
    )


# ---------------------------------------------------------------------------
# Per-source Jensen-Shannon divergence from the corpus word distribution
# ---------------------------------------------------------------------------

_JS_TOP = 200


@query(
    "q_js_divergence",
    f"""
    WITH tok AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS word
      FROM documents
    ),
    topw AS (
      SELECT word FROM (
        SELECT word, COUNT(*) AS c FROM tok GROUP BY 1
        ORDER BY c DESC, word ASC LIMIT {_JS_TOP}
      )
    ),
    sc AS (
      SELECT t.source, t.word, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok t JOIN topw USING (word) GROUP BY 1, 2
    ),
    st AS (SELECT source, SUM(c) AS tot FROM sc GROUP BY 1),
    gc AS (SELECT word, SUM(c) AS c FROM sc GROUP BY 1),
    gt AS (SELECT SUM(c) AS tot FROM gc)
    SELECT s.source,
           ROUND(SUM(
             0.5 * (CAST(s.c AS DOUBLE) / st.tot)
                 * ln((CAST(s.c AS DOUBLE) / st.tot)
                      / (0.5 * (CAST(s.c AS DOUBLE) / st.tot
                                + CAST(g.c AS DOUBLE) / gt.tot)))
             + 0.5 * (CAST(g.c AS DOUBLE) / gt.tot)
                 * ln((CAST(g.c AS DOUBLE) / gt.tot)
                      / (0.5 * (CAST(s.c AS DOUBLE) / st.tot
                                + CAST(g.c AS DOUBLE) / gt.tot)))
           ), 6) AS js_nats,
           CAST(COUNT(*) AS BIGINT) AS n_terms
    FROM sc s
    JOIN st USING (source)
    JOIN gc g USING (word)
    CROSS JOIN gt
    GROUP BY 1
    """,
)
def q_js_divergence(spark, sf_dir):
    """Jensen-Shannon divergence of each source's word distribution from
    the corpus-wide distribution, restricted to the global top-200 words
    (rank tie-broken by word so the vocabulary is engine-deterministic)
    — the mixture-drift score that says WHICH source skews the corpus.
    Caveat shared with q_mutual_info: absent-word terms are dropped from
    both distributions (the join is inner on observed (source, word)
    cells), so this is JS over the source's observed support — the
    standard sparse-count formulation. Integer counts, single-expression
    IEEE ln terms (the q_mutual_info parity precedent); top-word
    selection is one TakeOrderedAndProject broadcast back onto the
    token stream."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(T.tokens("text")).alias("word")
    )
    topw = (
        tok.groupBy("word")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("word").asc())
        .limit(_JS_TOP)
        .select("word")
    )
    sc = (
        tok.join(F.broadcast(topw), "word")
        .groupBy("source", "word")
        .agg(F.count("*").cast("long").alias("c"))
    )
    st = sc.groupBy("source").agg(F.sum("c").alias("tot"))
    gc = sc.groupBy("word").agg(F.sum("c").alias("c_g"))
    gt = sc.agg(F.sum("c").alias("tot_g"))
    p = F.col("c").cast("double") / F.col("tot")
    q = F.col("c_g").cast("double") / F.col("tot_g")
    m = 0.5 * (p + q)
    return (
        sc.join(F.broadcast(st), "source")
        .join(F.broadcast(gc), "word")
        .join(F.broadcast(gt))  # 1-row broadcast: allowed BNLJ shape
        .groupBy("source")
        .agg(
            F.round(
                F.sum(0.5 * p * F.log(p / m) + 0.5 * q * F.log(q / m)), 6
            ).alias("js_nats"),
            F.count("*").cast("long").alias("n_terms"),
        )
    )
