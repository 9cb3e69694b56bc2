"""Corpus term-weighting: per-document TF-IDF top terms and bigram PMI
collocations — pure DataFrame plans, no UDFs.

The keyword-extraction / collocation-mining primitives a training-data
pipeline uses for topic tagging, domain clustering and tokenizer-merge
candidate mining (the counting shape of a BPE merge step). Generalizes
the reference's per-term keyword search (legiscan_search_all_bills.R:88-93)
from "does this term occur" to "which terms matter, corpus-relative".

Scale shape (TF-IDF): the only rows ever shuffled are slim
``(doc_id, term, count)`` triples — never document text. Document
frequencies aggregate to a vocabulary-bounded table that joins back as a
BROADCAST; the corpus size N is a one-row broadcast cross join. Two
shuffles total: the (doc, term) count and the per-document top-k window.

Scale shape (PMI): unigram and bigram counts are classic two-phase
map-side-combined aggregates; the unigram table is vocabulary-bounded and
broadcast onto the bigram side twice (w1, w2). Totals are one broadcast
row. The final top-k is TakeOrderedAndProject — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    round_dp: int = 6,
) -> DataFrame:
    """Top-``k`` terms per document by TF-IDF.

    score = tf · ln(N / df). Ranking uses the RAW double score (products
    of exactly-representable counts — bit-identical across engines);
    the returned score is floor-rounded to ``round_dp`` for stable
    hashing. Ties break on term ascending.
    """
    pairs = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    tf = pairs.groupBy(id_col, "term").agg(
        F.count("*").cast("double").alias("tf")
    )
    # tf already has one row per (doc, term): df is a plain count per term
    df = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    n = docs.agg(F.count("*").cast("double").alias("n"))

    raw = F.col("tf") * F.log(F.col("n") / F.col("df"))
    scale = float(10**round_dp)
    w = Window.partitionBy(id_col).orderBy(raw.desc(), F.col("term").asc())
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(id_col),
            "term",
            (F.floor(raw * scale + 0.5) / scale).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def sql_tfidf_top_terms(k: int = 3, round_dp: int = 6) -> str:
    """DuckDB twin of :func:`tfidf_top_terms` over ``documents``."""
    scale = float(10**round_dp)
    return f"""
WITH pairs AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM pairs GROUP BY doc_id, term
), df AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term
), n AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM documents
)
SELECT doc_id, term,
       floor(tf.tf * ln(n.n / df.df) * {scale!r} + 0.5) / {scale!r} AS score,
       CAST(row_number() OVER (
            PARTITION BY doc_id
            ORDER BY tf.tf * ln(n.n / df.df) DESC, term ASC
       ) AS INTEGER) AS rank
FROM tf JOIN df USING (term) CROSS JOIN n
QUALIFY rank <= {k}
"""


def sparse_cosine_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.3,
    max_df: int = 50,
    round_dp: int = 4,
) -> DataFrame:
    """Document pairs with TF-IDF-weighted sparse cosine ≥ ``threshold``.

    The lexical twin of the embedding-cosine near-dup detector: cosine
    over the sparse TF-IDF term vectors, computed through the inverted
    index — Σ u_a·u_b per co-occurring term after L2 normalization —
    so only docs SHARING a term are ever paired.

    Scale shape: the shuffled rows are slim (doc, term, weight) triples,
    never text. Terms with document frequency > ``max_df`` are dropped
    BEFORE the pair join (a df-ranked posting list contributes O(df²)
    candidate pairs; common terms carry ~zero IDF weight anyway, so
    they cost quadratically and inform nothing — the same economics as
    the prefix filter in operators/setjoin.py). Norms are per-doc
    aggregates joined back on the doc key; the term self-join
    co-partitions both sides in one shuffle.

    Returns (doc_a, doc_b, cosine) with doc_a < doc_b, rounded.
    """
    pairs = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    tf = pairs.groupBy("doc", "term").agg(
        F.count("*").cast("double").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").cast("double").alias("n"))
    weighted = (
        tf.join(F.broadcast(dfreq.filter(F.col("df") <= max_df)), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc",
            "term",
            (F.col("tf") * F.log(F.col("n") / F.col("df"))).alias("w"),
        )
    )
    norms = weighted.groupBy("doc").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
    )
    # materialize the normalized triples ONCE: the pair self-join below
    # references this frame twice, and without truncation Catalyst
    # replays the whole tf→df→weight→norm pipeline (scans, shuffles, and
    # the 1-row N broadcast) once per side — the triangle_count lesson
    unit = (
        weighted.join(norms, "doc")
        .select("doc", "term", (F.col("w") / F.col("norm")).alias("u"))
        .localCheckpoint(eager=True)
    )
    a = unit.select(F.col("doc").alias("doc_a"), "term", F.col("u").alias("ua"))
    b = unit.select(F.col("doc").alias("doc_b"), "term", F.col("u").alias("ub"))
    scale = float(10**round_dp)
    cos = F.sum(F.col("ua") * F.col("ub"))
    return (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(cos.alias("cos_raw"))
        .filter(F.col("cos_raw") >= threshold)
        .select(
            "doc_a",
            "doc_b",
            (F.floor(F.col("cos_raw") * scale + 0.5) / scale).alias("cosine"),
        )
    )


def sql_sparse_cosine_pairs(
    threshold: float = 0.3,
    max_df: int = 50,
    round_dp: int = 4,
    where: str = "TRUE",
) -> str:
    """DuckDB twin of :func:`sparse_cosine_pairs` over ``documents``."""
    scale = float(10**round_dp)
    return f"""
WITH pairs AS (
  SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS term
  FROM documents WHERE {where}
), tf AS (
  SELECT doc, term, CAST(count(*) AS DOUBLE) AS tf
  FROM pairs GROUP BY doc, term
), dfq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term HAVING count(*) <= {max_df}
), n AS (
  SELECT CAST(count(*) AS DOUBLE) AS n
  FROM documents WHERE {where}
), weighted AS (
  SELECT doc, term, tf.tf * ln(n.n / dfq.df) AS w
  FROM tf JOIN dfq USING (term) CROSS JOIN n
), norms AS (
  SELECT doc, sqrt(SUM(w * w)) AS norm FROM weighted GROUP BY doc
), unit AS (
  SELECT w.doc, w.term, w.w / norms.norm AS u
  FROM weighted w JOIN norms USING (doc)
), sims AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, SUM(a.u * b.u) AS cos_raw
  FROM unit a JOIN unit b ON a.term = b.term AND a.doc < b.doc
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       floor(cos_raw * {scale!r} + 0.5) / {scale!r} AS cosine
FROM sims WHERE cos_raw >= {threshold}
"""


def bigram_pmi(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
    round_dp: int = 6,
) -> DataFrame:
    """Top-``k`` word-bigram collocations by pointwise mutual information.

    PMI(x,y) = ln( (c_xy / B) / ((c_x / T) · (c_y / T)) ) with T total
    unigram tokens and B total bigrams. Pairs below ``min_count`` are
    dropped (PMI is noise at low counts). Ranking uses the raw double
    PMI with (w1, w2) ascending tie-break; the returned pmi is
    floor-rounded. The expression is written with the IDENTICAL
    operation order in the DuckDB twin so the doubles match bitwise.
    """
    toks = F.split(F.col(text_col), " ")
    base = docs.select(toks.alias("l")).filter(F.size("l") >= 2)
    bigrams = base.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("l") - 1),
                lambda i: F.struct(
                    F.element_at("l", i).alias("w1"),
                    F.element_at("l", i + 1).alias("w2"),
                ),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")

    uni = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("double").alias("c"))
    )
    totals = docs.select(F.explode(toks).alias("w")).agg(
        F.count("*").cast("double").alias("T")
    )
    btot = bigrams.agg(F.count("*").cast("double").alias("B"))
    bcnt = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("pair_count"))

    raw = F.log(
        (F.col("pair_count").cast("double") / F.col("B"))
        / ((F.col("c1") / F.col("T")) * (F.col("c2") / F.col("T")))
    )
    scale = float(10**round_dp)
    u1 = F.broadcast(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")))
    u2 = F.broadcast(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")))
    return (
        bcnt.filter(F.col("pair_count") >= min_count)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(btot))
        .orderBy(raw.desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(k)
        .select(
            "w1",
            "w2",
            F.col("pair_count").cast("bigint").alias("pair_count"),
            (F.floor(raw * scale + 0.5) / scale).alias("pmi"),
        )
    )


def sql_bigram_pmi(min_count: int = 5, k: int = 20, round_dp: int = 6) -> str:
    """DuckDB twin of :func:`bigram_pmi` over ``documents``."""
    scale = float(10**round_dp)
    return f"""
WITH toks AS (
  SELECT string_split(text, ' ') AS l FROM documents
), big AS (
  -- parallel unnests zip positionally (no WITH ORDINALITY in DuckDB)
  SELECT unnest([l[i] FOR i IN generate_series(1, len(l) - 1)]) AS w1,
         unnest([l[i + 1] FOR i IN generate_series(1, len(l) - 1)]) AS w2
  FROM toks WHERE len(l) >= 2
), uni AS (
  SELECT unnest(l) AS w FROM toks
), ucnt AS (
  SELECT w, CAST(count(*) AS DOUBLE) AS c FROM uni GROUP BY w
), tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS T FROM uni
), btot AS (
  SELECT CAST(count(*) AS DOUBLE) AS B FROM big
), bcnt AS (
  SELECT w1, w2, count(*) AS pair_count FROM big GROUP BY w1, w2
), scored AS (
  SELECT w1, w2, pair_count,
         ln((CAST(pair_count AS DOUBLE) / B)
            / ((u1.c / T) * (u2.c / T))) AS raw_pmi
  FROM bcnt
  JOIN ucnt u1 ON bcnt.w1 = u1.w
  JOIN ucnt u2 ON bcnt.w2 = u2.w
  CROSS JOIN tot CROSS JOIN btot
  WHERE pair_count >= {min_count}
)
SELECT w1, w2, CAST(pair_count AS BIGINT) AS pair_count,
       floor(raw_pmi * {scale!r} + 0.5) / {scale!r} AS pmi
FROM scored
ORDER BY raw_pmi DESC, w1 ASC, w2 ASC
LIMIT {k}
"""


def doc_keyphrases(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    per_doc: int = 3,
    round_dp: int = 6,
) -> DataFrame:
    """Top-``per_doc`` keyphrases per document: the document's own
    bigrams ranked by CORPUS-level PMI (collocation strength).

    The per-doc upgrade of :func:`bigram_pmi`: corpus statistics
    (bigram counts ≥ ``min_count``, with PMI computed in the identical
    IEEE expression order as the SQL twin) form a vocabulary-bounded
    score table that is BROADCAST onto each document's distinct bigram
    list; ranking is a per-doc window over at most |doc bigrams| rows.
    The fact-side shuffle is the (doc, w1, w2) triple stream — text
    never moves twice; ties break (pmi desc, w1, w2) so top-k is
    deterministic.
    """
    from pyspark.sql import Window

    toks = F.split(F.col(text_col), " ")
    base = docs.select(F.col(id_col), toks.alias("l")).filter(
        F.size("l") >= 2
    )
    doc_bigrams = base.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("l") - 1),
                lambda i: F.struct(
                    F.element_at("l", i).alias("w1"),
                    F.element_at("l", i + 1).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select(id_col, "bg.w1", "bg.w2").distinct()

    uni = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("double").alias("c"))
    )
    totals = docs.select(F.explode(toks).alias("w")).agg(
        F.count("*").cast("double").alias("T")
    )
    all_bigrams = base.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("l") - 1),
                lambda i: F.struct(
                    F.element_at("l", i).alias("w1"),
                    F.element_at("l", i + 1).alias("w2"),
                ),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    btot = all_bigrams.agg(F.count("*").cast("double").alias("B"))
    bcnt = all_bigrams.groupBy("w1", "w2").agg(
        F.count("*").alias("pair_count")
    )
    raw = F.log(
        (F.col("pair_count").cast("double") / F.col("B"))
        / ((F.col("c1") / F.col("T")) * (F.col("c2") / F.col("T")))
    )
    u1 = F.broadcast(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")))
    u2 = F.broadcast(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")))
    scored = (
        bcnt.filter(F.col("pair_count") >= min_count)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(btot))
        .select("w1", "w2", raw.alias("raw_pmi"))
    )
    # vocabulary-bounded score table (pairs ≥ min_count) broadcast onto
    # the doc-bigram stream; lineage checkpointed so the census's plan
    # holds one copy of the corpus-stats subtree, not two
    scored = scored.localCheckpoint(eager=False)
    w = Window.partitionBy(id_col).orderBy(
        F.col("raw_pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
    )
    scale = float(10**round_dp)
    return (
        doc_bigrams.join(F.broadcast(scored), ["w1", "w2"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= per_doc)
        .select(
            id_col,
            F.col("rank").cast("long").alias("rank"),
            "w1",
            "w2",
            (F.floor(F.col("raw_pmi") * scale + 0.5) / scale).alias("pmi"),
        )
    )


def sql_doc_keyphrases(
    min_count: int = 5, per_doc: int = 3, round_dp: int = 6
) -> str:
    """DuckDB twin of :func:`doc_keyphrases` over ``documents``."""
    scale = float(10**round_dp)
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
), docbig AS (
  -- DISTINCT in an outer scope: unnest expands rows first, dedup after
  SELECT DISTINCT * FROM (
    SELECT doc_id,
           unnest([l[i] FOR i IN generate_series(1, len(l) - 1)]) AS w1,
           unnest([l[i + 1] FOR i IN generate_series(1, len(l) - 1)]) AS w2
    FROM toks WHERE len(l) >= 2
  )
), big AS (
  SELECT unnest([l[i] FOR i IN generate_series(1, len(l) - 1)]) AS w1,
         unnest([l[i + 1] FOR i IN generate_series(1, len(l) - 1)]) AS w2
  FROM toks WHERE len(l) >= 2
), uni AS (
  SELECT unnest(l) AS w FROM toks
), ucnt AS (
  SELECT w, CAST(count(*) AS DOUBLE) AS c FROM uni GROUP BY w
), tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS T FROM uni
), btot AS (
  SELECT CAST(count(*) AS DOUBLE) AS B FROM big
), bcnt AS (
  SELECT w1, w2, count(*) AS pair_count FROM big GROUP BY w1, w2
), scored AS (
  SELECT w1, w2,
         ln((CAST(pair_count AS DOUBLE) / B)
            / ((u1.c / T) * (u2.c / T))) AS raw_pmi
  FROM bcnt
  JOIN ucnt u1 ON bcnt.w1 = u1.w
  JOIN ucnt u2 ON bcnt.w2 = u2.w
  CROSS JOIN tot CROSS JOIN btot
  WHERE pair_count >= {min_count}
), ranked AS (
  SELECT d.doc_id, d.w1, d.w2, s.raw_pmi,
         ROW_NUMBER() OVER (
           PARTITION BY d.doc_id
           ORDER BY s.raw_pmi DESC, d.w1 ASC, d.w2 ASC) AS rank
  FROM docbig d JOIN scored s ON d.w1 = s.w1 AND d.w2 = s.w2
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, w1, w2,
       floor(raw_pmi * {scale!r} + 0.5) / {scale!r} AS pmi
FROM ranked WHERE rank <= {per_doc}
"""
