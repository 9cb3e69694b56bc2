"""Corpus-level text statistics: two-pass operators whose per-document
score depends on the WHOLE corpus (global token frequencies, cross-
document repeated lines). Single-pass scalar scoring lives in
functions/text.py; these are the ops that need a corpus aggregate fed
back into a per-row pass — the shape that matters at 100 TB is keeping
that feedback edge a BROADCAST of a bounded summary, never a re-shuffle
of the corpus.

Generalizes the reference's per-bill keyword statistics (term loops at
CSA_Resolutions_Analysis.R via search_all_bills) to corpus-informed
scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unigram_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
) -> DataFrame:
    """Mean corpus frequency of each document's tokens — a cheap unigram
    language-model proxy: documents dominated by corpus-rare tokens
    (boilerplate IDs, foreign text, OCR noise) score low; fluent in-
    domain text scores high.

    Two passes over the tokenized corpus:
    1. global token counts → keep the TOP ``vocab_size`` by count
       (ties broken by token so the vocab is deterministic). Bounding
       the vocab is what makes pass 2 a broadcast join at any corpus
      size — the full vocabulary of a 100 TB corpus is itself huge, the
       top-K is constant-sized. Out-of-vocab tokens count as frequency
       0 (they are, definitionally, rare).
    2. tokens ⟕ broadcast(vocab) → per-doc mean frequency.

    The score stays integer-exact until one final division (IEEE-exact
    in every engine), so results hash-match the SQL oracle bit-for-bit.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("token"),
    ).filter(F.col("token") != "")

    vocab = (
        toks.groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(vocab_size)
    )

    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.coalesce(F.col("freq"), F.lit(0))).alias("sum_freq"),
        )
        .withColumn(
            "mean_freq",
            F.col("sum_freq").cast("double") / F.col("n_tokens").cast("double"),
        )
    )


def sql_unigram_score(vocab_size: int = 1000) -> str:
    """DuckDB twin of :func:`unigram_score` over the ``documents`` view."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
  FROM documents
), toks_nonempty AS (
  SELECT * FROM toks WHERE token <> ''
), vocab AS (
  SELECT token, count(*) AS freq FROM toks_nonempty
  GROUP BY token ORDER BY freq DESC, token ASC LIMIT {vocab_size}
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(COALESCE(v.freq, 0)) AS BIGINT) AS sum_freq,
       CAST(sum(COALESCE(v.freq, 0)) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS mean_freq
FROM toks_nonempty t LEFT JOIN vocab v USING (token)
GROUP BY t.doc_id
"""


def ngram_novelty(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document originality: the fraction of a document's distinct
    ``shingle_n``-gram shingles that appear in NO other document. The
    inverse signal of :func:`strip_boilerplate` — that one removes what
    is shared, this one scores what is unique, the diversity metric used
    to prioritize novel content when a training mixture over-samples.

    Scale shape: the cross-document edge is a single shingle-digest
    aggregate producing BOTH facts needed per gram — its document
    frequency and (for df=1 grams) its sole owner via ``min(doc)``.
    Unique grams are then credited to their owner with one doc-keyed
    aggregate, and the final assembly joins two doc-cardinality tables.
    Nothing corpus-sized is broadcast or joined back to the gram level —
    unlike boilerplate's small broadcast set, the unique-gram set is
    MOST of the corpus, so a gram-level join-back would re-shuffle
    everything; routing through ``min(doc)`` avoids it entirely.

    Returns (id_col, n_grams, n_unique, novelty) with
    ``novelty = n_unique / n_grams`` (one IEEE division, hash-exact).
    """
    from ..functions import text as T

    grams = docs.select(
        F.col(id_col),
        F.explode(T.shingles(T.tokens(F.col(text_col)), shingle_n)).alias(
            "gram"
        ),
    ).withColumn("gram_sha", F.sha2(F.col("gram"), 256))

    per_doc = grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))

    unique_per_owner = (
        grams.groupBy("gram_sha")
        .agg(
            F.count_distinct(id_col).alias("df"),
            F.min(id_col).alias("owner"),
        )
        .filter(F.col("df") == 1)
        .groupBy(F.col("owner").alias(id_col))
        .agg(F.count("*").alias("n_unique"))
    )

    return (
        per_doc.join(unique_per_owner, id_col, "left")
        .na.fill(0, ["n_unique"])
        .select(
            F.col(id_col),
            F.col("n_grams"),
            F.col("n_unique"),
            (
                F.col("n_unique").cast("double")
                / F.col("n_grams").cast("double")
            ).alias("novelty"),
        )
    )


def sql_ngram_novelty(shingle_n: int = 3) -> str:
    """DuckDB twin of :func:`ngram_novelty` over ``documents``."""
    from ..functions.text import sql_shingles

    grams_expr = sql_shingles("string_split(text, ' ')", shingle_n)
    return f"""
WITH grams AS (
  SELECT doc_id, unnest({grams_expr}) AS gram FROM documents
), per_doc AS (
  SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id
)
SELECT p.doc_id,
       CAST(p.n_grams AS BIGINT) AS n_grams,
       CAST(COALESCE(u.n_unique, 0) AS BIGINT) AS n_unique,
       CAST(COALESCE(u.n_unique, 0) AS DOUBLE) / CAST(p.n_grams AS DOUBLE)
         AS novelty
FROM per_doc p LEFT JOIN (
  SELECT doc_id, count(*) AS n_unique
  FROM (SELECT gram, count(DISTINCT doc_id) AS df, min(doc_id) AS doc_id
        FROM grams GROUP BY gram) g
  WHERE df = 1 GROUP BY doc_id
) u USING (doc_id)
"""


def strip_boilerplate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 8,
    min_doc_freq: int = 2,
) -> DataFrame:
    """Remove text segments that repeat across ≥ ``min_doc_freq``
    documents — headers, footers, nav chrome, license blocks. The
    standard corpus-cleaning pass a per-document filter can't express:
    a segment is boilerplate only relative to the whole corpus.

    Segmentation here is non-overlapping ``chunk_tokens``-token windows
    (deterministic, alignment-stable for copied text); web corpora with
    real line structure swap in ``split('\\n')`` — every downstream step
    is segmentation-agnostic.

    Scale shape: the document-frequency aggregate shuffles
    ``sha2(chunk)`` digests (fixed-width keys), never chunk text; the
    boilerplate set surviving ``min_doc_freq`` is small by construction
    (each member appears in ≥ N docs → at most corpus_chunks / N of
    them) and flows back as a BROADCAST left join. Reassembly is the one
    unavoidable text shuffle: one groupBy(doc) with order restored by
    ``array_sort`` on (pos, chunk) structs — no window, no second pass.

    Returns (id_col, n_chunks_kept, n_chunks_dropped, clean_sha) — the
    cleaned text travels as a sha256 digest so downstream checks are
    O(1)-width; swap the digest for the ``array_join`` itself to
    materialize the text.
    """
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.greatest(
        F.ceil(F.size(toks) / F.lit(float(chunk_tokens))).cast("int"), F.lit(1)
    )
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(toks, i * chunk_tokens + 1, chunk_tokens), " "
        ),
    )
    chunks = docs.select(
        F.col(id_col), F.posexplode(chunk_arr).alias("pos", "chunk")
    ).withColumn("chunk_sha", F.sha2(F.col("chunk"), 256))

    boiler = (
        chunks.groupBy("chunk_sha")
        .agg(F.count_distinct(id_col).alias("df"))
        .filter(F.col("df") >= min_doc_freq)
        .select("chunk_sha")
    )

    flagged = chunks.join(
        F.broadcast(boiler).withColumn("__boiler", F.lit(True)),
        "chunk_sha",
        "left",
    ).withColumn("__keep", F.col("__boiler").isNull())

    kept_sorted = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(F.col("__keep"), F.struct(F.col("pos"), F.col("chunk")))
            )
        ),
        lambda s: s["chunk"],
    )
    return flagged.groupBy(id_col).agg(
        F.sum(F.col("__keep").cast("bigint")).alias("n_chunks_kept"),
        F.sum((~F.col("__keep")).cast("bigint")).alias("n_chunks_dropped"),
        F.sha2(F.array_join(kept_sorted, " "), 256).alias("clean_sha"),
    )


def sql_strip_boilerplate(chunk_tokens: int = 8, min_doc_freq: int = 2) -> str:
    """DuckDB twin of :func:`strip_boilerplate` over ``documents``."""
    k = chunk_tokens
    n_chunks = f"greatest(CAST(ceil(len(l) / {k}.0) AS BIGINT) - 1, 0)"
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
), chunks AS (
  -- DuckDB has no WITH ORDINALITY; parallel unnests zip positionally
  SELECT doc_id,
         unnest(generate_series(0, {n_chunks})) AS pos,
         unnest([array_to_string(l[i * {k} + 1 : i * {k} + {k}], ' ')
                 FOR i IN generate_series(0, {n_chunks})]) AS chunk
  FROM toks
), boiler AS (
  SELECT chunk FROM chunks
  GROUP BY chunk HAVING count(DISTINCT doc_id) >= {min_doc_freq}
)
SELECT c.doc_id,
       CAST(sum(CASE WHEN b.chunk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_chunks_kept,
       CAST(sum(CASE WHEN b.chunk IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS n_chunks_dropped,
       sha256(COALESCE(string_agg(CASE WHEN b.chunk IS NULL THEN c.chunk END,
                                  ' ' ORDER BY c.pos), ''))
         AS clean_sha
FROM chunks c LEFT JOIN boiler b USING (chunk)
GROUP BY c.doc_id
"""


def substr_dup_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Exact-substring duplicate spans — the ExactSubstr dedup mode of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"): find every maximal token span that occurs verbatim more
    than once ANYWHERE in the corpus (cross-document quotes, shared
    boilerplate, within-document repetition), at span grain rather than
    the document grain of sha2/MinHash dedup. The reference's own
    full-text term search (legiscan_main.R:213) is the fixed-needle
    special case; this is the all-needles generalization.

    Suffix arrays don't distribute; the equivalent shuffle-native plan:

    1. scan-side sliding ``k``-token shingles per document (the
       packing.sliding_chunks posexplode idiom, stride 1) — each
       position ``p`` emits ``sha2(tokens[p:p+k])``; no text leaves the
       scan, only fixed-width digests;
    2. one digest aggregate keeps shingles with total occurrence ≥ 2
       (also carrying how many distinct documents own them);
    3. duplicated positions per document collapse gaps-and-islands
       style (the q_streaks idiom: ``pos − row_number``) into MAXIMAL
       spans — overlapping duplicated k-grams merge, so a repeated
       50-token block reports once as one span of 50 tokens, not 43
       shingle hits.

    Scale shape: two token-count-scale shuffles of fixed-width rows
    (digest aggregate, digest join-back) + one per-document window —
    the canonical distributed-ExactSubstr cost; nothing is quadratic,
    nothing broadcasts the corpus, and a 100 TB run partitions on
    digest then doc_id with bounded row width throughout.

    Returns (id_col, span_start, span_end, span_tokens, n_shingles,
    min_owners): token-index span [start, end] inclusive, its length,
    how many duplicated shingles built it, and the minimum number of
    distinct owner documents across those shingles (1 ⟹ the span
    repeats only within this document).
    """
    from pyspark.sql import Window

    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    dg_arr = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.sha2(F.array_join(F.slice(toks, i + 1, k), " "), 256),
    )
    sh = (
        docs.filter(n >= k)
        .select(F.col(id_col), F.posexplode(dg_arr).alias("pos", "dg"))
        .select(id_col, F.col("pos").cast("long").alias("pos"), "dg")
        # r14 optimization (guide §2.3/§5): the shingle frame feeds BOTH
        # the digest aggregate and the join-back, and the two exchanges
        # are not reuse-identical (one has a partial agg below it), so
        # without this the sha2-per-position scan — the operator's
        # dominant compute — ran twice per invocation. Eager checkpoint
        # (the r14 multi-consumer rule: a lazy one is recomputed
        # concurrently by AQE's parallel stage materialization):
        # computed once, cached (MEMORY_AND_DISK) at digest grain.
        .localCheckpoint(eager=True)
    )
    dgc = (
        sh.groupBy("dg")
        .agg(
            F.count(F.lit(1)).alias("occ"),
            F.count_distinct(id_col).alias("ndocs"),
        )
        .filter(F.col("occ") > 1)
        .select("dg", "ndocs")
    )
    # digest-keyed shuffle join, NOT a broadcast: the duplicated-shingle
    # set is corpus-scale whenever duplication is (boilerplate-heavy
    # web crawls), so it must never be assumed driver-small.
    dup = sh.join(dgc, "dg")
    w = Window.partitionBy(id_col).orderBy("pos")
    isl = dup.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (
        isl.groupBy(id_col, "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).cast("long").alias("span_end"),
            (F.max("pos") - F.min("pos") + F.lit(k))
            .cast("long")
            .alias("span_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.min("ndocs").cast("long").alias("min_owners"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            "span_tokens",
            "n_shingles",
            "min_owners",
        )
    )


def sql_substr_dup_spans(k: int = 8) -> str:
    """DuckDB twin of :func:`substr_dup_spans` over ``documents``."""
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
), sh AS (
  SELECT doc_id,
         CAST(unnest(generate_series(0, len(l) - {k})) AS BIGINT) AS pos,
         unnest([sha256(array_to_string(l[i + 1 : i + {k}], ' '))
                 FOR i IN generate_series(0, len(l) - {k})]) AS dg
  FROM toks WHERE len(l) >= {k}
), dgc AS (
  SELECT dg, CAST(count(DISTINCT doc_id) AS BIGINT) AS ndocs
  FROM sh GROUP BY dg HAVING count(*) > 1
), dup AS (
  SELECT s.doc_id, s.pos, d.ndocs FROM sh s JOIN dgc d USING (dg)
), isl AS (
  SELECT doc_id, pos, ndocs,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM dup
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + {k} - 1 AS BIGINT) AS span_end,
       CAST(MAX(pos) - MIN(pos) + {k} AS BIGINT) AS span_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(MIN(ndocs) AS BIGINT) AS min_owners
FROM isl GROUP BY doc_id, grp
"""


def dedup_paragraphs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 8,
) -> DataFrame:
    """Within-document paragraph-grain exact dedup: drop every repeat
    of a paragraph the SAME document already contains, keeping the
    first occurrence in reading order — the removal complement to the
    q_repetition *signal* (VERDICT r10 #6). Segmentation matches
    :func:`strip_boilerplate`: non-overlapping ``chunk_tokens``-token
    windows (the fixture corpus has no newline structure; real web
    corpora swap in ``split('\\n\\n')`` — every downstream step is
    segmentation-agnostic).

    Scale shape: ZERO shuffle and zero explode — because the duplicate
    test is within-row, the whole operator is one scan-side expression:
    keep chunk ``i`` iff ``array_position(chunks, chunk[i]) == i+1``
    (its first occurrence is itself). Embarrassingly parallel at any
    corpus size; the O(P²) per-document comparisons are bounded by
    paragraphs-per-document, not corpus size (swap in the
    window-function form for million-paragraph documents).

    Returns (id_col, n_paras_kept, n_paras_dropped, clean_sha) — the
    strip_boilerplate output contract: cleaned text travels as a sha256
    digest; swap the digest for the ``array_join`` to materialize.
    """
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.greatest(
        F.ceil(F.size(toks) / F.lit(float(chunk_tokens))).cast("int"),
        F.lit(1),
    )
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(toks, i * chunk_tokens + 1, chunk_tokens), " "
        ),
    )
    kept = F.filter(
        chunk_arr, lambda x, i: F.array_position(chunk_arr, x) == i + 1
    )
    return docs.select(
        F.col(id_col),
        F.size(kept).cast("long").alias("n_paras_kept"),
        (F.size(chunk_arr) - F.size(kept))
        .cast("long")
        .alias("n_paras_dropped"),
        F.sha2(F.array_join(kept, " "), 256).alias("clean_sha"),
    )


def sql_dedup_paragraphs(chunk_tokens: int = 8) -> str:
    """DuckDB twin of :func:`dedup_paragraphs` over ``documents``
    (relational form: keep pos == min(pos) per (doc, chunk))."""
    k = chunk_tokens
    n_chunks = f"greatest(CAST(ceil(len(l) / {k}.0) AS BIGINT) - 1, 0)"
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
), chunks AS (
  SELECT doc_id,
         unnest(generate_series(0, {n_chunks})) AS pos,
         unnest([array_to_string(l[i * {k} + 1 : i * {k} + {k}], ' ')
                 FOR i IN generate_series(0, {n_chunks})]) AS chunk
  FROM toks
), firsts AS (
  SELECT doc_id, chunk, MIN(pos) AS fpos FROM chunks GROUP BY 1, 2
)
SELECT c.doc_id,
       CAST(sum(CASE WHEN c.pos = f.fpos THEN 1 ELSE 0 END) AS BIGINT)
         AS n_paras_kept,
       CAST(sum(CASE WHEN c.pos = f.fpos THEN 0 ELSE 1 END) AS BIGINT)
         AS n_paras_dropped,
       sha256(COALESCE(string_agg(CASE WHEN c.pos = f.fpos THEN c.chunk END,
                                  ' ' ORDER BY c.pos), ''))
         AS clean_sha
FROM chunks c
JOIN firsts f ON c.doc_id = f.doc_id AND c.chunk = f.chunk
GROUP BY c.doc_id
"""


def substr_dedup_strip(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Exact-substring dedup REMOVAL — the cut side of Lee et al. 2022's
    ExactSubstr (:func:`substr_dup_spans` is the detection side): every
    duplicated ``k``-token window is removed from every document EXCEPT
    its canonical occurrence (globally first by (doc_id, pos)), and the
    survivors reassemble in reading order. Window-grain cutting, the
    standard ExactSubstr behavior: a canonical window absorbed inside a
    larger duplicated region of another occurrence still loses the
    overlapping tokens — one retained copy is guaranteed at digest
    grain, not at maximal-span grain (documented, deterministic).

    Scale shape: the shingle/digest stages are :func:`substr_dup_spans`
    verbatim; removal adds one ×k position explode over NON-CANONICAL
    duplicated shingles only (duplication-volume-sized, not corpus-
    sized), a distinct, and one anti-join at token grain before the
    per-document reassembly groupBy. Nothing quadratic; text travels
    once (the reassembly shuffle, same as strip_boilerplate).

    Returns (id_col, n_tokens_kept, n_tokens_removed, clean_sha).
    """
    from pyspark.sql import Window

    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    dg_arr = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.sha2(F.array_join(F.slice(toks, i + 1, k), " "), 256),
    )
    base = docs.select(F.col(id_col), toks.alias("__toks"))
    tokens = base.select(
        id_col, F.posexplode("__toks").alias("tpos", "tok")
    )
    sh = (
        docs.filter(n >= k)
        .select(F.col(id_col), F.posexplode(dg_arr).alias("pos", "dg"))
        .select(id_col, F.col("pos").cast("long").alias("pos"), "dg")
        # r14 optimization: same double-computation as substr_dup_spans
        # (self-join on the digest aggregate) — sha2 shingling now runs
        # once, cached at digest grain.
        .localCheckpoint(eager=True)
    )
    dup = sh.join(
        sh.groupBy("dg")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") > 1)
        .select("dg"),
        "dg",
    )
    wcanon = Window.partitionBy("dg").orderBy(id_col, "pos")
    noncanon = (
        dup.withColumn("rk", F.row_number().over(wcanon))
        .filter(F.col("rk") > 1)
        .select(id_col, "pos")
    )
    removed = (
        noncanon.select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (k - 1))
            ).alias("__tp"),
        )
        .select(id_col, F.col("__tp").cast("int").alias("tpos"))
        .distinct()
    )
    kept = tokens.join(removed, [id_col, "tpos"], "left_anti")
    kept_sorted = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col("tpos"), F.col("tok")))
        ),
        lambda s: s["tok"],
    )
    counts = tokens.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("__n_all")
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens_kept"),
            F.sha2(F.array_join(kept_sorted, " "), 256).alias("clean_sha"),
        )
        .join(counts, id_col)
        .select(
            id_col,
            "n_tokens_kept",
            (F.col("__n_all") - F.col("n_tokens_kept"))
            .cast("long")
            .alias("n_tokens_removed"),
            "clean_sha",
        )
    )


def sql_substr_dedup_strip(k: int = 8) -> str:
    """DuckDB twin of :func:`substr_dedup_strip` over ``documents``.
    Documents whose every token is removed fall out of the kept join —
    mirrored by the Spark side the same way (group over KEPT tokens)."""
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
), tokens AS (
  SELECT doc_id,
         CAST(unnest(generate_series(0, len(l) - 1)) AS INTEGER) AS tpos,
         unnest(l) AS tok
  FROM toks
), sh AS (
  SELECT doc_id,
         CAST(unnest(generate_series(0, len(l) - {k})) AS BIGINT) AS pos,
         unnest([sha256(array_to_string(l[i + 1 : i + {k}], ' '))
                 FOR i IN generate_series(0, len(l) - {k})]) AS dg
  FROM toks WHERE len(l) >= {k}
), dupdg AS (
  SELECT dg FROM sh GROUP BY dg HAVING count(*) > 1
), noncanon AS (
  SELECT doc_id, pos FROM (
    SELECT s.doc_id, s.pos,
           ROW_NUMBER() OVER (PARTITION BY s.dg
                              ORDER BY s.doc_id, s.pos) AS rk
    FROM sh s JOIN dupdg USING (dg))
  WHERE rk > 1
), removed AS (
  SELECT DISTINCT doc_id,
         CAST(unnest(generate_series(pos, pos + {k} - 1)) AS INTEGER)
           AS tpos
  FROM noncanon
), kept AS (
  SELECT t.doc_id, t.tpos, t.tok
  FROM tokens t LEFT JOIN removed r
    ON r.doc_id = t.doc_id AND r.tpos = t.tpos
  WHERE r.doc_id IS NULL
), counts AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_all FROM tokens GROUP BY 1
)
SELECT k.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens_kept,
       CAST(c.n_all - COUNT(*) AS BIGINT) AS n_tokens_removed,
       sha256(string_agg(k.tok, ' ' ORDER BY k.tpos)) AS clean_sha
FROM kept k JOIN counts c ON c.doc_id = k.doc_id
GROUP BY k.doc_id, c.n_all
"""
