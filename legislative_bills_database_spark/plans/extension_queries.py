"""North-star extension queries (SURVEY.md §2.10 + training-data pipeline ops).

Not in the reference; required by BASELINE.json's north star: dedup
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
similarity search (brute-force + LSH-bucketed), text analysis (lang-ID,
quality, token counts, fingerprints), multimodal plumbing, approximate
aggregates, sessionization. Fixtures: documents, embeddings, events.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import compat as C
from ..functions import text as T
from ..operators import corpus as Co
from ..functions.vectors import sql_cosine
from ..io import load_table, load_tables
from ..operators.dedup import (
    dedup_by_near_duplicates,  # noqa: F401  (re-export for pipelines)
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from ..operators import sampling as Sa
from ..operators.packing import first_fit_pack, pack_chunks, pack_stats
from ..operators.ranking import bm25_topk, sql_bm25_topk
from ..operators.sessionize import sessionize
from ..operators.similarity import cosine_topk, lsh_bucketed_pairs
from ..sources.multimodal import fake_image_features
from .registry import query


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

@query(
    "q_exact_dedup",
    "SELECT doc_id, lang, source, n_chars FROM documents"
    " QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1",
)
def q_exact_dedup(spark, sf_dir):
    """Exact text dedup: hash-partition on sha2(text), keep lowest doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id").select(
        "doc_id", "lang", "source", "n_chars"
    )


@query("q_near_dedup")  # xxhash64 signatures are Spark-specific → rows-only
def q_near_dedup(spark, sf_dir):
    """MinHash+LSH near-duplicate candidate pairs (scale path: banded
    signature buckets, no all-pairs join)."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4, min_est_jaccard=0.3
    )


@query("q_near_dedup_corpus")  # LSH pairs + iterative CC → rows-only
def q_near_dedup_corpus(spark, sf_dir):
    """End-to-end near-dup removal: MinHash-LSH pairs → connected
    components (iterative min-label propagation) → keep the lowest-id
    representative per cluster — the full pairs-to-clean-corpus step of
    a training-data pipeline (operators/dedup.py)."""
    from ..operators.dedup import dedup_by_near_duplicates

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4, min_est_jaccard=0.5
    )
    return dedup_by_near_duplicates(docs, pairs).select(
        "doc_id", "lang", "source", "n_chars"
    )


@query("q_simhash")  # xxhash64 is Spark-specific → rows-only
def q_simhash(spark, sf_dir):
    """64-bit SimHash per document (near-dup fingerprint family)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash(docs, "doc_id", "text")


@query("q_simhash_pairs")  # xxhash64-based → rows-only
def q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs: banded hamming-distance candidates with the
    pigeonhole guarantee (hamming<bands ⇒ one band agrees exactly), one
    bit_count(xor) verification per candidate (operators/dedup.py)."""
    from ..operators.dedup import simhash_pairs

    docs = load_table(spark, sf_dir, "documents")
    return simhash_pairs(docs, "doc_id", "text", max_hamming=3, bands=4)


_JACCARD_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {T.sql_shingles("string_split(text, ' ')", 3)} AS sh
  FROM documents WHERE doc_id < 100
), e AS (
  SELECT doc_id, unnest(sh) AS s FROM docs
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS cnt
  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), sizes AS (
  SELECT doc_id, len(sh) AS n FROM docs
)
SELECT doc_a, doc_b,
       ROUND(CAST(cnt AS DOUBLE) / (sa.n + sb.n - cnt), 4) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(cnt AS DOUBLE) / (sa.n + sb.n - cnt) >= 0.02
"""


@query("q_ngram_jaccard", _JACCARD_ORACLE)
def q_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard pairs via inverted-index join (bounded to
    doc_id<100 so the oracle's pair space stays small; the Spark plan is
    the same shape at any scale)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return ngram_jaccard_pairs(docs, "doc_id", "text", shingle_n=3, min_jaccard=0.02)


_COS = sql_cosine("a.embedding", "b.embedding")


@query(
    "q_embedding_neardup",
    f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, ROUND({_COS}, 3) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.vec_id < 500 AND b.vec_id < 500 AND {_COS} >= 0.4
    """,
)
def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (exact all-pairs baseline,
    bounded to 500 vectors; scale path = q_ann_lsh_pairs)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    return embedding_neardup_pairs(emb, "vec_id", "embedding", min_cosine=0.4)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_TOPK_COS = sql_cosine("q.embedding", "n.embedding")


@query(
    "q_cosine_topk",
    f"""
    SELECT q.vec_id AS qid, n.vec_id AS nid, ROUND({_TOPK_COS}, 3) AS cosine,
           CAST(row_number() OVER (PARTITION BY q.vec_id
                ORDER BY {_TOPK_COS} DESC, n.vec_id ASC) AS INTEGER) AS rank
    FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
    WHERE q.vec_id < 10
    QUALIFY rank <= 5
    """,
)
def q_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-5 neighbors for 10 query vectors —
    the exact ANN baseline (broadcast queries, window top-k)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return cosine_topk(emb, queries, "vec_id", "embedding", k=5)


@query("q_ann_ivf_topk")  # k-means buckets, recall<1 → rows-only
def q_ann_ivf_topk(spark, sf_dir):
    """IVF approximate top-5 neighbors for 10 query vectors: sample-fit
    k-means centroids (broadcast), nprobe=2 posting-list search, exact
    cosine inside probed lists only (operators/ivf.py — the second ANN
    scale path beside hyperplane LSH). Centroids are memoized per
    (sf_dir, params) — the index is fit once, not per query invocation."""
    from ..operators.ivf import ivf_centroids_cached, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = ivf_centroids_cached(emb, "embedding", (sf_dir, "full"), k=16)
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(emb, queries, "vec_id", "embedding", centroids, nprobe=2, k=5)


@query("q_pq_topk")  # quantized scores are codebook-specific → rows-only
def q_pq_topk(spark, sf_dir):
    """Product-quantization ANN (operators/quantize.py): embeddings
    compressed to 16 one-byte subspace codes (16× smaller than float32),
    searched with asymmetric distance — per query one (m×k) LUT, per
    vector m lookups, no raw floats read at scan time. Codebooks are
    sample-fit driver-side and memoized per sf_dir; deterministic given
    the seed. Recall vs exact cosine is asserted in
    tests/test_quantize.py and surfaced in q_pq_recall."""
    from ..operators.quantize import pq_adc_topk, pq_codebooks_cached, pq_encode

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_codebooks_cached(emb, "embedding", (sf_dir, "full"), m=16, k=128)
    codes = pq_encode(emb, "vec_id", "embedding", books)
    queries_df = emb.filter(F.col("vec_id") < 10)
    return pq_adc_topk(codes, queries_df, "vec_id", "embedding", books, k=5)


@query("q_pq_recall")  # seeded PQ vs exact — recall engine-specific → rows-only
def q_pq_recall(spark, sf_dir):
    """PQ quality, driver-visible (same contract as q_ann_recall): one
    row (method, n_exact, n_recovered, recall) comparing ADC top-5 over
    8-byte codes against exact cosine top-5 for 10 queries."""
    from ..operators.quantize import pq_adc_topk, pq_codebooks_cached, pq_encode

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    books = pq_codebooks_cached(emb, "embedding", (sf_dir, "lt500"), m=16, k=128)
    codes = pq_encode(emb, "vec_id", "embedding", books)
    queries_df = emb.filter(F.col("vec_id") < 10)
    exact_topk = cosine_topk(emb, queries_df, "vec_id", "embedding", k=5)
    approx_topk = pq_adc_topk(
        codes, queries_df, "vec_id", "embedding", books, k=5
    )
    return _hit_stats(exact_topk, approx_topk, ("qid", "nid"), "pq_adc_topk")


@query("q_semdedup")  # k-means clusters are engine-specific → rows-only
def q_semdedup(spark, sf_dir):
    """Semantic deduplication (operators/semdedup.py — the SemDeDup
    recipe): k-means-cluster the embeddings (bounded driver-side fit,
    shared with IVF), then inside each cluster drop every vector with an
    earlier same-cluster vector at cosine ≥ 0.35 (the fixture's planted
    semantic dups live at cos 0.3–0.5). Returns the dropped rows
    (vec_id, cluster, witness) — deterministic for the fixed seed;
    keep-set = anti-join, verified against per-cluster brute force in
    tests/test_semdedup.py."""
    from ..operators.ivf import ivf_centroids_cached
    from ..operators.semdedup import semdedup_drops

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = ivf_centroids_cached(emb, "embedding", (sf_dir, "full"), k=16)
    return semdedup_drops(
        emb, "vec_id", "embedding", centroids, threshold=0.35, cluster_cap=20_000
    )


def _hit_stats(exact, approx, keys, method):
    """One-row (method, n_exact, n_recovered, recall) from two pair sets —
    a single left-join + aggregate, no driver-side counting."""
    marked = approx.select(*keys).withColumn("__hit", F.lit(1))
    return (
        exact.select(*keys)
        .join(marked, list(keys), "left")
        .agg(
            F.lit(method).alias("method"),
            F.count("*").alias("n_exact"),
            F.coalesce(F.sum("__hit"), F.lit(0)).alias("n_recovered"),
            F.round(
                F.coalesce(F.sum("__hit"), F.lit(0))
                / F.greatest(F.count("*"), F.lit(1)),
                3,
            ).alias("recall"),
        )
    )


@query("q_ann_recall")  # seeded LSH/IVF vs exact — recall engine-specific → rows-only
def q_ann_recall(spark, sf_dir):
    """ANN quality, driver-visible: recall of BOTH approximate paths
    (hyperplane LSH pairs, IVF top-k) against their exact baselines on the
    bounded embeddings slice. Fully deterministic (fixed hyperplane /
    k-means seeds); one row per method — a regression in ANN quality shows
    up as a changed value here instead of only in pytest
    (operators/similarity.py:lsh_recall, operators/ivf.py:ivf_recall are
    the float twins asserted ≥0.9 in tests)."""
    from ..operators.ivf import ivf_centroids_cached, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    # the fixture's planted near-dup pairs live at cos ≈ 0.4; hyperplane
    # collision probability per table is (1 − θ/π)^n_planes, so this
    # regime needs the few-planes/many-tables operating point (4×16 →
    # per-pair hit ≈ 1−(1−0.65⁴)^16 ≈ 0.95 at cos 0.45). At corpus scale
    # raise n_planes AND n_tables together to keep buckets small.
    exact_pairs = embedding_neardup_pairs(emb, "vec_id", "embedding", min_cosine=0.4)
    lsh_pairs = lsh_bucketed_pairs(
        emb, "vec_id", "embedding", dim=64, n_planes=4, n_tables=16,
        min_cosine=0.4, bucket_cap=1000,
    )
    lsh_row = _hit_stats(exact_pairs, lsh_pairs, ("id_a", "id_b"), "lsh_pairs")

    queries_df = emb.filter(F.col("vec_id") < 10)
    exact_topk = cosine_topk(emb, queries_df, "vec_id", "embedding", k=5)
    centroids = ivf_centroids_cached(emb, "embedding", (sf_dir, "lt500"), k=8)
    approx_topk = ivf_topk(
        emb, queries_df, "vec_id", "embedding", centroids, nprobe=4, k=5
    )
    ivf_row = _hit_stats(exact_topk, approx_topk, ("qid", "nid"), "ivf_topk")
    return lsh_row.unionByName(ivf_row)


@query("q_neardup_precision")  # xxhash64 MinHash est. → rows-only (self-validating)
def q_neardup_precision(spark, sf_dir):
    """Cross-validates the rows-only MinHash family against the EXACT
    oracle-backed n-gram Jaccard operator: precision of MinHash-LSH
    candidate pairs (est_jaccard ≥ 0.3) against exact 3-gram Jaccard
    ≥ 0.2 on the doc_id<100 slice. One row (n_candidates, n_true,
    precision) — deterministic, so a MinHash regression flips this value
    in CORRECTNESS instead of hiding behind a rows-only count."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    est = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4, min_est_jaccard=0.3
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    exact = ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_n=3, min_jaccard=0.2
    ).select("doc_a", "doc_b")
    truth = exact.withColumn("__true", F.lit(1))
    return est.join(truth, ["doc_a", "doc_b"], "left").agg(
        F.count("*").alias("n_candidates"),
        F.coalesce(F.sum("__true"), F.lit(0)).alias("n_true"),
        F.round(
            F.coalesce(F.sum("__true"), F.lit(0))
            / F.greatest(F.count("*"), F.lit(1)),
            3,
        ).alias("precision"),
    )


@query("q_ann_lsh_pairs")  # recall<1 by construction → rows-only
def q_ann_lsh_pairs(spark, sf_dir):
    """Scale-path ANN: banded multi-table hyperplane LSH (8 tables),
    bucket-size cap bounding intra-bucket quadratic work, exact cosine
    verification of candidates only (see operators/similarity.py for
    the 100 TB story; recall measured in tests/test_operators.py).

    n_planes is sized from the corpus per the operator's own rule —
    n_planes ≈ log2(n_rows / target_bucket_size) — instead of a fixed
    8: the r6 sf1.0 scaling run measured the fixed-8 config at 53× cost
    for 10× data (bucket space constant ⇒ bucket size ∝ n ⇒ candidate
    pairs ∝ n²); adaptive planes keep expected bucket size ~8 and the
    candidate count ~linear. At the driver-tested SFs (≤2k vectors)
    the formula floors at 8, so results there are byte-identical to
    the fixed config."""
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    n_rows = emb.count()  # parquet-metadata count: no data scan
    n_planes = min(
        20, max(8, math.ceil(math.log2(max(n_rows / 8, 2))))
    )
    return lsh_bucketed_pairs(
        emb, "vec_id", "embedding", dim=64, n_planes=n_planes,
        n_tables=8, min_cosine=0.3, bucket_cap=1000,
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

@query(
    "q_text_stats",
    "SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,"
    " len(list_distinct(string_split(text, ' '))) AS n_unique,"
    " ROUND(CAST(list_sum(list_transform(string_split(text, ' '),"
    " t -> length(t))) AS DOUBLE) / len(string_split(text, ' ')), 4)"
    " AS avg_token_len FROM documents",
)
def q_text_stats(spark, sf_dir):
    """Token-level stats per document (tokenize, distinct, mean length)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = T.tokens(F.col("text"))
    total_len = F.aggregate(
        F.transform(tok, F.length), F.lit(0), lambda acc, x: acc + x
    )
    return docs.select(
        "doc_id",
        F.size(tok).alias("n_tokens"),
        F.size(F.array_distinct(tok)).alias("n_unique"),
        F.round(total_len.cast("double") / F.size(tok), 4).alias("avg_token_len"),
    )


@query(
    "q_token_count",
    f"SELECT doc_id, CAST(len(regexp_extract_all(lower(text),"
    f" '{T.TOKEN_REGEX}')) AS INTEGER) AS n_bpe_tokens FROM documents",
)
def q_token_count(spark, sf_dir):
    """BPE-ish token counting with a regex lexer (letters/digits/punct)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.size(T.bpe_ish_tokens(F.col("text"))).alias("n_bpe_tokens")
    )


@query(
    "q_lang_id",
    "SELECT doc_id, lang AS labeled_lang, "
    + T.sql_lang_id("string_split(lower(text), ' ')")
    + " AS lang_guess FROM documents",
)
def q_lang_id(spark, sf_dir):
    """Stopword-profile language ID (argmax over per-language marker hits,
    deterministic tie-break)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        T.lang_id(T.tokens(F.lower(F.col("text")))).alias("lang_guess"),
    )


@query(
    "q_quality_score",
    "SELECT doc_id, " + T.sql_quality_score("text") + " AS quality FROM documents",
)
def q_quality_score(spark, sf_dir):
    """Heuristic quality score (length / charset / stopword-ratio blend)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.quality_score(F.col("text")).alias("quality"))


@query(
    "q_doc_fingerprint",
    "SELECT doc_id, " + T.sql_fingerprint("text", 5) + " AS fingerprint"
    " FROM documents",
)
def q_doc_fingerprint(spark, sf_dir):
    """Document fingerprint: lexicographic-min MD5 over 5-token shingles
    (1-permutation MinHash; rolling-hash analog)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint(F.col("text"), 5).alias("fingerprint"))


@query(
    "q_asof_join",
    """
    WITH r AS (SELECT user_id, ts, max(value) AS rate FROM events
               WHERE event_type = 'purchase' GROUP BY user_id, ts),
         l AS (SELECT * FROM events WHERE event_type <> 'purchase')
    SELECT l.event_id, r.rate AS asof_rate
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def q_asof_join(spark, sf_dir):
    """As-of join (operators/temporal.py): each non-purchase event picks
    up the most recent prior purchase value for its user — union + one
    window per key (single shuffle), verified against DuckDB's native
    ASOF JOIN."""
    from ..operators.temporal import asof_join

    events = load_table(spark, sf_dir, "events")
    right = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("rate"))
    )
    left = events.filter(F.col("event_type") != "purchase")
    return asof_join(left, right, "user_id", value_cols=["rate"]).select(
        "event_id", F.col("asof_rate")
    )


_TIERS = [(0.0, 100.0, "t0"), (100.0, 200.0, "t1"), (200.0, 300.0, "t2"),
          (300.0, 400.0, "t3"), (400.0, 500.0, "t4")]


@query(
    "q_range_join",
    "WITH tiers(lo, hi, tier) AS (VALUES "
    + ", ".join(f"({lo}, {hi}, '{t}')" for lo, hi, t in _TIERS)
    + ") SELECT event_id, tier FROM events JOIN tiers"
    " ON value >= lo AND value < hi",
)
def q_range_join(spark, sf_dir):
    """Range (point-in-interval) join (operators/temporal.py): events
    bucketed into value tiers via derived-bucket equi-join — a hash join
    instead of the nested-loop BETWEEN theta join, verified against the
    exact theta-join oracle."""
    from ..operators.temporal import range_join_fixed_buckets

    events = load_table(spark, sf_dir, "events")
    tiers = spark.createDataFrame(_TIERS, "lo double, hi double, tier string")
    return range_join_fixed_buckets(
        events, tiers, "value", "lo", "hi", bucket_width=100.0
    ).select("event_id", "tier")


@query(
    "q_salted_count",
    "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
)
def q_salted_count(spark, sf_dir):
    """Skew-mitigated two-phase salted count (operators/skew.py): the hot
    key is split across 16 salt partitions pre-aggregation, then merged —
    verified IDENTICAL to the plain GROUP BY oracle."""
    from ..operators.skew import salted_count

    events = load_table(spark, sf_dir, "events")
    return salted_count(events, ["event_type"], n_salts=16)


@query(
    "q_salted_join",
    "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,"
    f" {C.sql_exact_sum('o_totalprice')} AS total_price"
    " FROM orders JOIN customer ON o_custkey = c_custkey"
    " GROUP BY c_mktsegment",
)
def q_salted_join(spark, sf_dir):
    """Skew-safe manual salted join (operators/skew.salted_join): the
    fact side is salted with pmod(xxhash64(orderkey), 16) and the dim
    replicated 16×, so a single hot custkey spreads across 16 shuffle
    partitions — the fallback for when AQE can't split a key and the
    dim can't broadcast. Verified IDENTICAL to the plain equi-join."""
    from ..operators.skew import salted_join

    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    joined = salted_join(
        orders,
        customer.select("c_custkey", "c_mktsegment").withColumnRenamed(
            "c_custkey", "o_custkey"
        ),
        key="o_custkey",
        salt_on="o_orderkey",
        n_salts=16,
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        C.exact_sum("o_totalprice").alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Corpus hygiene: benchmark decontamination + PII redaction
# ---------------------------------------------------------------------------

_DECON_ORACLE = f"""
WITH bench AS (
  SELECT DISTINCT unnest({T.sql_shingles("string_split(text, ' ')", 5)}) AS s
  FROM documents WHERE doc_id % 97 = 0
), tr AS (
  SELECT doc_id, unnest({T.sql_shingles("string_split(text, ' ')", 5)}) AS s
  FROM documents WHERE doc_id % 97 <> 0
), contaminated AS (
  SELECT DISTINCT tr.doc_id FROM tr JOIN bench USING (s)
)
SELECT doc_id, lang, n_chars FROM documents
WHERE doc_id % 97 <> 0
  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
"""


@query("q_decontaminate", _DECON_ORACLE)
def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination — the training-corpus hygiene step: drop
    every training document sharing ANY 5-gram with the (deterministic
    doc_id%97) benchmark set. Scale shape: the benchmark side is bounded
    by contract, so its distinct shingle set BROADCASTS; the training
    side streams through one explode + broadcast semi-join + anti-join —
    the fact table is never shuffled. At 100 TB you additionally hash the
    shingles to fixed-width keys (kept as raw strings here for oracle
    parity)."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    from ..functions.text import shingles, tokens

    bench_sh = bench.select(
        F.explode(shingles(tokens(F.col("text")), 5)).alias("s")
    ).distinct()
    train_sh = train.select(
        "doc_id", F.explode(shingles(tokens(F.col("text")), 5)).alias("s")
    )
    contaminated = (
        train_sh.join(F.broadcast(bench_sh), "s", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return train.join(contaminated, "doc_id", "left_anti").select(
        "doc_id", "lang", "n_chars"
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}"

_PII_ORACLE = f"""
WITH aug AS (
  SELECT doc_id,
         substr(text, 1, 80) || ' reach user' || doc_id ||
         '@example.com or +1-555-000-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         AS raw
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS INTEGER) AS n_emails,
       regexp_replace(regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
FROM aug
"""


@query("q_pii_redact", _PII_ORACLE)
def q_pii_redact(spark, sf_dir):
    """PII redaction — scrub email/phone patterns from document text
    (fixtures carry no PII, so a deterministic email+phone is synthesized
    per row first; the redaction expressions are the operator). Pure JVM
    regexp expression tree: zero UDF, zero shuffle, fully pushdown-
    friendly — the shape a 100 TB scrub pass needs."""
    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.substring(F.col("text"), 1, 80),
        F.lit(" reach user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-000-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    aug = docs.select("doc_id", raw.alias("raw"))
    return aug.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.col("raw"), F.lit(_EMAIL_RE), F.lit(0))
        ).alias("n_emails"),
        F.regexp_replace(
            F.regexp_replace(F.col("raw"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("redacted"),
    )


# ---------------------------------------------------------------------------
# Corpus sampling / mixture, sequence packing, ranking, repetition
# ---------------------------------------------------------------------------

_STRAT_RATES = {"en": 0.25, "es": 0.75, "fr": 1.0, "de": 0.1, "zh": 0.5}

_STRAT_ORACLE = (
    "SELECT doc_id, lang, source, n_chars FROM documents WHERE "
    + Sa.sql_unit_hash("doc_id")
    + " < (CASE "
    + " ".join(f"WHEN lang = '{v}' THEN {r!r}" for v, r in _STRAT_RATES.items())
    + " ELSE 1.0 END)"
)


@query("q_stratified_sample", _STRAT_ORACLE)
def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling — per-language keep rates via a
    multiplicative-hash uniform, so the kept row SET is exactly
    reproducible across engines, tasks, and retries (``rand()`` is none
    of those). Pure per-row filter: zero shuffle, composes with scan
    pushdown — the corpus-rebalancing primitive at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    return Sa.stratified_sample(docs, "lang", _STRAT_RATES, "doc_id").select(
        "doc_id", "lang", "source", "n_chars"
    )


_MIX_WEIGHTS = {"en": 0.4, "es": 0.15, "fr": 0.15, "de": 0.15, "zh": 0.15}
_MIX_TOTAL = 300

_MIX_ORACLE = f"""
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS __n FROM documents GROUP BY lang
), kept AS (
  SELECT d.lang FROM documents d JOIN counts c USING (lang)
  WHERE {Sa.sql_unit_hash("d.doc_id")} <
        {Sa.sql_mixture_rate("d.lang", _MIX_WEIGHTS, _MIX_TOTAL)}
), s AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled FROM kept GROUP BY lang
)
SELECT c.lang, c.__n AS n_orig, COALESCE(s.n_sampled, 0) AS n_sampled
FROM counts c LEFT JOIN s USING (lang)
"""


@query("q_data_mixture", _MIX_ORACLE)
def q_data_mixture(spark, sf_dir):
    """Target-mixture resampling: downsample each language stratum to
    ``min(1, weight·target/count)`` so the output composition approaches
    the target weights. The per-stratum rate table is stratum-cardinality
    (dimension-bounded, safely broadcast); the fact side is filtered,
    never shuffled. Output is the per-stratum before/after census."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_orig"))
    kept = Sa.mixture_sample(docs, "lang", _MIX_WEIGHTS, _MIX_TOTAL, "doc_id")
    s = kept.groupBy("lang").agg(F.count("*").alias("__ns"))
    return counts.join(s, "lang", "left").select(
        "lang",
        "n_orig",
        F.coalesce(F.col("__ns"), F.lit(0)).alias("n_sampled"),
    )


_PACK_ORACLE = """
WITH b AS (
  SELECT doc_id, CAST(doc_id % 32 AS INTEGER) AS grp,
         len(string_split(text, ' ')) AS n_tok
  FROM documents
), w AS (
  SELECT *, COALESCE(SUM(n_tok) OVER (
      PARTITION BY grp ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
  FROM b
)
SELECT grp, doc_id, n_tok,
       CAST(floor(cb / 512.0) AS BIGINT) AS start_chunk,
       CAST(floor((cb + greatest(n_tok, 1) - 1) / 512.0) AS BIGINT) AS end_chunk
FROM w
"""


@query("q_pack_chunks", _PACK_ORACLE)
def q_pack_chunks(spark, sf_dir):
    """Concat-and-chunk sequence packing (the GPT pretraining layout):
    within each pack group, documents are concatenated in id order and
    cut into 512-token blocks; each doc reports the chunk span it covers.
    ONE shuffle on the group key + an in-partition window cumsum — the
    group count scales with the cluster, no cross-group state
    (operators/packing.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return pack_chunks(
        docs, "doc_id", F.size(T.tokens(F.col("text"))), n_groups=32, chunk_len=512
    )


@query("q_seq_pack")  # greedy per-group FFD state → not window-SQL; rows-only
def q_seq_pack(spark, sf_dir):
    """Whole-document first-fit-decreasing bin packing (no doc splits)
    via one Arrow-batched applyInPandas per pack group, summarized to
    per-group (docs, bins, tokens, fill%). Deterministic ordering; the
    greedy bin state is sequential only WITHIN a group — groups are the
    distributed unit (operators/packing.py). Invariants (capacity,
    exactly-once, fill ≥ naive) pinned in tests/test_packing.py."""
    docs = load_table(spark, sf_dir, "documents")
    packed = first_fit_pack(
        docs, "doc_id", F.size(T.tokens(F.col("text"))), capacity=256, n_groups=32
    )
    return pack_stats(packed, capacity=256)


_BM25_TERMS = ["table", "spark", "customer", "window", "stream"]


@query("q_bm25_rank", sql_bm25_topk(_BM25_TERMS, k=20))
def q_bm25_rank(spark, sf_dir):
    """BM25 ranked retrieval of the top-20 documents for a seed-term
    query — corpus stats (N, avgdl, per-term df) are one partial-agg
    pass broadcast back; scoring is a pure codegen expression tree and
    top-k is TakeOrderedAndProject, so the corpus is never shuffled
    (operators/ranking.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_TERMS, k=20)


_REP_ORACLE = f"""
WITH g AS (
  SELECT doc_id, unnest({T.sql_ngrams_all("string_split(text, ' ')", 2)}) AS gram
  FROM documents
), c AS (
  SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY doc_id, gram
)
SELECT doc_id,
       CAST(sum(n) AS BIGINT) AS n_bigrams,
       CAST(max(n) AS BIGINT) AS top_bigram_n,
       floor(CAST(max(n) AS DOUBLE) / sum(n) * 10000.0 + 0.5) / 10000.0
         AS top_frac,
       floor(CAST(count(*) AS DOUBLE) / sum(n) * 10000.0 + 0.5) / 10000.0
         AS distinct_frac
FROM c GROUP BY doc_id
"""


@query("q_repetition", _REP_ORACLE)
def q_repetition(spark, sf_dir):
    """Repetition quality signal (the Gopher-style dup-n-gram filter):
    per document, the most frequent word bigram's share of all bigrams
    and the distinct-bigram ratio — high top_frac / low distinct_frac
    flags boilerplate and degenerate repetition. One explode + two-phase
    hash agg; n-grams keep multiplicity (functions/text.ngrams_all)."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.explode(T.ngrams_all(T.tokens(F.col("text")), 2)).alias("gram"),
    )
    per_gram = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("n"))
    return per_gram.groupBy("doc_id").agg(
        F.sum("n").alias("n_bigrams"),
        F.max("n").alias("top_bigram_n"),
        (
            F.floor(
                F.max("n").cast("double") / F.sum("n") * 10000.0 + 0.5
            )
            / 10000.0
        ).alias("top_frac"),
        (
            F.floor(
                F.count("*").cast("double") / F.sum("n") * 10000.0 + 0.5
            )
            / 10000.0
        ).alias("distinct_frac"),
    )


_INCR_ORACLE = """
WITH inc AS (
  SELECT * FROM documents WHERE source = 'src0'
), batch_deduped AS (
  SELECT * FROM inc
  QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
), ex AS (
  SELECT DISTINCT text FROM documents WHERE source <> 'src0'
)
SELECT b.doc_id, b.lang, b.source, b.n_chars
FROM batch_deduped b ANTI JOIN ex e ON b.text = e.text
"""


@query("q_incremental_dedup", _INCR_ORACLE)
def q_incremental_dedup(spark, sf_dir):
    """Append-only ingest dedup: clean a NEW batch (source=src0) against
    the already-ingested corpus — dedup within the batch, then anti-join
    on sha2(text) against the corpus's 32-byte hash index (the corpus
    text never travels; at scale the index is materialized once per
    corpus, not recomputed per batch). operators/dedup.incremental_dedup."""
    from ..operators.dedup import incremental_dedup

    docs = load_table(spark, sf_dir, "documents")
    incoming = docs.filter(F.col("source") == "src0")
    existing = docs.filter(F.col("source") != "src0")
    return incremental_dedup(existing, incoming, "text", "doc_id").select(
        "doc_id", "lang", "source", "n_chars"
    )


_FILTER_ORACLE = f"""
WITH rep AS (
  SELECT doc_id, floor(CAST(max(n) AS DOUBLE) / sum(n) * 10000.0 + 0.5) / 10000.0
           AS top_frac
  FROM (
    SELECT doc_id, gram, count(*) AS n
    FROM (
      SELECT doc_id,
             unnest({T.sql_ngrams_all("string_split(text, ' ')", 2)}) AS gram
      FROM documents
    ) GROUP BY doc_id, gram
  ) GROUP BY doc_id
)
SELECT d.doc_id, d.lang, d.n_chars,
       {T.sql_quality_score("d.text")} AS quality, r.top_frac
FROM documents d JOIN rep r USING (doc_id)
WHERE {T.sql_quality_score("d.text")} >= 0.5
  AND r.top_frac <= 0.06
  AND len(string_split(d.text, ' ')) >= 20
  AND {T.sql_lang_id("string_split(lower(d.text), ' ')")} <> 'und'
"""


@query("q_corpus_filter_pipeline", _FILTER_ORACLE)
def q_corpus_filter_pipeline(spark, sf_dir):
    """The composed corpus cleaning pass — what a user actually runs:
    quality score ≥ 0.5 AND top-bigram share ≤ 0.06 AND ≥ 20 tokens AND
    language identified, in ONE pipeline. The scalar gates (quality,
    length, lang-ID) are pure codegen expressions evaluated in the scan
    stage; only the repetition signal needs its explode + two-phase agg,
    joined back on doc_id — so the whole pass is one shuffle pair over
    the corpus regardless of how many scalar filters stack on."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.explode(T.ngrams_all(T.tokens(F.col("text")), 2)).alias("gram"),
    )
    rep = (
        grams.groupBy("doc_id", "gram")
        .agg(F.count("*").alias("n"))
        .groupBy("doc_id")
        .agg(
            (
                F.floor(F.max("n").cast("double") / F.sum("n") * 10000.0 + 0.5)
                / 10000.0
            ).alias("top_frac")
        )
    )
    tok = T.tokens(F.col("text"))
    return (
        docs.join(rep, "doc_id")
        .filter(
            (T.quality_score(F.col("text")) >= 0.5)
            & (F.col("top_frac") <= 0.06)
            & (F.size(tok) >= 20)
            & (T.lang_id(T.tokens(F.lower(F.col("text")))) != "und")
        )
        .select(
            "doc_id",
            "lang",
            "n_chars",
            T.quality_score(F.col("text")).alias("quality"),
            "top_frac",
        )
    )


_FUNNEL_STAGES = ["signup", "click", "purchase"]


def _funnel_oracle():
    from ..operators.funnel import sql_funnel_census

    return sql_funnel_census(_FUNNEL_STAGES)


@query("q_funnel", _funnel_oracle())
def q_funnel(spark, sf_dir):
    """Ordered-stage funnel conversion (operators/funnel.py): users who
    signed up, then clicked AFTER signup, then purchased AFTER that
    click. One conditional-min aggregate + join per stage, all keyed on
    user_id so the first shuffle's partitioning is reused throughout —
    no per-user event arrays are ever materialized (the collect-and-fold
    alternative is a memory hazard for power users at 100 TB)."""
    from ..operators.funnel import funnel_census

    events = load_table(spark, sf_dir, "events")
    return funnel_census(events, _FUNNEL_STAGES)


_DECILES = [i / 10.0 for i in range(1, 10)]
_CURRICULUM_ORACLE = f"""
WITH bounds AS (
  SELECT quantile_cont(CAST(n_chars AS DOUBLE),
                       {[round(p, 1) for p in _DECILES]}) AS bs
  FROM documents
)
SELECT d.doc_id,
       CAST(len(list_filter(b.bs, x -> x <= CAST(d.n_chars AS DOUBLE)))
            AS INTEGER) AS bucket
FROM documents d, bounds b
"""


@query("q_curriculum_buckets", _CURRICULUM_ORACLE)
def q_curriculum_buckets(spark, sf_dir):
    """Decile curriculum bucketing WITHOUT a global window: a global
    ``ntile(10)`` plans a single-partition sort at any scale, so the
    bucket is instead 'how many decile bounds sit at or below this row'
    — one 9-value exact-percentile aggregate (sketchable via
    approx_percentile at 100 TB) broadcast into a scan-side array
    expression. Zero fact shuffle, stable under re-partitioning, and the
    bucket boundaries are identical to ntile's for distinct values."""
    docs = load_table(spark, sf_dir, "documents")
    bounds = docs.agg(
        F.percentile(
            F.col("n_chars").cast("double"), F.lit(_DECILES)
        ).alias("bs")
    )
    return (
        docs.join(F.broadcast(bounds))
        .select(
            "doc_id",
            F.size(
                F.filter(
                    F.col("bs"),
                    lambda x: x <= F.col("n_chars").cast("double"),
                )
            ).alias("bucket"),
        )
    )


def _z_oracle_sql():
    from ..operators.layout import sql_int_bucket, sql_z_value

    b_chars = sql_int_bucket("n_chars", 0, 5000, bits=8)
    b_id = "(doc_id % 256)"
    return (
        "SELECT doc_id, CAST("
        + sql_z_value([b_chars, b_id], bits=8)
        + " AS BIGINT) AS z FROM documents"
    )


@query("q_zorder_value", _z_oracle_sql())
def q_zorder_value(spark, sf_dir):
    """Morton (Z-order) code per document (operators/layout.z_value):
    bit-interleave of the bucketed length and the low doc_id bits — the
    clustering key behind multi-dimensional file layout
    (layout.zorder_write; file-skipping benefit pinned against a
    linear sort in tests/test_layout.py). Pure shift/mask integer tree,
    hash-matches the SQL oracle bit-for-bit."""
    from ..operators.layout import int_bucket, z_value

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        z_value(
            [int_bucket("n_chars", 0, 5000, bits=8), F.pmod("doc_id", F.lit(256))],
            bits=8,
        ).alias("z"),
    )


@query("q_incremental_neardup")  # xxhash64 signatures → rows-only
def q_incremental_neardup(spark, sf_dir):
    """Append-only NEAR-dup ingest (operators/dedup.incremental_lsh_pairs):
    the existing corpus (doc_id < 400) contributes only its pre-built
    MinHash band index — its text is never re-shingled — while the new
    batch (doc_id ≥ 400) computes fresh signatures and probes the union
    of indexes. Returns batch-vs-corpus and batch-internal candidate
    pairs only; corpus-vs-corpus pairs are never recomputed. Equality
    with the from-scratch run's batch-touching pairs is pinned in
    tests/test_operators.py."""
    from ..operators.dedup import incremental_lsh_pairs, minhash_band_index

    docs = load_table(spark, sf_dir, "documents")
    corpus_index = minhash_band_index(
        docs.filter(F.col("doc_id") < 400), "doc_id", "text"
    )
    batch = docs.filter(F.col("doc_id") >= 400)
    return incremental_lsh_pairs(
        corpus_index, batch, "doc_id", "text", min_est_jaccard=0.3
    )


_ROLLUP_MAINT_ORACLE = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year, o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       {C.sql_exact_sum("o_totalprice")} AS total_price
FROM orders WHERE year(o_orderdate) <= 1997
GROUP BY 1, 2
"""


@query("q_rollup_maintenance", _ROLLUP_MAINT_ORACLE)
def q_rollup_maintenance(spark, sf_dir):
    """Incremental materialized-aggregate maintenance
    (operators/aggregates.merge_rollup): an existing rollup (orders
    <1997 by year×status) absorbs 1997's PARTIAL aggregate by merging
    two key-cardinality tables — history is never re-read. Partials stay
    in exact decimal until the final double cast, so the maintained
    rollup hash-matches a full recompute (the oracle) bit-for-bit."""
    from ..operators.aggregates import merge_rollup

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("int")
    )

    def partial(df):
        return df.groupBy("order_year", "o_orderstatus").agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias(
                "sum_dec"
            ),
        )

    existing = partial(orders.filter(F.col("order_year") < 1997))
    increment = partial(orders.filter(F.col("order_year") == 1997))
    merged = merge_rollup(
        existing,
        increment,
        ["order_year", "o_orderstatus"],
        {"n": "sum", "sum_dec": "sum"},
    )
    return merged.select(
        "order_year",
        "o_orderstatus",
        F.col("n").cast("bigint").alias("n"),
        F.col("sum_dec").cast("double").alias("total_price"),
    )


_SCHEMA_EVO_ORACLE = """
SELECT doc_id, lang, NULL AS quality FROM documents WHERE doc_id < 250
UNION ALL
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS quality
FROM documents WHERE doc_id >= 250
"""


@query("q_schema_evolution", _SCHEMA_EVO_ORACLE)
def q_schema_evolution(spark, sf_dir):
    """Schema evolution on a growing lake table: an early batch lands
    (doc_id, lang), a later batch adds a ``quality`` column, and ONE
    ``mergeSchema`` read returns the union schema with NULLs where the
    old files predate the column — the append-only evolution path that
    avoids rewriting 100 TB of history for an additive change.
    ``mergeSchema`` is opt-in per read (footer reconciliation costs one
    extra pass over file metadata, nothing over data); pinning the
    reconciled result against a relational oracle proves old files stay
    readable untouched."""
    import tempfile

    base = tempfile.mkdtemp(prefix="lbd_schemaevo_") + "/docs"
    docs = load_table(spark, sf_dir, "documents")
    docs.filter(F.col("doc_id") < 250).select("doc_id", "lang").write.parquet(
        base
    )
    docs.filter(F.col("doc_id") >= 250).select(
        "doc_id", "lang", F.col("n_chars").alias("quality")
    ).write.mode("append").parquet(base)
    return spark.read.option("mergeSchema", "true").parquet(base).select(
        "doc_id", "lang", "quality"
    )


_TRIM_ORACLE = """
WITH bounds AS (
  SELECT quantile_cont(CAST(n_chars AS DOUBLE), 0.05) AS lo,
         quantile_cont(CAST(n_chars AS DOUBLE), 0.95) AS hi
  FROM documents
)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d, bounds b
WHERE CAST(d.n_chars AS DOUBLE) >= b.lo AND CAST(d.n_chars AS DOUBLE) <= b.hi
"""


@query("q_length_trim", _TRIM_ORACLE)
def q_length_trim(spark, sf_dir):
    """Percentile-based outlier trimming (drop the shortest/longest 5%
    of documents — the standard length-distribution cleanup before
    training). The bounds are ONE single-row exact-percentile aggregate
    broadcast into the scan-side filter via a nested-loop join of a
    1-row table — the fact table is never shuffled. Exact percentile
    pins the semantics; the 100 TB swap-in is ``approx_percentile``
    (mergeable sketch), changing only the bounds aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    bounds = docs.agg(
        F.percentile(F.col("n_chars").cast("double"), 0.05).alias("lo"),
        F.percentile(F.col("n_chars").cast("double"), 0.95).alias("hi"),
    )
    return (
        docs.join(F.broadcast(bounds))
        .filter(
            (F.col("n_chars").cast("double") >= F.col("lo"))
            & (F.col("n_chars").cast("double") <= F.col("hi"))
        )
        .select("doc_id", "lang", "n_chars")
    )


@query(
    "q_partitioned_sink",
    "SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en'",
)
def q_partitioned_sink(spark, sf_dir):
    """Directory-partitioned parquet sink + partition-pruned read-back:
    documents written partitionBy(lang), sorted by doc_id within
    partitions (row-group stat clustering), then read with a lang filter
    that prunes whole directories before any file opens — the layout
    move that turns a 100 TB scan into a per-partition read. Pruning is
    pinned in tests/test_plan_audit.py (PartitionFilters on the scan)."""
    import tempfile

    from ..sources.sinks import write_partitioned_parquet

    docs = load_table(spark, sf_dir, "documents")
    path = write_partitioned_parquet(
        docs.select("doc_id", "n_chars", "lang"),
        tempfile.mkdtemp(prefix="lbd_part_") + "/documents_by_lang",
        partition_by=["lang"],
        sort_within=["doc_id"],
    )
    return (
        spark.read.parquet(path)
        .filter(F.col("lang") == "en")
        .select("doc_id", F.col("lang").cast("string").alias("lang"), "n_chars")
    )


_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}

_SPLIT_ORACLE = f"""
SELECT {Sa.sql_group_split("CAST(regexp_extract(source, '[0-9]+') AS BIGINT)", _SPLITS)}
         AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources
FROM documents GROUP BY 1
"""


@query("q_train_val_split", _SPLIT_ORACLE)
def q_train_val_split(spark, sf_dir):
    """Leakage-safe train/val/test split: assignment hashes the SOURCE
    (group) key, never the row, so same-origin near-duplicates cannot
    straddle splits and leak eval data into training. Zero shuffle for
    the assignment itself (one label expression); the output census is
    one agg. operators/sampling.group_split; production string keys use
    xxhash64 — the numeric fixture key keeps the oracle exact."""
    docs = load_table(spark, sf_dir, "documents")
    src_num = F.regexp_extract(F.col("source"), "[0-9]+", 0).cast("bigint")
    return (
        docs.withColumn("split", Sa.group_split(src_num, _SPLITS))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


@query("q_compact_files")  # file-count result is layout, not SQL → rows-only
def q_compact_files(spark, sf_dir):
    """Small-file compaction: explode documents into a many-tiny-file
    directory, compact to ⌈rows/200⌉ evenly sized files via one
    round-robin repartition + maxRecordsPerFile, and report
    before/after file counts from the filesystem — the table-maintenance
    op that keeps scan listing costs flat at 100 TB
    (sources/sinks.compact_parquet)."""
    import glob
    import tempfile

    from ..sources.sinks import compact_parquet

    base = tempfile.mkdtemp(prefix="lbd_compact_")
    frag, packed = f"{base}/frag", f"{base}/packed"
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    docs.repartition(64).write.parquet(frag)  # simulate tiny-file ingest
    compact_parquet(spark, frag, packed, target_rows_per_file=200)

    def _count(p):
        return len(glob.glob(f"{p}/part-*.parquet"))

    n_rows = docs.count()
    return spark.createDataFrame(
        [(n_rows, _count(frag), _count(packed))],
        "n_rows bigint, files_before int, files_after int",
    )


# ---------------------------------------------------------------------------
# Global ordering / corpus-level text statistics / upsert
# ---------------------------------------------------------------------------


@query(
    "q_global_index",
    "SELECT doc_id, n_chars,"
    " CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS BIGINT)"
    "   AS global_idx"
    " FROM documents",
)
def q_global_index(spark, sf_dir):
    """Distributed global sort index (curriculum order: longest docs
    first). ``row_number() OVER (ORDER BY ...)`` would collapse to ONE
    partition; operators/ordering.global_sort_index instead range-
    partitions, pins boundaries with a localCheckpoint, collects one
    (count, min_id) row PER PARTITION, and broadcast-joins the
    cumulative offsets back — no single-partition stage, no second
    full-data shuffle, driver state bounded by the partition count."""
    from ..operators.ordering import global_sort_index

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return global_sort_index(
        docs, [F.desc("n_chars"), F.asc("doc_id")], "global_idx"
    )


@query("q_unigram_score", Co.sql_unigram_score())
def q_unigram_score(spark, sf_dir):
    """Corpus-frequency unigram scoring (operators/corpus.unigram_score):
    pass 1 builds the top-1000 token vocabulary, pass 2 broadcast-joins
    it back for a per-doc mean-frequency score — the bounded-vocab shape
    that keeps the corpus→row feedback edge a broadcast at 100 TB.
    Integer-exact until one final IEEE division, so it hash-matches the
    SQL oracle."""
    docs = load_table(spark, sf_dir, "documents")
    return Co.unigram_score(docs)


@query("q_boilerplate_strip", Co.sql_strip_boilerplate())
def q_boilerplate_strip(spark, sf_dir):
    """Cross-document boilerplate removal (operators/corpus.
    strip_boilerplate): 8-token chunks appearing in ≥2 docs are dropped;
    document-frequency shuffles sha2 digests only, the small surviving
    boilerplate set broadcasts back, and cleaned text is rebuilt with
    one order-restoring groupBy — verified against the SQL oracle down
    to the sha256 of the reassembled text."""
    docs = load_table(spark, sf_dir, "documents")
    return Co.strip_boilerplate(docs)


@query("q_ngram_novelty", Co.sql_ngram_novelty())
def q_ngram_novelty(spark, sf_dir):
    """Per-document originality (operators/corpus.ngram_novelty): the
    fraction of a doc's distinct 3-gram shingles appearing in no other
    document. The cross-document edge is one shingle-digest aggregate
    that yields df AND owner together, so unique grams route to their
    doc through min(doc) — no gram-level join-back, nothing corpus-sized
    broadcast. Integer-exact until one division → hash-matches."""
    docs = load_table(spark, sf_dir, "documents")
    return Co.ngram_novelty(docs)


_SHARD_ORACLE = f"""
WITH sharded AS (
  SELECT CAST(floor({Sa.sql_unit_hash("doc_id")} * 8) AS INTEGER) AS shard,
         sha256(concat_ws('|', CAST(doc_id AS VARCHAR), text)) AS h
  FROM documents
)
SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
       sha256(string_agg(h, '' ORDER BY h)) AS content_sha
FROM sharded GROUP BY shard
"""


@query("q_shard_manifest", _SHARD_ORACLE)
def q_shard_manifest(spark, sf_dir):
    """Deterministic shard export + integrity manifest
    (sources/sinks.shard_export): documents written as 8 hash-assigned
    shard directories (one task per shard — file count O(n_shards)),
    manifest computed from the READ-BACK files: per-shard row count and
    an order-independent sha256-of-sorted-row-digests. Hash-matching the
    relational oracle proves the written shards carry exactly the
    assigned rows — a lost, duplicated, or corrupted row flips the
    digest."""
    import tempfile

    from ..sources.sinks import shard_export

    docs = load_table(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="lbd_shards_") + "/docs"
    return shard_export(
        spark, docs, path, n_shards=8, id_col="doc_id",
        digest_cols=["doc_id", "text"],
    )


_UPSERT_ORACLE = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(count(*) AS BIGINT) AS n_orders,
       {C.sql_exact_sum(
           "CASE WHEN year(o_orderdate) = 1996"
           " THEN o_totalprice * 2 ELSE o_totalprice END"
       )} AS total_price
FROM orders WHERE year(o_orderdate) < 1997
GROUP BY 1
"""


@query("q_upsert_partition", _UPSERT_ORACLE)
def q_upsert_partition(spark, sf_dir):
    """Partition-level upsert (sources/sinks.upsert_partitions): seed a
    year-partitioned orders table (<1997), then re-ingest 1996 with
    doubled prices via dynamic partition overwrite — ONLY the 1996
    directory is swapped, other partitions' files are untouched. The
    read-back census must match an oracle that applies the update
    relationally, proving the swap replaced exactly one partition."""
    import tempfile

    from ..sources.sinks import upsert_partitions

    base = tempfile.mkdtemp(prefix="lbd_upsert_") + "/orders"
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("int")
    )
    orders.filter(F.col("order_year") < 1997).write.partitionBy(
        "order_year"
    ).parquet(base)

    updates = orders.filter(F.col("order_year") == 1996).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    upsert_partitions(spark, base, updates, ["order_year"])

    return (
        spark.read.parquet(base)
        .groupBy(F.col("order_year").cast("int").alias("order_year"))
        .agg(
            F.count("*").alias("n_orders"),
            C.exact_sum("o_totalprice").alias("total_price"),
        )
    )


@query(
    "q_orc_roundtrip",
    "SELECT doc_id, lang, source, n_chars FROM documents",
)
def q_orc_roundtrip(spark, sf_dir):
    """ORC source/sink roundtrip: write the documents metadata columns
    as ORC (Spark's second columnar builtin — zlib striped, predicate-
    pushdown-capable like parquet), read them back, and verify content
    parity against the parquet-backed oracle."""
    import tempfile

    path = tempfile.mkdtemp(prefix="lbd_orc_") + "/docs"
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    docs.write.orc(path)
    return spark.read.orc(path)


# ---------------------------------------------------------------------------
# Approximate / events / multimodal
# ---------------------------------------------------------------------------

@query("q_approx_distinct")  # HLL sketch value is engine-specific → rows-only
def q_approx_distinct(spark, sf_dir):
    """approx_count_distinct over order customers (HLL sketch)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.approx_count_distinct("o_custkey").alias("approx_customers"),
        F.count("*").alias("n_orders"),
    )


@query(
    "q_sessionize",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    )
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM marked GROUP BY user_id
    """,
)
def q_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min gap) — batch twin of
    session_window streaming."""
    events = load_table(spark, sf_dir, "events")
    s = sessionize(events, "user_id", "ts", gap_minutes=30)
    return s.groupBy("user_id").agg(
        F.max("session_id").cast("bigint").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


@query(
    "q_topk_per_group",
    "SELECT event_type, event_id, value FROM events"
    " QUALIFY row_number() OVER (PARTITION BY event_type"
    " ORDER BY value DESC, event_id ASC) <= 3",
)
def q_topk_per_group(spark, sf_dir):
    """Top-3 events by value per event type (window top-k pattern)."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 3)
        .select("event_type", "event_id", "value")
    )


@query(
    "q_binary_meta",
    "SELECT doc_id, octet_length(encode(text)) AS n_bytes,"
    " ascii(substr(text, 1, 1)) AS first_byte FROM documents",
)
def q_binary_meta(spark, sf_dir):
    """Multimodal column plumbing (SQL-checkable part): treat payloads as
    opaque binary + typed metadata; here text is encoded to bytes and
    measured without ever decoding on the driver."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length(F.encode(F.col("text"), "utf-8")).alias("n_bytes"),
        F.ascii(F.substring(F.col("text"), 1, 1)).alias("first_byte"),
    )


def _doc_payloads(spark, sf_dir):
    """(doc_id, payload binary, meta struct) fixture: deterministic binary
    payloads derived from document text — the multimodal input shape."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("image/png").alias("mime"),
            F.col("n_chars").cast("long").alias("size_hint"),
        ).alias("meta"),
    )


@query("q_multimodal_features")  # pandas-UDF pipeline → rows-only
def q_multimodal_features(spark, sf_dir):
    """Multimodal decode/feature-extract plumbing over binary payloads via
    mapInPandas (decoder is a clearly-marked deterministic stub — image
    libs aren't in this container; the Spark-side schema/batching is real).

    Output is projected to driver-hashable scalars (the raw
    ``array<double>`` features column breaks value-canonicalization
    downstream): per-row feature digest + count instead of the array.
    """
    feats = fake_image_features(_doc_payloads(spark, sf_dir))
    return feats.select(
        "doc_id",
        "mime",
        "n_bytes",
        F.size("features").alias("n_features"),
        F.sha2(F.to_json(F.col("features")), 256).alias("feature_digest"),
    )


@query("q_multimodal_resize")  # pandas-UDF 1→1 stage → rows-only
def q_multimodal_resize(spark, sf_dir):
    """Image-resize stage plumbing (sources/multimodal.py:resize_images):
    1→1 mapInPandas over binary payloads, deterministic fake resize
    (PIL absent). Output projected to hashable scalars: resized payload
    digest + byte count pin the stage's contract (width·height·3 bytes)."""
    from ..sources.multimodal import resize_images

    resized = resize_images(
        _doc_payloads(spark, sf_dir).select("doc_id", "payload"),
        width=16, height=16,
    )
    return resized.select(
        "doc_id",
        "width",
        "height",
        F.length("payload").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("payload_digest"),
    )


@query("q_multimodal_frames")  # pandas-UDF 1→N stage → rows-only
def q_multimodal_frames(spark, sf_dir):
    """Video frame-sampling stage plumbing (sources/multimodal.py:
    sample_frames): the 1→N row-amplification mapInPandas shape — frames
    materialize inside executors AFTER the scan, never in storage. Output
    projected to hashable scalars (frame digest per (doc_id, frame_idx))."""
    from ..sources.multimodal import sample_frames

    frames = sample_frames(
        _doc_payloads(spark, sf_dir).select("doc_id", "payload"),
        every_ms=1000, max_frames=4,
    )
    return frames.select(
        "doc_id",
        "frame_idx",
        "ts_ms",
        F.sha2(F.col("frame"), 256).alias("frame_digest"),
    )


@query("q_multimodal_audio")  # pandas-UDF 1→N stage → rows-only
def q_multimodal_audio(spark, sf_dir):
    """Audio frame-energy stage plumbing (sources/multimodal.py:
    audio_frame_energy): the audio-modality 1→N shape (VAD / loudness
    normalization live here), deterministic fake PCM decode (codec libs
    absent), RMS math numpy-pinned in tests/test_multimodal.py. Already
    scalar output — rounded for cross-run float stability."""
    from ..sources.multimodal import audio_frame_energy

    # frame small enough that fixture payloads (~100-500 "samples") span
    # several frames — the 1→N amplification is the contract under test
    frames = audio_frame_energy(
        _doc_payloads(spark, sf_dir).select("doc_id", "payload"),
        sample_rate=1000, frame_ms=100, max_frames=8,
    )
    return frames.select(
        "doc_id",
        "frame_idx",
        "start_ms",
        "n_samples",
        F.round("rms", 6).alias("rms"),
    )


from ..operators.tfidf import (  # noqa: E402
    bigram_pmi,
    sql_bigram_pmi,
    sql_tfidf_top_terms,
    tfidf_top_terms,
)


@query("q_tfidf_top_terms", sql_tfidf_top_terms(k=3))
def q_tfidf_top_terms(spark, sf_dir):
    """Per-document TF-IDF keyword extraction (operators/tfidf.
    tfidf_top_terms): (doc, term, count) triples are the only shuffled
    rows; the vocabulary-bounded df table and the one-row corpus count
    broadcast back. Ranks on the raw double score (products of exact
    counts) with a term tie-break, so the top-3 per doc hash-matches the
    DuckDB oracle."""
    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, k=3)


@query("q_bigram_pmi", sql_bigram_pmi(min_count=5, k=20))
def q_bigram_pmi(spark, sf_dir):
    """Bigram collocation mining by PMI (operators/tfidf.bigram_pmi) —
    the counting shape of a BPE merge step: map-side-combined unigram
    and bigram counts, vocabulary-bounded unigram table broadcast onto
    the pair side twice, totals as one-row broadcasts, top-k via
    TakeOrderedAndProject. Identical IEEE expression order in the oracle
    → bitwise hash match."""
    docs = load_table(spark, sf_dir, "documents")
    return bigram_pmi(docs, min_count=5, k=20)


from ..operators.fuzzy import fuzzy_join, sql_fuzzy_join  # noqa: E402
from ..operators.packing import (  # noqa: E402
    sliding_chunks,
    sql_sliding_chunks,
)

# dirty right side: delete one interior char at a key-derived position —
# every perturbed name sits at edit distance exactly 1 from its original,
# so the join must recover all 1:1 links plus any true near-pairs
_FUZZY_POS = "p_partkey % (len(p_name) - 2) + 2"
_FUZZY_LEFT_SQL = "SELECT p_partkey AS lid, p_name AS ltext FROM part"
_FUZZY_RIGHT_SQL = f"""
SELECT p_partkey + 1000000 AS rid,
       concat(substring(p_name, 1, CAST({_FUZZY_POS} AS INTEGER) - 1),
              substring(p_name, CAST({_FUZZY_POS} AS INTEGER) + 1,
                        len(p_name))) AS rtext
FROM part
"""


@query("q_fuzzy_join", sql_fuzzy_join(_FUZZY_LEFT_SQL, _FUZZY_RIGHT_SQL, 2))
def q_fuzzy_join(spark, sf_dir):
    """Edit-distance join with PassJoin pigeonhole blocking
    (operators/fuzzy.fuzzy_join): left = part names, right = the same
    names with one key-derived char deleted (ed exactly 1). The Spark
    side never forms a cross join — segment-substring equi-join keys,
    id-only candidate dedup, then levenshtein verify; the DuckDB oracle
    is the NAIVE quadratic join, so a hash match proves the blocking is
    COMPLETE, not just fast."""
    part = load_table(spark, sf_dir, "part")
    left = part.select(
        F.col("p_partkey").alias("lid"), F.col("p_name").alias("ltext")
    )
    pos = (F.col("p_partkey") % (F.length("p_name") - 2) + 2).cast("int")
    right = part.select(
        (F.col("p_partkey") + 1000000).alias("rid"),
        F.concat(
            F.substring("p_name", F.lit(1), pos - 1),
            F.substring("p_name", pos + 1, F.length("p_name")),
        ).alias("rtext"),
    )
    return fuzzy_join(left, right, "lid", "ltext", "rid", "rtext", max_dist=2)


@query("q_rag_chunks", sql_sliding_chunks(chunk_tokens=32, overlap=8))
def q_rag_chunks(spark, sf_dir):
    """RAG-ingest overlapping chunking (operators/packing.
    sliding_chunks): 32-token windows, 8-token overlap, stride 24 —
    zero-shuffle zero-UDF scan-side posexplode; chunk text travels as a
    sha256 digest + token count, hash-matched against the DuckDB
    list-slice oracle down to every chunk boundary."""
    docs = load_table(spark, sf_dir, "documents")
    return sliding_chunks(docs, chunk_tokens=32, overlap=8)


from ..operators.kmeans import kmeans_summary  # noqa: E402
from ..operators.similarity import (  # noqa: E402
    knn_label_accuracy,
    sql_knn_label_accuracy,
)


@query("q_knn_accuracy", sql_knn_label_accuracy(k=5, holdout_mod=10))
def q_knn_accuracy(spark, sf_dir):
    """Leave-slice-out k-NN label classification over embeddings
    (operators/similarity.knn_label_accuracy) — the embedding-quality
    health check as ONE driver-hashed row (n_queries, n_correct,
    accuracy). Broadcast query slice, streamed index side, per-query
    top-5 window, majority vote with deterministic tie-breaks —
    hash-matched against the DuckDB quadratic oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_label_accuracy(emb, k=5, holdout_mod=10)


@query("q_kmeans_clusters")  # iterative Lloyd → not SQL-expressible; rows-only
def q_kmeans_clusters(spark, sf_dir):
    """Full-data distributed Lloyd k-means (operators/kmeans.
    lloyd_kmeans): centroid literals inlined per iteration (assignment
    is shuffle-free codegen), ONE shuffle per update, O(k·dim) driver
    state, constant plan depth across iterations. Deterministic:
    seed-stable hash init + exact-decimal means; convergence vs a numpy
    reference pinned in tests/test_kmeans_knn.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_summary(emb, k=8, max_iter=8)


from ..operators.importance import dsir_weights, sql_dsir_weights  # noqa: E402
from ..operators.profile import (  # noqa: E402
    profile_columns,
    sql_profile_columns,
)

_DSIR_TARGETS = ("src0", "src1", "src2")
_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


@query("q_dsir_weights", sql_dsir_weights(_DSIR_TARGETS))
def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (operators/importance.dsir_weights):
    log-likelihood ratio of 256-bucket hashed token features, target
    domain = src0-2. Engine-portable md5-nibble bucketing + exact-decimal
    per-doc sums make the full weight vector hash-match the SQL oracle;
    two slim-key shuffles, 256-row broadcast feedback edge."""
    docs = load_table(spark, sf_dir, "documents")
    return dsir_weights(docs, _DSIR_TARGETS)


@query(
    "q_column_profile",
    sql_profile_columns("orders", _PROFILE_COLS),
)
def q_column_profile(spark, sf_dir):
    """One-pass column profiler (operators/profile.profile_columns):
    per-column null counts + exact distinct cardinalities over orders in
    a single EXPAND-planned scan, unpivoted via stack. The
    approx_count_distinct swap-in for 100 TB is documented in the
    operator; exact distincts keep this hash-checkable."""
    orders = load_table(spark, sf_dir, "orders")
    return profile_columns(orders, _PROFILE_COLS)


# ---------------------------------------------------------------------------
# Round 4: prefix-filtered exact set-similarity join
# ---------------------------------------------------------------------------

from ..operators.setjoin import prefix_jaccard_join  # noqa: E402

_PREFIX_JACCARD_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {T.sql_shingles("string_split(text, ' ')", 3)} AS sh
  FROM documents WHERE doc_id < 300
), p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.sh, b.sh)) AS inter,
         len(a.sh) AS na, len(b.sh) AS nb
  FROM docs a JOIN docs b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       ROUND(CAST(inter AS DOUBLE) / (na + nb - inter), 4) AS jaccard
FROM p
WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5
"""


@query("q_prefix_jaccard_join", _PREFIX_JACCARD_ORACLE)
def q_prefix_jaccard_join(spark, sf_dir):
    """Exact Jaccard≥0.5 pairs via PPJoin-style prefix filtering
    (operators/setjoin.py): each doc's shingles sort rarest-first by
    global document frequency and only the first s−⌈θs⌉+1 enter the
    candidate join — hot shingles never join, so paired work is the
    rare-shingle tail instead of O(Σ df²). The oracle is the QUADRATIC
    all-pairs comparison, so a green hash is a machine-checked proof
    that prefix filtering loses no qualifying pair."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return prefix_jaccard_join(docs, "doc_id", "text", shingle_n=3, threshold=0.5)


from ..operators.setjoin import containment_join  # noqa: E402

_CONTAINMENT_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {T.sql_shingles("string_split(text, ' ')", 3)} AS sh
  FROM documents WHERE doc_id < 300
), p AS (
  SELECT a.doc_id AS inner_doc, b.doc_id AS outer_doc,
         len(list_intersect(a.sh, b.sh)) AS inter, len(a.sh) AS na
  FROM docs a JOIN docs b ON a.doc_id <> b.doc_id
  WHERE len(a.sh) > 0
)
SELECT inner_doc, outer_doc,
       ROUND(CAST(inter AS DOUBLE) / na, 4) AS containment
FROM p WHERE CAST(inter AS DOUBLE) / na >= 0.7
"""


@query("q_containment_join", _CONTAINMENT_ORACLE)
def q_containment_join(spark, sf_dir):
    """Exact asymmetric containment pairs (|A∩B|/|A| ≥ 0.7) — the
    quote/subset detector Jaccard can't see: a doc fully embedded in one
    100× its size has Jaccard ≈ 0.01 but containment 1.0. Prefix filter
    on the probe side only (the contained doc's rarest shingles must hit
    the container's posting list — operators/setjoin.containment_join);
    hash vs the QUADRATIC ordered-pairs oracle is the completeness
    proof, same contract as q_prefix_jaccard_join."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return containment_join(docs, "doc_id", "text", shingle_n=3, threshold=0.7)


from ..operators.tfidf import (  # noqa: E402
    sparse_cosine_pairs,
    sql_sparse_cosine_pairs,
)


@query(
    "q_sparse_cosine",
    sql_sparse_cosine_pairs(threshold=0.3, max_df=50, where="doc_id < 300"),
)
def q_sparse_cosine(spark, sf_dir):
    """TF-IDF-weighted sparse cosine pairs (≥ 0.3) through the inverted
    index — the lexical twin of q_embedding_neardup: only docs sharing
    a term are paired, terms with df > 50 drop BEFORE the pair join
    (they cost O(df²) and carry ~zero IDF weight — the same economics
    as the prefix filter), and every shuffled row is a slim
    (doc, term, weight) triple, never text
    (operators/tfidf.sparse_cosine_pairs)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return sparse_cosine_pairs(docs, threshold=0.3, max_df=50)


@query(
    "q_weighted_median",
    """
    WITH c AS (
      SELECT source, n_chars,
             SUM(n_chars) OVER (
               PARTITION BY source ORDER BY n_chars, doc_id
               ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(n_chars) OVER (PARTITION BY source) AS total
      FROM documents
    )
    SELECT source,
           CAST(MIN(n_chars) AS BIGINT) AS wmedian_chars,
           CAST(ANY_VALUE(total) AS BIGINT) AS total_chars
    FROM c WHERE cum * 2 >= total GROUP BY source
    """,
)
def q_weighted_median(spark, sf_dir):
    """Character-weighted median document length per source — 'the
    median BYTE lives in a doc this long', the corpus-report statistic
    that exposes whale-doc domination where the plain median doc length
    hides it (half the corpus mass can sit in 1% of docs). Integer-
    exact: a per-source cumulative sum crosses total/2 (kept as
    cum·2 ≥ total so no division), min value over crossing rows is the
    crossing point since the sort is ascending. One source shuffle,
    two windows over the same partitioning."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("n_chars", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("source")
    return (
        docs.select(
            "source",
            "n_chars",
            F.sum("n_chars").over(w).alias("cum"),
            F.sum("n_chars").over(wt).alias("total"),
        )
        .filter(F.col("cum") * 2 >= F.col("total"))
        .groupBy("source")
        .agg(
            F.min("n_chars").cast("long").alias("wmedian_chars"),
            F.first("total").cast("long").alias("total_chars"),
        )
    )


from ..operators.basket import basket_lift, sql_basket_lift  # noqa: E402


@query(
    "q_basket_lift",
    sql_basket_lift("lineitem", "l_orderkey", "l_partkey", 3),
)
def q_basket_lift(spark, sf_dir):
    """Market-basket pair lift over order line items: which parts ship
    together more often than independence predicts (lift = n_ab·N /
    (n_a·n_b), support ≥ 3). The only quadratic step is the
    within-order self-join — co-partitioned on the order key, fan-out
    bounded by basket size; support filters BEFORE the item-count
    joins; integer-exact arithmetic end-to-end
    (operators/basket.basket_lift)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return basket_lift(lineitem, "l_orderkey", "l_partkey", min_support=3)


# ---------------------------------------------------------------------------
# Round 4: skew audit, sketch quantile rollup, fixed-N stratified sample
# ---------------------------------------------------------------------------

from ..operators.profile import (  # noqa: E402
    approx_quantiles_rollup,
    heavy_hitters,
    sql_heavy_hitters,
)
from ..operators.sampling import (  # noqa: E402
    sql_stratified_fixed_n,
    sql_weighted_sample_fixed_k,
    stratified_fixed_n,
    weighted_sample_fixed_k,
)


@query(
    "q_weighted_sample",
    sql_weighted_sample_fixed_k("documents", "doc_id", "n_chars", 50),
)
def q_weighted_sample(spark, sf_dir):
    """Exactly-50 weight-proportional sample without replacement
    (deterministic A-ES exponential race, weight = document length):
    the curation sampler when 'pick k docs, long ones proportionally
    more often' must be reproducible across engines, retries, and
    re-runs — rand() is none of those. Zero pre-selection shuffles, and
    the top-k plans TakeOrderedAndProject (per-task k-row heaps), never
    a global sort (operators/sampling.weighted_sample_fixed_k)."""
    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample_fixed_k(docs, "doc_id", "n_chars", k=50)


@query(
    "q_heavy_hitters",
    sql_heavy_hitters("lineitem", "l_suppkey", 20),
)
def q_heavy_hitters(spark, sf_dir):
    """Exact top-20 join keys by frequency with row share — the pre-join
    skew audit run before choosing salting/broadcast strategy. One
    partial-aggregated groupBy then TakeOrderedAndProject (per-task
    k-row heaps, no global sort); total rides as a 1-row broadcast
    (operators/profile.heavy_hitters)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return heavy_hitters(lineitem, "l_suppkey", k=20)


@query("q_approx_quantiles")  # sketch-based → rows-only by design
def q_approx_quantiles(spark, sf_dir):
    """Mergeable approximate quantiles (p50/p90/p99 of extended price)
    per return flag PLUS the all-rows rollup in ONE shuffle of sketch
    summaries — percentile_approx sketches merge in partial aggregation,
    so the grand total needs no rescan. The 100 TB replacement for exact
    percentiles (a full sort); rank-error ≤ 1e-4 pinned vs exact in
    pytest (operators/profile.approx_quantiles_rollup)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return approx_quantiles_rollup(
        lineitem, "l_returnflag", "l_extendedprice"
    ).orderBy("grp")


@query(
    "q_stratified_fixed_n",
    sql_stratified_fixed_n(
        "customer",
        "c_mktsegment",
        "c_custkey",
        40,
        "c_custkey, c_mktsegment",
        seed=17,
    ),
)
def q_stratified_fixed_n(spark, sf_dir):
    """EXACTLY 40 customers per market segment, selected by seeded
    engine-portable hash order (Knuth multiplicative) with id tie-break
    — the fixed-budget eval-split primitive rate-based sampling can't
    provide (binomial counts). Hash-checked against the identical
    DuckDB window; per-stratum TOP-N window, salted two-phase variant
    documented for few-huge-strata skew
    (operators/sampling.stratified_fixed_n)."""
    customer = load_table(spark, sf_dir, "customer")
    return stratified_fixed_n(customer, "c_mktsegment", "c_custkey", 40, seed=17).select(
        "c_custkey", "c_mktsegment"
    )


@query("q_canonical_docs")  # LSH pairs + iterative CC → rows-only
def q_canonical_docs(spark, sf_dir):
    """Quality survivorship: near-dup clusters (MinHash-LSH pairs →
    connected components) keep their HIGHEST-quality member instead of
    the lowest id — the curation rule that drops boilerplate-damaged
    variants of duplicated content. Slim (id, quality) join to the
    labels, one argmax window per cluster
    (operators/dedup.survivorship_by_quality); hand-built clusters with
    known winners pinned in tests/test_setjoin_profile.py."""
    from ..operators.dedup import survivorship_by_quality

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "quality", T.quality_score(F.col("text"))
    )
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4, min_est_jaccard=0.5
    )
    return (
        survivorship_by_quality(docs, pairs, "doc_id", "quality")
        .select("doc_id", "n_members", F.round("quality", 4).alias("quality"))
    )


def _timed_funnel_oracle():
    from ..operators.funnel import sql_funnel_census

    return sql_funnel_census(_FUNNEL_STAGES, max_gap="INTERVAL 1 DAY")


@query("q_timed_funnel", _timed_funnel_oracle())
def q_timed_funnel(spark, sf_dir):
    """Time-bound funnel conversion: each stage must land within 1 day
    of the previous stage's earliest completion or the user churns there
    — the growth report's actual question ("purchased within a day of
    the click", not "eventually"). Same stage-wise aggregate plan as
    q_funnel (one conditional-min + join per stage, all on user_id, no
    per-user event arrays); the window is one more scan-side predicate."""
    from ..operators.funnel import funnel_census

    events = load_table(spark, sf_dir, "events")
    return funnel_census(events, _FUNNEL_STAGES, max_gap="INTERVAL 1 DAY")


@query("q_minhash_calibration")  # xxhash64-based estimator → rows-only
def q_minhash_calibration(spark, sf_dir):
    """MinHash estimator calibration: on every LSH-surfaced pair,
    |est_jaccard − exact_jaccard| summarized as one
    (n_pairs, mae, max_abs_err, mean_exact, mean_est) row — the check
    that k=16 hashes actually delivers its √(J(1−J)/k)≈0.12 error
    budget on THIS corpus before anyone trusts the 0.5 threshold.
    Exact Jaccard computed only on candidate pairs, never all pairs
    (operators/dedup.minhash_estimate_error); error ceiling pinned in
    tests/test_setjoin_profile.py."""
    from ..operators.dedup import minhash_estimate_error

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return minhash_estimate_error(docs, "doc_id", "text")


_BUDGET_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, source, n_chars, {T.sql_quality_score("text")} AS quality
  FROM documents
), c AS (
  SELECT doc_id, source, n_chars,
         CAST(SUM(n_chars) OVER (
           PARTITION BY source ORDER BY quality DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum_tokens
  FROM scored
)
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS tokens, cum_tokens
FROM c
WHERE cum_tokens <= CASE source WHEN 'src0' THEN 6000 ELSE 4000 END
"""


@query("q_token_budget_fill", _BUDGET_ORACLE)
def q_token_budget_fill(spark, sf_dir):
    """Exact per-domain token-budget fill, best-first: each source's
    documents accumulate in (quality DESC, id) order until the running
    char total would cross the domain budget (6000 for src0, 4000
    elsewhere) — the deterministic "best N tokens per domain" mixture
    step rate-based sampling only hits in expectation. One domain
    shuffle + a running-sum window on the same partitioning; budgets are
    a literal CASE, never a join (operators/sampling.token_budget_fill)."""
    from ..operators.sampling import token_budget_fill

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "quality", T.quality_score(F.col("text"))
    )
    return token_budget_fill(
        docs, "source", "n_chars", "quality", "doc_id",
        budgets={"src0": 6000}, default_budget=4000,
    )


@query("q_leakage_safe_split")  # CC-based → rows-only
def q_leakage_safe_split(spark, sf_dir):
    """Near-dup-aware train/val/test split census: documents labeled by
    a hash of their near-dup CLUSTER (LSH pairs → CC), so a train doc
    that near-duplicates an eval doc is structurally impossible — the
    decontamination failure mode group-split-by-doc-id cannot prevent.
    One row per split (split, n_docs, n_clusters) plus the global
    cross_split_pairs column, which the plan computes distributed (pair
    ⋈ labels both sides) and MUST be 0
    (operators/dedup.leakage_safe_split)."""
    from ..operators.dedup import leakage_safe_split

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4, min_est_jaccard=0.5
    ).localCheckpoint(eager=True)  # feeds CC and the leakage check once
    labeled = leakage_safe_split(
        docs, pairs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3
    )
    la = labeled.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa"))
    lb = labeled.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb"))
    cross = (
        pairs.join(la, "id_a")
        .join(lb, "id_b")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("sa") != F.col("sb"), 1).otherwise(0)),
                F.lit(0),
            ).cast("long").alias("cross_split_pairs")
        )
    )
    return (
        labeled.groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("component").cast("long").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(cross))
        .orderBy("split")
    )
