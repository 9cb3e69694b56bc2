"""Exact set-similarity join via prefix filtering (PPJoin-style).

The scale path for EXACT Jaccard near-duplicate pairs. The plain
inverted-index join (``dedup.ngram_jaccard_pairs``) pairs documents
through EVERY shared shingle — a shingle appearing in df documents
contributes O(df²) candidate pairs, so stopword-heavy shingles dominate
the join at corpus scale. Prefix filtering (Chaudhuri et al., ICDE'06;
Xiao et al., WWW'08 — public literature, no reference analog) keeps
exactness while joining only on each document's RAREST few shingles:

sort every document's shingle set by a global total order (document
frequency ascending, shingle ascending — rarest first) and keep the
first ``p = s − ⌈θ·s⌉ + 1`` entries. Two sets with Jaccard ≥ θ MUST
share a prefix shingle: removing the prefix removes p elements, and a
set missing p elements of another retains at most s − p = ⌈θ·s⌉ − 1 <
θ·s ≤ θ·|A∪B| ≤ |A∩B| common elements — contradiction. So joining on
prefix shingles alone loses no qualifying pair (completeness), and the
frequency-ascending order puts hot shingles at the END of arrays where
they never enter the join. The candidate set shrinks from O(Σ df²) over
all shingles to the rare-shingle tail; a size-ratio filter
(min ≥ θ·max) prunes further before verification.

The driver-checked query (``q_prefix_jaccard_join``) hashes against the
QUADRATIC all-pairs DuckDB oracle — a machine-checked completeness
proof, same contract as q_fuzzy_join's blocking proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles, tokens


def _ordered_sets(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int
) -> DataFrame:
    """(doc, sh, n): each doc's distinct shingles sorted rarest-first by
    global document frequency (ties by shingle) — the total order every
    prefix-filter proof relies on. One shingle shuffle for frequencies,
    one doc shuffle to re-gather."""
    sets = df.select(
        F.col(id_col).alias("doc"),
        shingles(tokens(F.col(text_col)), shingle_n).alias("sh"),
    )
    e = sets.select("doc", F.explode("sh").alias("s"))
    dfreq = e.groupBy("s").agg(F.count("*").alias("df"))
    return (
        e.join(dfreq, "s")
        .groupBy("doc")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("df"), F.col("s").alias("s"))
                    )
                ),
                lambda x: x["s"],
            ).alias("sh"),
            F.count("*").alias("n"),
        )
    )


def prefix_jaccard_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact pairs with shingle-set Jaccard ≥ ``threshold``.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard rounded
    to 4 places. One pass builds shingle sets; document frequencies are
    joined back (shuffle on shingle) to order each set rarest-first; the
    candidate join touches only prefix shingles; verification
    re-intersects full sets JVM-side (array_intersect — no UDF).

    The prefix length uses integer arithmetic (threshold scaled to
    1e4ths) so ``⌈θ·s⌉`` never rounds through a float: an FP ceil that
    lands one high would SHORTEN the prefix and silently break the
    completeness guarantee.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    num = int(round(threshold * 10_000))

    ordered = _ordered_sets(df, id_col, text_col, shingle_n)
    # p = n − ⌈θ·n⌉ + 1, exact in integers: ⌈θ·n⌉ = (num·n + 9999) div 10000
    ceil_theta_n = F.floor((F.lit(num) * F.col("n") + 9_999) / 10_000)
    prefix = ordered.select(
        "doc",
        "n",
        F.slice("sh", 1, (F.col("n") - ceil_theta_n + 1).cast("int")).alias("pre"),
    ).select("doc", "n", F.explode("pre").alias("s"))

    a = prefix.select(
        F.col("doc").alias("doc_a"), F.col("n").alias("na"), "s"
    )
    b = prefix.select(
        F.col("doc").alias("doc_b"), F.col("n").alias("nb"), "s"
    )
    cands = (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        # size-ratio filter: J ≥ θ needs θ·max(|A|,|B|) ≤ min(|A|,|B|)
        .filter(
            F.least("na", "nb") * 10_000 >= F.lit(num) * F.greatest("na", "nb")
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    fa = ordered.select(
        F.col("doc").alias("doc_a"), F.col("sh").alias("sha"), F.col("n").alias("na")
    )
    fb = ordered.select(
        F.col("doc").alias("doc_b"), F.col("sh").alias("shb"), F.col("n").alias("nb")
    )
    inter = F.size(F.array_intersect("sha", "shb"))
    jac = inter.cast("double") / (F.col("na") + F.col("nb") - inter)
    return (
        cands.join(fa, "doc_a")
        .join(fb, "doc_b")
        .filter(jac >= F.lit(threshold))
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def containment_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact ASYMMETRIC containment pairs: |A∩B| / |A| ≥ ``threshold``.

    The quote/subset detector Jaccard can't express: a 50-shingle doc
    fully embedded in a 5000-shingle doc has Jaccard ≈ 0.01 but
    containment 1.0. Returns ordered (inner_doc, outer_doc, containment)
    with inner ≠ outer, containment rounded to 4.

    Prefix filter on the PROBE (inner) side only: A can miss at most
    |A| − ⌈t·|A|⌉ of its own elements from A∩B, so a rarest-first prefix
    of length p = |A| − ⌈t·|A|⌉ + 1 must hit B — joining A's prefix
    against B's FULL posting list loses no qualifying pair. The outer
    side cannot be prefix-trimmed (no upper bound relates |B| to |A|),
    so candidate volume is Σ_{s ∈ prefix(A)} df(s): probe-side hot
    shingles still never enter the join (they sort to the suffix), which
    is where the quadratic blowup lived. A size filter (|B| ≥ t·|A|,
    necessary since A∩B ⊆ B) prunes before verification; verification
    re-intersects full sets JVM-side. Same integer-exact ⌈t·s⌉ as
    :func:`prefix_jaccard_join`.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    num = int(round(threshold * 10_000))

    ordered = _ordered_sets(df, id_col, text_col, shingle_n).filter(
        F.col("n") > 0
    )
    ceil_theta_n = F.floor((F.lit(num) * F.col("n") + 9_999) / 10_000)
    probe = ordered.select(
        F.col("doc").alias("inner_doc"),
        F.col("n").alias("na"),
        F.explode(
            F.slice("sh", 1, (F.col("n") - ceil_theta_n + 1).cast("int"))
        ).alias("s"),
    )
    index = ordered.select(
        F.col("doc").alias("outer_doc"),
        F.col("n").alias("nb"),
        F.explode("sh").alias("s"),
    )
    cands = (
        probe.join(index, "s")
        .filter(F.col("inner_doc") != F.col("outer_doc"))
        # A∩B ⊆ B, so t·|A| ≤ |A∩B| needs |B| ≥ t·|A|
        .filter(F.col("nb") * 10_000 >= F.lit(num) * F.col("na"))
        .select("inner_doc", "outer_doc")
        .distinct()
    )
    fa = ordered.select(
        F.col("doc").alias("inner_doc"),
        F.col("sh").alias("sha"),
        F.col("n").alias("na"),
    )
    fb = ordered.select(
        F.col("doc").alias("outer_doc"), F.col("sh").alias("shb")
    )
    cont = (
        F.size(F.array_intersect("sha", "shb")).cast("double") / F.col("na")
    )
    return (
        cands.join(fa, "inner_doc")
        .join(fb, "outer_doc")
        .filter(cont >= F.lit(threshold))
        .select(
            "inner_doc", "outer_doc", F.round(cont, 4).alias("containment")
        )
    )
