"""SemDeDup: semantic deduplication over embeddings, bounded by clusters.

MinHash/SimHash (operators/dedup.py) catch *lexical* near-duplicates;
semantic duplicates — paraphrases, translations, re-renderings of the
same content — only show up in embedding space. The published recipe
(Abbas et al. 2023, "SemDeDup"): k-means-cluster the embeddings, then
within each cluster drop every vector whose cosine similarity to an
earlier-kept vector exceeds a threshold. Clustering is what makes it
tractable: the quadratic comparison is confined to single clusters, so
total work is Σ|cluster|² instead of N².

Scale shape, piece by piece:
- centroids come from the bounded driver-side fit shared with IVF
  (operators/ivf.ivf_centroids — trained on ≤10k sampled vectors
  regardless of corpus size, broadcast as a numpy constant);
- assignment is one Arrow-batched matmul pass (ivf_assignments), so the
  only shuffle is on centroid id;
- the within-cluster pair join carries (id, vector-norm) plus the vector
  once per side but never crosses clusters — with k ∝ N/target the
  per-cluster work stays constant as the corpus grows (the paper runs
  k=50k clusters for 5B embeddings);
- ``cluster_cap`` refuses degenerate clusterings (one giant cluster →
  quadratic blowup) instead of silently absorbing them, mirroring
  similarity.py's bucket_cap posture.

Drop rule (exactly the paper's): within a cluster, a vector is dropped
iff some LOWER-ID vector in the same cluster has cosine ≥ threshold —
one window-free anti-join, deterministic, order-independent. Note the
witness itself may also be dropped (chains collapse toward the lowest
id); connected-components dedup (dedup_by_near_duplicates) is the
stricter alternative when transitive grouping matters.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import dot, l2_norm
from .ivf import ivf_assignments


def semdedup_drops(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: np.ndarray,
    threshold: float = 0.9,
    cluster_cap: int = 20_000,
) -> DataFrame:
    """(id, cluster, witness) rows for every vector dropped by SemDeDup:
    ``witness`` is the smallest lower-id same-cluster vector with
    cosine ≥ ``threshold``. Keep-set = input ids minus these ids.
    """
    assign = ivf_assignments(df, id_col, vec_col, centroids, nprobe=1)

    sizes = assign.groupBy("centroid").agg(F.count("*").alias("__csize"))
    checked = assign.join(F.broadcast(sizes), "centroid").withColumn(
        "__guard",
        F.when(
            F.col("__csize") > cluster_cap,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"semdedup cluster exceeds cluster_cap={cluster_cap}"
                        " rows (degenerate clustering — raise k or the cap): "
                    ),
                    F.col("centroid").cast("string"),
                )
            ),
        ).otherwise(F.lit(1)),
    )

    side = df.select(
        F.col(id_col), F.col(vec_col), l2_norm(F.col(vec_col)).alias("__n")
    )
    a = checked.select(
        F.col(id_col).alias("__aid"), "centroid", "__guard"
    ).join(
        side.select(
            F.col(id_col).alias("__aid"),
            F.col(vec_col).alias("__av"),
            F.col("__n").alias("__an"),
        ),
        "__aid",
    )
    b = checked.select(F.col(id_col).alias("__bid"), "centroid").join(
        side.select(
            F.col(id_col).alias("__bid"),
            F.col(vec_col).alias("__bv"),
            F.col("__n").alias("__bn"),
        ),
        "__bid",
    )
    pairs = (
        a.join(b, "centroid")
        .filter(F.col("__bid") < F.col("__aid"))  # witness precedes in id order
        .withColumn(
            "__cos",
            dot(F.col("__av"), F.col("__bv")) / (F.col("__an") * F.col("__bn")),
        )
        .filter((F.col("__cos") >= threshold) & (F.col("__guard") == 1))
    )
    return pairs.groupBy(
        F.col("__aid").alias(id_col), F.col("centroid").alias("cluster")
    ).agg(F.min("__bid").alias("witness"))


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: np.ndarray,
    threshold: float = 0.9,
    cluster_cap: int = 20_000,
) -> DataFrame:
    """The SemDeDup keep-set: input rows minus :func:`semdedup_drops`,
    via a hash anti-join on the id (ids only travel — vectors stay put).
    """
    drops = semdedup_drops(
        df, id_col, vec_col, centroids, threshold, cluster_cap
    )
    return df.join(drops.select(id_col), id_col, "left_anti")
