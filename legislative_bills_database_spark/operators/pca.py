"""Hash-certified principal direction of an embedding corpus.

Classic PCA on a 100 TB embedding table factors into two pieces with
very different scales:

1. the d×d Gram (second-moment) matrix — a full pass over n rows, the
   only data-sized job; and
2. the eigen iteration on that d×d matrix — O(d²) state, trivially
   driver-sized for any realistic embedding width (d=64 here → 4 096
   entries; even d=4 096 is 16M entries).

The Gram pass is a ``mapInPandas`` partial aggregate: each Arrow batch
contributes one d×d integer outer-product partial via a vectorized
``einsum``, so the shuffle moving data between stages carries **d² rows
per partition**, never n·d² exploded pairs (the relational
explode+self-join form blows the row count up 4 096× before the
aggregate). This is the same partial-aggregate shape a Spark built-in
would codegen for a covariance matrix, just Arrow-batched because no
built-in exists for array-column outer products.

Cross-engine exactness (the q_pagerank_exact / q_markov_stationary
discipline): floating-point power iteration can never hash-match DuckDB
because parallel double sums drift in the last ulp. Instead every
quantity is integer end-to-end — embedding elements quantized to
milli-units (×1000, round-half-away-from-zero, matching both engines'
ROUND), the Gram partials exact int64 sums, and each power sweep an
integer matvec renormalized by floor-dividing against the max |component|
(sign handled explicitly so truncation semantics can't diverge). The
driver-side loop runs on arbitrary-precision Python ints and is mirrored
term-for-term by the oracle's chained HUGEINT CTEs.

Reference parity note: the reference (patrick95350/legislative-bills-
database) has no linear-algebra surface — this operator belongs to the
training-data-pipeline superset (embedding-corpus diagnostics: the
dominant direction is the input to anisotropy checks and whitening).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale of the iterated vector (ppm components)
SCALE = 1_000_000
#: embedding-element quantization (milli-units)
QUANT = 1000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    """ROUND() as Spark and DuckDB both define it for doubles: ties away
    from zero (numpy's ``round`` is banker's — wrong twin)."""
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def gram_matrix_fp(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """d×d integer Gram matrix of the quantized embedding column.

    Returns ``(i, j, s)`` with ``s = Σ_rows e_i·e_j`` over elements
    quantized to ``round(element*1000)`` — one row per matrix entry.
    """

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((dim, dim), dtype=np.int64)
        seen = False
        for pdf in batches:
            if pdf.empty:
                continue
            seen = True
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = _round_half_away(mat * QUANT).astype(np.int64)
            acc += np.einsum("ni,nj->ij", q, q)
        if seen:
            ii, jj = np.meshgrid(range(dim), range(dim), indexing="ij")
            yield pd.DataFrame(
                {"i": ii.ravel(), "j": jj.ravel(), "s": acc.ravel()}
            )

    partials = df.select(vec_col).mapInPandas(
        partial, schema="i int, j int, s long"
    )
    return partials.groupBy("i", "j").agg(F.sum("s").cast("long").alias("s"))


def _signed_floor_div(x: int, d: int) -> int:
    """Truncation-toward-zero division on exact ints — the explicit-sign
    form both engines can express identically (positive // positive)."""
    return -((-x) // d) if x < 0 else x // d


def power_iteration_fp(
    gram: list[tuple[int, int, int]], dim: int, rounds: int
) -> list[tuple[int, int]]:
    """Fixed-point power iteration on a collected integer Gram matrix.

    Arbitrary-precision Python ints (no overflow anywhere); each round
    renormalizes to ``SCALE`` by floor-dividing against max |component|.
    Returns ``[(dim_index, component_fp)]`` with components in
    [-SCALE, SCALE].
    """
    m = {(i, j): s for i, j, s in gram}
    v = [SCALE] * dim
    for _ in range(rounds):
        raw = [
            sum(m.get((i, j), 0) * v[j] for j in range(dim))
            for i in range(dim)
        ]
        peak = max(abs(r) for r in raw)
        peak = max(peak, 1)  # zero-matrix guard (KMV GREATEST precedent)
        v = [_signed_floor_div(r * SCALE, peak) for r in raw]
    return list(enumerate(v))
