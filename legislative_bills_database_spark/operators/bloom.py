"""Bloom-filter semi-join pruning: shrink the probe side of a join
before it ever reaches the shuffle.

The classic distributed-join reduction (reference analog: the R scripts
join the full bill table against small filtered frames with merge(),
legiscan_main.R — at their scale a full-table merge is fine; at 100 TB
the probe side's shuffle IS the query cost): build a compact bitset over
the build side's join keys, broadcast it, and drop probe rows whose key
cannot possibly match *at the scan*, before any exchange.

Spark's own runtime bloom injection
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) does this
opportunistically under size thresholds; this operator is the explicit,
threshold-free form with a driver-visible false-positive budget, built
entirely from relational aggregation:

- **build**: each key row explodes to ``k`` (word, bit) pairs via
  seeded ``xxhash64``; ``groupBy(word).agg(bit_or)`` folds them into at
  most ``m/64`` longs. The aggregation is map-side-combined, so the
  shuffle carries ≤ ``m/64`` rows per partition regardless of build
  cardinality, and only the final ``m/64`` longs reach the driver —
  a 1 MiB bitset (m = 2^23) summarizes any number of build keys.
- **probe**: the bitset travels as a plan literal (array<long>); the
  membership test is pure JVM expression code (xxhash64 + shift + AND),
  whole-stage-codegen'd, evaluated at the scan — no Python, no join.

Guarantees: NO false negatives ever (the pruned join is exactly the
unpruned join — ``q_bloom_join``'s value-hash oracle is the machine
proof); false positives only waste work, bounded by the standard
``(1 - e^{-kn/m})^k`` and pinned empirically in tests/test_bloom.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_build(
    df: DataFrame, key: str, num_bits: int = 1 << 20, k: int = 3
) -> list[int]:
    """Aggregate ``df[key]`` into a Bloom bitset of ``num_bits`` bits
    (power of two) with ``k`` seeded hash functions.

    Fully distributed: the only driver-side state is the final
    ``num_bits / 64`` longs (128 KiB at the default m = 2^20).
    """
    if num_bits & (num_bits - 1):
        raise ValueError(f"num_bits must be a power of two, got {num_bits}")
    mask = num_bits - 1
    col = F.col(key)
    bits = F.array(
        *[F.xxhash64(col, F.lit(seed)).bitwiseAND(F.lit(mask)) for seed in range(k)]
    )
    one = F.lit(1).cast("long")
    words = (
        df.select(F.explode(bits).alias("bit"))
        .select(
            F.shiftright(F.col("bit"), 6).alias("word"),
            F.call_function(
                "shiftleft", one, F.col("bit").bitwiseAND(F.lit(63)).cast("int")
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    out = [0] * (num_bits >> 6)
    for r in words:
        out[r["word"]] = r["bits"]
    return out


def bloom_might_contain(
    key: Column, bitset: list[int], k: int = 3
) -> Column:
    """Membership-test Column: true iff all ``k`` hash bits of ``key``
    are set in ``bitset`` (so false ⇒ definitely absent).

    The bitset rides the plan as an ``array<long>`` literal — evaluated
    JVM-side inside whole-stage codegen, usable directly in
    ``df.filter`` at the scan so Parquet row groups are decoded once and
    discarded immediately.
    """
    num_bits = len(bitset) << 6
    mask = num_bits - 1
    arr = F.lit(bitset)
    one = F.lit(1).cast("long")
    test = F.lit(True)
    for seed in range(k):
        bit = F.xxhash64(key, F.lit(seed)).bitwiseAND(F.lit(mask))
        word = F.element_at(arr, (F.shiftright(bit, 6) + 1).cast("int"))
        probe = F.call_function(
            "shiftleft", one, bit.bitwiseAND(F.lit(63)).cast("int")
        )
        test = test & (word.bitwiseAND(probe) != 0)
    return test


def bloom_pruned_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    num_bits: int = 1 << 20,
    k: int = 3,
    how: str = "inner",
    broadcast_build: bool = True,
) -> DataFrame:
    """Join ``probe`` to ``build`` with a Bloom prefilter on the probe
    side: rows whose key cannot match never enter the exchange.

    Only match-requiring join types are accepted: ``inner`` and the
    semi family are safe. ``anti`` (and probe-preserving ``left``/
    ``full``) must KEEP the very rows the Bloom prefilter drops —
    cannot-match probe rows are exactly the anti-join output, and
    left/full must null-extend them — so pruning would silently change
    the result; they are rejected rather than quietly computed wrong.

    For the accepted types the result is EXACTLY
    ``probe.join(build, ...)`` — false positives are eliminated by the
    real join; false negatives cannot occur. At cluster scale this
    converts "shuffle 100 TB then drop 94%" into "drop 94% at the scan,
    shuffle 6 TB". ``broadcast_build`` adds the broadcast hint (right
    for the small-build case this operator targets); pass ``False`` for
    a build side big enough that Bloom pruning still pays but a
    broadcast would not fit executor memory.
    """
    allowed = {"inner", "semi", "leftsemi", "left_semi"}
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in allowed
    }:
        raise ValueError(
            f"bloom_pruned_join supports {sorted(allowed)} only: "
            f"probe-preserving joins (got {how!r}) must keep the very "
            "rows the Bloom prefilter drops"
        )
    bitset = bloom_build(build, build_key, num_bits=num_bits, k=k)
    pruned = probe.filter(bloom_might_contain(F.col(probe_key), bitset, k=k))
    build_side = F.broadcast(build) if broadcast_build else build
    return pruned.join(
        build_side, pruned[probe_key] == build[build_key], how
    )
