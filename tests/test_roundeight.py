"""Round-8 additions: the exact-plan hot-key guard on
cooccurrence_pairs, bitmask multi-source BFS chunking (>62 seeds), and
the conditional REAL-decoder proof for the multimodal injection seam.
"""

from __future__ import annotations

import io
import random

import pytest

SF1 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# cooccurrence_pairs hot-key guard (VERDICT r7 item #3)
# ---------------------------------------------------------------------------


def _hot_edges(spark, hot_degree: int):
    """One hot key with ``hot_degree`` items plus a few cold keys."""
    rows = [("hot", f"i{j}") for j in range(hot_degree)]
    # cold keys share an item set disjoint from the hot key's, so the
    # expected row count is C(hot, 2) + C(3, 2) exactly
    rows += [(f"k{k}", f"c{j}") for k in range(5) for j in range(3)]
    return spark.createDataFrame(rows, "k string, i string")


def test_cooccurrence_guard_warns_past_threshold(spark):
    from legislative_bills_database_spark.operators.basket import (
        cooccurrence_pairs,
    )

    edges = _hot_edges(spark, hot_degree=50)
    with pytest.warns(UserWarning, match="degree_capped_edges"):
        df = cooccurrence_pairs(edges, "k", "i", max_degree=10)
    # warn, don't refuse: the plan must still run (the skew bench runs
    # the exact plans past the threshold on purpose)
    assert df.count() == 50 * 49 // 2 + 3


def test_cooccurrence_guard_strict_raises(spark):
    from legislative_bills_database_spark.operators.basket import (
        cooccurrence_pairs,
    )

    edges = _hot_edges(spark, hot_degree=50)
    with pytest.raises(ValueError, match="q_graph_jaccard_approx"):
        cooccurrence_pairs(edges, "k", "i", max_degree=10, strict=True)


def test_cooccurrence_guard_silent_under_threshold(spark, recwarn):
    from legislative_bills_database_spark.operators.basket import (
        cooccurrence_pairs,
    )

    edges = _hot_edges(spark, hot_degree=8)
    n = cooccurrence_pairs(edges, "k", "i", max_degree=10).count()
    assert n == 8 * 7 // 2 + 3
    assert not [w for w in recwarn if issubclass(w.category, UserWarning)]


def test_exact_graph_queries_run_unchanged_on_fixtures(spark):
    """The driver/bench fixtures sit under the default threshold — the
    guarded exact plans run warning-free."""
    import warnings

    from legislative_bills_database_spark.plans import QUERIES

    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        assert QUERIES["q_graph_jaccard"](spark, SF1).count() > 0


# ---------------------------------------------------------------------------
# bitmask multi-source BFS: >62-seed chunking
# ---------------------------------------------------------------------------


def test_multi_source_bfs_chunks_past_62_seeds(spark):
    """70 seeds forces two mask passes; the union must equal per-seed
    BFS exactly (the chunking is invisible in the result)."""
    from legislative_bills_database_spark.operators.graph import (
        bfs_hops,
        multi_source_bfs,
    )

    rng = random.Random(8)
    edges = [
        (f"n{rng.randrange(80)}", f"n{rng.randrange(80)}") for _ in range(200)
    ]
    edf = spark.createDataFrame(edges, "src string, dst string")
    seed_names = [f"n{i}" for i in range(70)]
    seeds = spark.createDataFrame([(s,) for s in seed_names], "seed string")
    got = sorted(
        (r.seed, r.node, r.dist)
        for r in multi_source_bfs(edf, seeds, max_hops=4).collect()
    )
    want = []
    for s in seed_names:
        one = spark.createDataFrame([(s,)], "node string")
        for r in bfs_hops(edf, one, max_hops=4).collect():
            want.append((s, r.node, r.dist))
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# multimodal seam vs a REAL decoder (VERDICT r7 item #7): exercises the
# injection seam with PIL when the environment provides it, skips
# cleanly where it doesn't (this container).
# ---------------------------------------------------------------------------

def test_injection_seam_with_real_pil_decoder(spark):
    pytest.importorskip("PIL", reason="PIL not installed in this container")
    from PIL import Image

    from legislative_bills_database_spark.sources.multimodal import (
        FEATURE_DIM,
        image_features,
        resize_images,
    )

    def make_png(w, h, color):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), color).save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        (1, make_png(13, 7, (255, 0, 0)), "image/png"),
        (2, make_png(4, 9, (0, 128, 255)), "image/png"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, mime string"
    )

    def real_extractor(payload: bytes) -> list[float]:
        img = Image.open(io.BytesIO(payload))
        w, h = img.size
        px = img.convert("RGB").getpixel((0, 0))
        feats = [float(w), float(h), *(float(c) for c in px)]
        return (feats + [0.0] * FEATURE_DIM)[:FEATURE_DIM]

    got = {
        r.doc_id: r.features
        for r in image_features(df, extractor=real_extractor).collect()
    }
    assert got[1][:5] == [13.0, 7.0, 255.0, 0.0, 0.0]
    assert got[2][:5] == [4.0, 9.0, 0.0, 128.0, 255.0]

    def real_resizer(payload: bytes, w: int, h: int) -> bytes:
        img = Image.open(io.BytesIO(payload)).resize((w, h))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    out = resize_images(
        df.select("doc_id", "payload"), 5, 6, resizer=real_resizer
    ).collect()
    for r in out:
        img = Image.open(io.BytesIO(bytes(r.payload)))
        assert img.size == (5, 6)
        assert (r.width, r.height) == (5, 6)
