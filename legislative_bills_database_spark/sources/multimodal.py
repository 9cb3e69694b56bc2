"""Multimodal columns: opaque binary payloads + typed metadata.

Design (the 100 TB story): image/audio/video bytes travel as a
``binary`` column next to a metadata struct (mime, size, dims, ...).
Decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages — bytes never hit the driver, batches stay
columnar, and the decode UDF's schema is declared so Catalyst can prune
everything else around it.

The actual decoders (PIL / torchaudio / ffmpeg) are NOT in this
container, so :func:`decode_image` raises ``NotImplementedError`` and
tests/bench use :func:`fake_image_features`, a clearly-marked
deterministic stand-in with the identical Spark-side plumbing (schema,
batching, partitioning).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

FEATURE_DIM = 8

FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, features array<double>"
)


def decode_image(payload: bytes) -> "object":
    """Real image decode — requires an image library not present here.

    STUB: wire PIL/opencv here in a real deployment.
    """
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not available in this container; "
        "use fake_image_features for plumbing tests"
    )


def _fake_features(payload: bytes) -> list[float]:
    """DETERMINISTIC FAKE decode: derives FEATURE_DIM floats from a sha256
    of the payload. Stands in for a real embedding/feature extractor so the
    distributed plumbing (schema, batch shape, partitioning) is testable."""
    digest = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(digest[i * 4 : i * 4 + 4], "big") / 2**32
        for i in range(FEATURE_DIM)
    ]


def fake_image_features(payloads: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, payload binary, meta).

    One Arrow batch in → one batch out; at scale this parallelizes per
    input partition with zero shuffle.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "features": [_fake_features(bytes(p)) for p in pdf["payload"]],
                }
            )

    return payloads.mapInPandas(extract, FEATURE_SCHEMA)
