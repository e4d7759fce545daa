"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches via
``mapInPandas``.

The decode step is STUBBED (no image/audio libs in this container):
``decode_image_stub`` produces a deterministic fake (dimensions derived
from a hash of the bytes) so the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — is real and tested. Swap
``_decode_impl`` for a real decoder (PIL/torchaudio) in production.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURES_SCHEMA = (
    "media_id long, kind string, width int, height int, n_frames int, "
    "duration_ms long, feature_hash string"
)


def _decode_impl(payload: bytes, kind: str) -> dict:
    """Deterministic fake decode. REPLACE with a real decoder in prod;
    raising NotImplementedError here would be the honest production stub,
    but tests need deterministic output shapes."""
    if payload is None:
        return {"width": None, "height": None, "n_frames": None, "duration_ms": None, "feature_hash": None}
    h = hashlib.sha256(payload).digest()
    return {
        "width": 64 + h[0] % 192 if kind in ("image", "video") else None,
        "height": 64 + h[1] % 192 if kind in ("image", "video") else None,
        "n_frames": 1 if kind == "image" else (1 + h[2] % 300),
        "duration_ms": None if kind == "image" else (1000 + int.from_bytes(h[3:5], "big")),
        "feature_hash": h.hex()[:16],
    }


def extract_media_features(df: DataFrame) -> DataFrame:
    """mapInPandas over binary payloads → typed feature rows.

    Batches arrive as Arrow record batches; output preserves partitioning
    (no shuffle). At scale: repartition by size class first if payloads
    are heavily skewed."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_impl(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            fdf = pd.DataFrame(feats)
            yield pd.concat(
                [pdf[["media_id", "kind"]].reset_index(drop=True), fdf], axis=1
            )

    return df.mapInPandas(op, schema=FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Plumbing for frame sampling: one row per sampled frame index,
    derived from (stubbed) n_frames — an explode, not a Python loop."""
    feats = extract_media_features(df).filter(F.col("kind") == "video")
    idx = F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
    return feats.select("media_id", F.explode(idx).alias("frame_idx"), "feature_hash")


def synthetic_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests."""
    import numpy as np

    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, size=32 + (i % 64), dtype=np.uint8))
        rows.append((i, kind, payload, f"{kind}/fake", {"src": f"synthetic_{i}"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
