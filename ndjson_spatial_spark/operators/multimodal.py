"""Multimodal (image/audio/video) column plumbing.

Media travels as opaque `binary` columns + typed metadata structs; decode /
feature-extract / resize / frame-sample run as Arrow-batched mapInPandas
stages.  The image/audio codecs are NOT in this sandbox (no PIL/ffmpeg), so
the decode kernel is STUBBED behind ``set_decoder`` — a deterministic fake
decoder ships for tests so the Spark-side plumbing (schema, batch shape,
partitioning) is fully exercised and real codecs drop in without touching
the plan.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["MEDIA_META_TYPE", "set_decoder", "fake_decoder", "decode_features",
           "sample_frames"]

MEDIA_META_TYPE = T.StructType([
    T.StructField("media_type", T.StringType()),   # image|audio|video
    T.StructField("format", T.StringType()),       # jpeg|png|wav|mp4|...
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
])

FEATURE_DIM = 16

_decoder: Callable[[bytes, dict], np.ndarray] | None = None


def set_decoder(fn: Callable[[bytes, dict], np.ndarray] | None) -> None:
    """Install the real decode kernel: (payload_bytes, meta_dict) ->
    float32 feature vector of FEATURE_DIM.  None -> decoding raises."""
    global _decoder
    _decoder = fn


def fake_decoder(payload: bytes, meta: dict) -> np.ndarray:
    """Deterministic stand-in: features = normalized digest bytes.  Lets
    tests assert end-to-end plumbing without codecs (clearly NOT a real
    decoder)."""
    d = hashlib.sha256(payload or b"").digest()[:FEATURE_DIM]
    return np.frombuffer(d, np.uint8).astype(np.float32) / 255.0


def decode_features(
    df: DataFrame, payload_col: str = "payload", meta_col: str = "meta",
    id_col: str = "media_id",
) -> DataFrame:
    """media rows -> (id, features: array<float>) via Arrow-batched
    mapInPandas.  Raises NotImplementedError per-batch if no decoder is
    installed (STUB boundary, by design)."""
    schema = T.StructType([
        T.StructField(id_col, T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if _decoder is None:
            raise NotImplementedError(
                "no media decoder installed in this environment; "
                "call set_decoder(...) with a real codec kernel"
            )
        for pdf in batches:
            feats = [
                [float(v) for v in _decoder(
                    bytes(p) if p is not None else b"",
                    m.to_dict() if hasattr(m, "to_dict") else dict(m or {}),
                )]
                for p, m in zip(pdf[payload_col], pdf[meta_col])
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, payload_col, meta_col).mapInPandas(run, schema)


def sample_frames(
    df: DataFrame, every_ms: int, meta_col: str = "meta", id_col: str = "media_id",
) -> DataFrame:
    """Video rows -> one row per sampled frame timestamp (pure Catalyst:
    sequence + explode over duration metadata; actual frame extraction is
    the decoder's job downstream)."""
    dur = F.col(f"{meta_col}.duration_ms")
    return (
        df.where(F.col(f"{meta_col}.media_type") == "video")
        .withColumn(
            "frame_ms",
            F.explode(F.sequence(F.lit(0), F.greatest(dur - 1, F.lit(0)),
                                 F.lit(every_ms))),
        )
        .select(id_col, "frame_ms")
    )
