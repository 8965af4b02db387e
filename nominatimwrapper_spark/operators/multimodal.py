# -*- coding: utf-8 -*-
"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (training-data pipeline ops).

The container has no image/audio libraries, so the DECODE step is stubbed
(clearly marked) behind a deterministic fake-codec: payloads carry a tiny
self-describing header (``IMG:<w>x<h>:``, ``AUD:<hz>:<ms>:``,
``VID:<fps>:<nframes>:``) that the "decoder" parses. Everything around the
stub — schema, Arrow batch shape, mapInPandas iterator plumbing,
partition-preserving frame sampling, fixed-dim feature vectors — is real
and tested; swapping in PIL/librosa is a one-function change.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("url", StringType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("payload_bytes", IntegerType()),
    ]
)

_IMG_HDR = re.compile(rb"^IMG:(\d+)x(\d+):")
_AUD_HDR = re.compile(rb"^AUD:(\d+):(\d+):")
_VID_HDR = re.compile(rb"^VID:(\d+):(\d+):")

USE_REAL_CODECS = False  # flip when PIL/librosa/av are available


def _decode_one(media_type: str, payload: bytes) -> dict:
    """STUB decode — parses the deterministic fake-codec header.
    With USE_REAL_CODECS the same dict would come from PIL/librosa/av."""
    if USE_REAL_CODECS:  # pragma: no cover
        raise NotImplementedError("real image/audio codecs not present in this container")
    out = dict(width=None, height=None, sample_rate=None, duration_ms=None, n_frames=None)
    if payload is None:
        return out
    if media_type == "image":
        m = _IMG_HDR.match(payload)
        if m:
            out["width"], out["height"] = int(m.group(1)), int(m.group(2))
    elif media_type == "audio":
        m = _AUD_HDR.match(payload)
        if m:
            out["sample_rate"], out["duration_ms"] = int(m.group(1)), int(m.group(2))
    elif media_type == "video":
        m = _VID_HDR.match(payload)
        if m:
            out["sample_rate"], out["n_frames"] = int(m.group(1)), int(m.group(2))
    return out


def decode_media(media: DataFrame) -> DataFrame:
    """mapInPandas decode: binary payloads -> typed metadata rows.
    Iterator-of-batches keeps peak memory at one Arrow batch of payloads."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            metas = [_decode_one(t, p) for t, p in zip(b["media_type"], b["payload"])]
            m = pd.DataFrame(metas)
            yield pd.DataFrame(
                dict(
                    media_id=b["media_id"],
                    media_type=b["media_type"],
                    width=m["width"].astype("Int32"),
                    height=m["height"].astype("Int32"),
                    sample_rate=m["sample_rate"].astype("Int32"),
                    duration_ms=m["duration_ms"].astype("Int32"),
                    n_frames=m["n_frames"].astype("Int32"),
                    payload_bytes=b["payload"].map(lambda p: 0 if p is None else len(p)).astype("int32"),
                )
            )

    return media.mapInPandas(_decode, DECODED_SCHEMA)


def media_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Fixed-dim feature vector per payload (deterministic byte-histogram
    projection — the STUB for a real embedding model; the Arrow plumbing,
    schema and batch shape are the real thing)."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf(ArrayType(FloatType()))
    def _feat(payload: pd.Series) -> pd.Series:
        out = []
        for p in payload:
            if p is None:
                out.append([0.0] * dim)
                continue
            arr = np.frombuffer(p, dtype=np.uint8)
            hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
            norm = np.linalg.norm(hist)
            out.append((hist / norm if norm > 0 else hist).astype(np.float32).tolist())
        return pd.Series(out)

    return media.withColumn("features", _feat(F.col("payload")))


def sample_video_frames(media: DataFrame, every_k: int = 10) -> DataFrame:
    """Frame sampling for video payloads: emits one row per sampled frame
    (frame index + byte offset) — real byte-slicing logic over the fake
    codec's fixed 64-byte frames after the header."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, fidx, offs = [], [], []
            for mid, t, p in zip(b["media_id"], b["media_type"], b["payload"]):
                if t != "video" or p is None:
                    continue
                m = _VID_HDR.match(p)
                if not m:
                    continue
                hdr = m.end()
                n = int(m.group(2))
                for k in range(0, n, every_k):
                    ids.append(mid)
                    fidx.append(k)
                    offs.append(hdr + 64 * k)
            yield pd.DataFrame(dict(media_id=ids, frame_idx=fidx, byte_offset=offs))

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("byte_offset", IntegerType()),
        ]
    )
    return media.mapInPandas(_sample, schema)


def synth_media(spark, n: int = 200, seed: int = 46) -> DataFrame:
    """Deterministic fake media table for tests/bench."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w, h = int(rng.integers(16, 640)), int(rng.integers(16, 480))
            payload = f"IMG:{w}x{h}:".encode() + bytes(rng.integers(0, 256, size=64).tolist())
        elif kind == "audio":
            hz, ms = 16000, int(rng.integers(100, 5000))
            payload = f"AUD:{hz}:{ms}:".encode() + bytes(rng.integers(0, 256, size=64).tolist())
        else:
            fps, nf = 25, int(rng.integers(10, 100))
            payload = f"VID:{fps}:{nf}:".encode() + bytes(
                rng.integers(0, 256, size=64 * nf).tolist()
            )
        rows.append((i, f"media://{i}", kind, payload))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
