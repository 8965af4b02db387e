# -*- coding: utf-8 -*-
"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (training-data pipeline ops).

Two decoder tiers:

- **REAL, stdlib-only**: RIFF/WAV audio (``wave`` module — sample rate,
  duration, PCM frames, and real DSP stats: RMS / zero-crossing rate) and
  binary netpbm images (P5/P6 — width/height and real per-pixel stats).
  These run end-to-end on genuine bytes.
- **STUB fake-codec** for formats whose decoders aren't in this container
  (JPEG/PNG/MP3/MP4 would need PIL/librosa/av): payloads carry a tiny
  self-describing header (``IMG:<w>x<h>:``, ``AUD:<hz>:<ms>:``,
  ``VID:<fps>:<nframes>:``). Clearly marked; swapping in a real library
  is a one-function change.

Everything around decode — schema, Arrow batch shape, mapInPandas iterator
plumbing, partition-preserving frame sampling, fixed-dim feature vectors —
is real and tested for both tiers.
"""

from __future__ import annotations

import io
import re
import struct
import wave
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

USE_REAL_CODECS = False  # flip when PIL/librosa/av are available (JPEG/PNG/MP4 tier)

_NETPBM_MAGIC = (b"P5", b"P6")


def _netpbm_header(payload: bytes) -> tuple[int, int, int, int, int] | None:
    """Parse a binary netpbm (P5 gray / P6 rgb) header with whitespace and
    ``#`` comments. Returns (width, height, channels, maxval, pixel_offset)."""
    if payload[:2] not in _NETPBM_MAGIC:
        return None
    channels = 1 if payload[:2] == b"P5" else 3
    pos, vals = 2, []
    while len(vals) < 3 and pos < len(payload):
        c = payload[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
        elif c.isdigit():
            end = pos
            while end < len(payload) and payload[end : end + 1].isdigit():
                end += 1
            vals.append(int(payload[pos:end]))
            pos = end
        else:
            return None
    if len(vals) < 3:
        return None
    # the spec requires EXACTLY one whitespace byte between maxval and the
    # raster; accept any single ws char (\n, \r, space, \t) but verify it —
    # a non-ws byte here means a malformed header, not an off-by-one raster
    if not payload[pos : pos + 1].isspace():
        return None
    return vals[0], vals[1], channels, vals[2], pos + 1


def _decode_wav(payload: bytes) -> tuple[int, int, int] | None:
    """(sample_rate, duration_ms, n_pcm_frames) via the stdlib wave reader.
    Untrusted crawl bytes: any malformation (including a sample_rate of 0,
    which wave.open does not validate) degrades to None, never a raised
    error out of a task."""
    try:
        with wave.open(io.BytesIO(payload)) as w:
            sr, nf = w.getframerate(), w.getnframes()
            if sr <= 0 or nf < 0:
                return None
            return sr, int(round(nf * 1000 / sr)), nf
    except (wave.Error, EOFError, struct.error, ValueError):
        return None


def _decode_one(media_type: str, payload: bytes) -> dict:
    """Decode one payload: REAL parsers for RIFF/WAV and binary netpbm
    (stdlib-only), deterministic fake-codec headers for the formats whose
    decoders aren't in this container (PIL/librosa/av tier)."""
    if USE_REAL_CODECS:  # pragma: no cover
        raise NotImplementedError("JPEG/PNG/MP4 codecs not present in this container")
    out = dict(width=None, height=None, sample_rate=None, duration_ms=None, n_frames=None)
    if payload is None:
        return out
    if media_type == "image":
        hdr = _netpbm_header(payload)
        if hdr:
            out["width"], out["height"] = hdr[0], hdr[1]
            return out
        m = _IMG_HDR.match(payload)  # fake-codec fallback (JPEG/PNG stand-in)
        if m:
            out["width"], out["height"] = int(m.group(1)), int(m.group(2))
    elif media_type == "audio":
        if payload[:4] == b"RIFF":
            wav = _decode_wav(payload)
            if wav:
                out["sample_rate"], out["duration_ms"], out["n_frames"] = wav
                return out
        m = _AUD_HDR.match(payload)  # fake-codec fallback (MP3 stand-in)
        if m:
            out["sample_rate"], out["duration_ms"] = int(m.group(1)), int(m.group(2))
    elif media_type == "video":
        m = _VID_HDR.match(payload)  # video stays fake-codec (no av lib)
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


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("rms", FloatType()),
        StructField("zero_crossing_rate", FloatType()),
    ]
)


def audio_stats(media: DataFrame) -> DataFrame:
    """REAL DSP over RIFF/WAV payloads (16-bit PCM via the stdlib wave
    reader + numpy): RMS amplitude (normalized to [0,1]) and zero-crossing
    rate. Non-WAV / undecodable payloads are skipped."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, srs, ns, rms, zcr = [], [], [], [], []
            for mid, t, p in zip(b["media_id"], b["media_type"], b["payload"]):
                if t != "audio" or p is None or p[:4] != b"RIFF":
                    continue
                try:
                    with wave.open(io.BytesIO(p)) as w:
                        if w.getsampwidth() != 2:
                            continue
                        sr, nch = w.getframerate(), w.getnchannels()
                        if sr <= 0 or nch <= 0:
                            continue
                        raw = w.readframes(w.getnframes())
                    # truncated payloads: drop the ragged tail frame so
                    # frombuffer/reshape never raise on untrusted bytes
                    frame_bytes = 2 * nch
                    raw = raw[: len(raw) // frame_bytes * frame_bytes]
                    pcm = np.frombuffer(raw, dtype="<i2")
                except (wave.Error, EOFError, struct.error, ValueError):
                    continue
                if len(pcm) == 0:
                    continue
                x = pcm.astype(np.float64) / 32768.0
                if nch > 1:  # interleaved channels -> per-frame mono mix
                    x = x.reshape(-1, nch).mean(axis=1)
                ids.append(mid)
                srs.append(sr)
                ns.append(len(x))
                rms.append(float(np.sqrt(np.mean(x * x))))
                zcr.append(float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))))
            yield pd.DataFrame(
                dict(media_id=ids, sample_rate=srs, n_samples=ns, rms=rms,
                     zero_crossing_rate=zcr)
            )

    return media.mapInPandas(_stats, AUDIO_STATS_SCHEMA)


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("mean_luma", FloatType()),
        StructField("std_luma", FloatType()),
    ]
)


def image_stats(media: DataFrame) -> DataFrame:
    """REAL pixel statistics over binary netpbm (P5/P6) payloads: mean and
    std of the (gray or RGB-averaged) pixel values. Non-netpbm payloads
    are skipped."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, ws, hs, cs, mu, sd = [], [], [], [], [], []
            for mid, t, p in zip(b["media_id"], b["media_type"], b["payload"]):
                if t != "image" or p is None:
                    continue
                hdr = _netpbm_header(p)
                if hdr is None:
                    continue
                w, h, ch, maxval, off = hdr
                # skip what we can't decode correctly instead of raising in
                # the task: 2-byte samples (maxval>255), truncated rasters,
                # degenerate dims — all possible in untrusted crawl bytes.
                # Exact length required: a \r\n after maxval (or trailing
                # junk) would otherwise shift the raster read one byte and
                # silently corrupt the stats
                if maxval > 255 or w <= 0 or h <= 0 or len(p) - off != w * h * ch:
                    continue
                px = np.frombuffer(p, dtype=np.uint8, count=w * h * ch, offset=off)
                if ch == 3:
                    px = px.reshape(-1, 3).mean(axis=1)
                px = px.astype(np.float64)
                ids.append(mid)
                ws.append(w)
                hs.append(h)
                cs.append(ch)
                mu.append(float(px.mean()))
                sd.append(float(px.std()))
            yield pd.DataFrame(
                dict(media_id=ids, width=ws, height=hs, channels=cs,
                     mean_luma=mu, std_luma=sd)
            )

    return media.mapInPandas(_stats, IMAGE_STATS_SCHEMA)


def make_wav(sample_rate: int, samples: "np.ndarray") -> bytes:
    """Serialize int16 samples to a real RIFF/WAV byte payload."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def make_ppm(width: int, height: int, pixels: "np.ndarray") -> bytes:
    """Serialize an (h, w, 3) uint8 array to a real binary P6 payload."""
    return f"P6\n{width} {height}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


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
    """Deterministic media table for tests/bench. Images and audio
    alternate between REAL payloads (binary P6 netpbm / RIFF WAV — the
    stdlib-decodable tier) and fake-codec payloads (the PIL/librosa-tier
    stand-ins); video is always fake-codec."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        real = (i // 3) % 2 == 0
        if kind == "image":
            w, h = int(rng.integers(16, 64)), int(rng.integers(16, 48))
            if real:
                px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
                payload = make_ppm(w, h, px)
            else:
                payload = f"IMG:{w}x{h}:".encode() + bytes(rng.integers(0, 256, size=64).tolist())
        elif kind == "audio":
            hz, ms = 16000, int(rng.integers(100, 1000))
            if real:
                t = np.arange(int(hz * ms / 1000))
                tone = (10000 * np.sin(2 * np.pi * 440 * t / hz)).astype("<i2")
                payload = make_wav(hz, tone)
            else:
                payload = f"AUD:{hz}:{ms}:".encode() + bytes(rng.integers(0, 256, size=64).tolist())
        else:
            fps, nf = 25, int(rng.integers(10, 100))
            payload = f"VID:{fps}:{nf}:".encode() + bytes(
                rng.integers(0, 256, size=64 * nf).tolist()
            )
        rows.append((i, f"media://{i}", kind, payload))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
