# -*- coding: utf-8 -*-
"""S2 cell ids from scratch (published S2 geometry math), vectorized numpy.

64-bit S2CellId layout: 3 face bits | 2*level Hilbert position bits | 1 |
zero padding. Leaf (level 30) ids are computed first; any level is a bit
truncation (``parent_cell``). The quadratic ST projection and the per-level
Hilbert state machine follow the published S2 reference semantics
(s2geometry's S2CellId::FromFaceIJ / ToFaceIJ and S2::UVtoST family).

Everything is vectorized over numpy arrays -> usable inside Arrow-batched
pandas UDFs (SURVEY.md F19). Level 13 is the engine's tiling resolution
(north_rule). Validation: exact roundtrip + hierarchy property tests, and
pinned golden vectors (tests/test_s2.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import LongType

MAX_LEVEL = 30
_POS_BITS = 2 * MAX_LEVEL + 1  # 61

# Hilbert curve tables (S2 public constants):
# kIJtoPos[orientation][(i_bit<<1)|j_bit] and kPosToOrientation[pos]
_IJ_TO_POS = np.array(
    [
        [0, 1, 3, 2],  # canonical
        [0, 3, 1, 2],  # axes swapped
        [2, 3, 1, 0],  # bits inverted
        [2, 1, 3, 0],  # swapped & inverted
    ],
    dtype=np.int64,
)
_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],
        [0, 2, 3, 1],
        [3, 2, 0, 1],
        [3, 1, 0, 2],
    ],
    dtype=np.int64,
)
_POS_TO_ORIENTATION = np.array([1, 0, 0, 3], dtype=np.int64)  # swap, 0, 0, swap|invert


def _st_to_uv(s: np.ndarray) -> np.ndarray:
    """Inverse quadratic transform (S2::STtoUV)."""
    return np.where(s >= 0.5, (1.0 / 3.0) * (4 * s * s - 1), (1.0 / 3.0) * (1 - 4 * (1 - s) * (1 - s)))


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic transform (S2::UVtoST)."""
    r = 0.5 * np.sqrt(1 + 3 * np.abs(u))  # both np.where branches evaluate
    return np.where(u >= 0, r, 1 - r)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2)).astype(np.int64)
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face)

    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve, de) in enumerate(
        [
            (lambda: y / x, lambda: z / x, None),      # face 0 (+x)
            (lambda: -x / y, lambda: z / y, None),     # face 1 (+y)
            (lambda: -x / z, lambda: -y / z, None),    # face 2 (+z)
            (lambda: z / x, lambda: y / x, None),      # face 3 (-x)
            (lambda: z / y, lambda: -x / y, None),     # face 4 (-y)
            (lambda: -y / z, lambda: -x / z, None),    # face 5 (-z)
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ue()[m]
                v[m] = ve()[m]
    return face, u, v


def _face_uv_to_xyz(face, u, v):
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    one = np.ones_like(u)
    comp = [
        (one, u, v),        # face 0: (1, u, v)
        (-u, one, v),       # face 1: (-u, 1, v)
        (-u, -v, one),      # face 2: (-u, -v, 1)
        (-one, -v, -u),     # face 3: (-1, -v, -u)
        (v, -one, -u),      # face 4: (v, -1, -u)
        (v, u, -one),       # face 5: (v, u, -1)
    ]
    for f, (xe, ye, ze) in enumerate(comp):
        m = face == f
        if m.any():
            x[m], y[m], z[m] = xe[m], ye[m], ze[m]
    return x, y, z


def lat_lon_to_leaf_id(lat_deg, lon_deg) -> np.ndarray:
    """Vectorized (lat, lon) degrees -> signed int64 leaf (level-30) cell id."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    coslat = np.cos(lat)
    x = coslat * np.cos(lon)
    y = coslat * np.sin(lon)
    z = np.sin(lat)

    face, u, v = _xyz_to_face_uv(x, y, z)
    s = _uv_to_st(u)
    t = _uv_to_st(v)
    max_size = 1 << MAX_LEVEL
    i = np.clip((s * max_size).astype(np.int64), 0, max_size - 1)
    j = np.clip((t * max_size).astype(np.int64), 0, max_size - 1)

    # per-level Hilbert walk (vectorized state machine)
    pos = np.zeros_like(i, dtype=np.uint64)
    orientation = (face & 1).astype(np.int64)  # kSwapMask bit of the face
    for k in range(MAX_LEVEL - 1, -1, -1):
        i_bit = (i >> k) & 1
        j_bit = (j >> k) & 1
        ij = (i_bit << 1) | j_bit
        p = _IJ_TO_POS[orientation, ij]
        pos = (pos << np.uint64(2)) | p.astype(np.uint64)
        orientation = orientation ^ _POS_TO_ORIENTATION[p]

    cell = (face.astype(np.uint64) << np.uint64(_POS_BITS)) | (pos << np.uint64(1)) | np.uint64(1)
    return cell.view(np.int64)


def parent_cell(cell_id, level: int):
    """Truncate a cell id to ``level`` (pure integer bit math — this is the
    zoom-out operator for tile rollups, SURVEY.md F21)."""
    cid = np.asarray(cell_id).view(np.uint64) if isinstance(cell_id, np.ndarray) else np.uint64(np.int64(cell_id))
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    out = (cid & ~(lsb - np.uint64(1)) & ~lsb) | lsb
    # (clear everything below AND at lsb position, then set lsb)
    if isinstance(out, np.ndarray):
        return out.view(np.int64)
    return np.int64(out)


def cell_to_lat_lon(cell_id) -> tuple[np.ndarray, np.ndarray]:
    """Inverse: cell id (any level) -> center (lat, lon) degrees. Used for
    roundtrip validation and kNN ring seeding."""
    cid = np.atleast_1d(np.asarray(cell_id, dtype=np.int64)).view(np.uint64)
    face = (cid >> np.uint64(_POS_BITS)).astype(np.int64)

    # level = 30 - (trailing-zero-count of id) / 2 ; lsb isolates it
    lsb = cid & (~cid + np.uint64(1))

    i = np.zeros(cid.shape, dtype=np.int64)
    j = np.zeros(cid.shape, dtype=np.int64)
    orientation = (face & 1).astype(np.int64)

    # Walk from the top: position bits occupy bits [1, 60]; level k's 2 bits
    # are at [2*(30-k)-1, 2*(30-k)]. We process all 30 levels; levels below
    # the cell's actual level contribute the marker/zero bits, so we mask
    # them out afterwards via the center offset.
    for k in range(MAX_LEVEL):
        shift = np.uint64(2 * (MAX_LEVEL - 1 - k) + 1)
        p = ((cid >> shift) & np.uint64(3)).astype(np.int64)
        ij = _POS_TO_IJ[orientation, p]
        i = (i << 1) | (ij >> 1)
        j = (j << 1) | (ij & 1)
        orientation = orientation ^ _POS_TO_ORIENTATION[p]

    # For non-leaf cells the bits at/below the marker are garbage; replace
    # (i, j) with the cell-center leaf coordinates: zero the low bits and
    # add half the cell size.
    n_levels_below = (np.round(np.log2(lsb.astype(np.float64))).astype(np.int64)) // 2
    size = np.int64(1) << n_levels_below
    i = (i & ~(size - 1)) | (size >> 1)
    j = (j & ~(size - 1)) | (size >> 1)
    # leaf cells: center is the st midpoint of the leaf
    s = (i.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    t = (j.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)

    u = _st_to_uv(s)
    v = _st_to_uv(t)
    x, y, z = _face_uv_to_xyz(face, u, v)
    lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    lon = np.degrees(np.arctan2(y, x))
    return lat, lon


def cell_level(cell_id) -> np.ndarray:
    cid = np.atleast_1d(np.asarray(cell_id, dtype=np.int64)).view(np.uint64)
    lsb = cid & (~cid + np.uint64(1))
    below = (np.round(np.log2(lsb.astype(np.float64))).astype(np.int64)) // 2
    return MAX_LEVEL - below


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def s2_cell_udf(level: int = 13):
    """pandas UDF factory: (lat, lon) -> level-L cell id (LongType)."""

    @pandas_udf(LongType())
    def _udf(lat: pd.Series, lon: pd.Series) -> pd.Series:
        leaf = lat_lon_to_leaf_id(lat.to_numpy(np.float64), lon.to_numpy(np.float64))
        return pd.Series(parent_cell(leaf, level))

    return _udf


def s2_parent_col(cell: Column, level: int) -> Column:
    """Parent cell id as a pure Column expression (integer bit math — stays
    in whole-stage codegen; no Python crossing for zoom-out rollups)."""
    lsb = 1 << (2 * (MAX_LEVEL - level))
    # (cell & ~(2*lsb - 1)) | lsb  — works on signed int64 in two's complement
    mask = ~(2 * lsb - 1)
    return (cell.bitwiseAND(F.lit(mask))).bitwiseOR(F.lit(lsb))
