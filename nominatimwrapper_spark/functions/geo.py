# -*- coding: utf-8 -*-
"""Geo scalar kernels: haversine distance + simple lat/lon grid tiles.

The reference computes reject-to-match distances with geopy's geodesic
(utils.py:1066, 1091). geopy is absent here and a pure-Column haversine is
JVM-side + codegen-friendly, so the engine uses haversine everywhere
(engine AND oracle — consistent by construction, as SURVEY.md F14 notes).

Grid tiles are the SQL-expressible tiling used for oracle-checked rollups;
S2 / H3 cell ids live in s2.py / h3.py (not ANSI-SQL-expressible, checked
against pinned vectors instead).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius


def haversine_km(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """Scalar haversine (km) — test oracle twin of :func:`haversine_col`."""
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = p2 - p1
    dl = math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))


def haversine_col(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Haversine distance in km as a pure Column expression.

    Stays inside whole-stage codegen — no Python crossing. Used for
    reject-to-match distance (reference utils.py:1080-1093) and kNN
    re-ranking.
    """
    p1 = F.radians(lat1)
    p2 = F.radians(lat2)
    dp = F.radians(lat2 - lat1)
    dl = F.radians(lon2 - lon1)
    a = F.pow(F.sin(dp / 2), 2) + F.cos(p1) * F.cos(p2) * F.pow(F.sin(dl / 2), 2)
    return F.lit(2 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def grid_cell_col(lat: Column, lon: Column, cells_per_degree: int = 32) -> Column:
    """Integer grid cell id: interleaved-free (row-major) packing of the
    floored lat/lon grid. ANSI-SQL-expressible, so DuckDB can oracle-check
    rollups built on it. ~32 cells/degree ≈ 3.5 km at Belgian latitudes,
    comparable to S2 level 13 / H3 res 9 footprints for skew purposes.
    """
    iy = F.floor((lat + F.lit(90.0)) * F.lit(float(cells_per_degree))).cast("long")
    ix = F.floor((lon + F.lit(180.0)) * F.lit(float(cells_per_degree))).cast("long")
    return (iy * F.lit(360 * cells_per_degree) + ix).cast("long")


def grid_cell_parent_col(cell: Column, cells_per_degree: int = 32, factor: int = 8) -> Column:
    """Zoom-out: parent cell at ``cells_per_degree/factor`` resolution —
    pure integer math (the analog of S2/H3 parent bit-shifts)."""
    width = 360 * cells_per_degree
    iy = (cell / F.lit(width)).cast("long")
    ix = cell % F.lit(width)
    py = (iy / F.lit(factor)).cast("long")
    px = (ix / F.lit(factor)).cast("long")
    pw = width // factor
    return (py * F.lit(pw) + px).cast("long")


def grid_cell_scalar(lat: float, lon: float, cells_per_degree: int = 32) -> int:
    iy = math.floor((lat + 90.0) * cells_per_degree)
    ix = math.floor((lon + 180.0) * cells_per_degree)
    return iy * 360 * cells_per_degree + ix
