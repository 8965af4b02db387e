# -*- coding: utf-8 -*-
"""Calibrate the kNN ring-expansion reach table for the H3 grid.

For each resolution 0..15 this measures, over the grid's distortion
extremes (every pentagon neighborhood and every icosahedron face-edge
seam) plus random controls:

- D_min[g], g = 1..MAX_RING: the minimum center-to-center great-circle
  distance (km) between a swept origin and any cell at grid distance
  exactly g. The advisor's counterexample to the round-3 bound is the
  hex zigzag: centers at graph distance g can be only ~(sqrt(3)/2)*g*s
  apart, and pentagon distortion shrinks local spacing further — so the
  finish bound must come from measured per-ring minima, not r * spacing.
- R_max: the maximum distance from any point to the center of its
  containing cell, measured two ways and maxed: (a) boundary circum-
  radius via cell_to_boundary over the swept cells, (b) direct sampled
  point-to-center offsets (uniform + pentagon-dense points).

A query that has searched grid_disk(r) can finish when its k-th
neighbor distance <= suffix_min(D_min)[r+1] - 2*R_max: any unsearched
target sits in a cell at graph distance >= r+1, whose center is
>= D_min km from the query cell's center, and both the query point and
the target can each be at most R_max off their cell centers.

Output: a Python literal for the _EMB_REACH table in functions/h3.py
(per res: [R_max, D_min[1], ..., D_min[MAX_RING]] in km; margins are
applied at LOAD time, not here, so the table stores raw measurements).

Run: python scripts/gen_h3_reach.py [res ...]   (default: all 0..15)
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from nominatimwrapper_spark.functions import h3 as H

MAX_RING = 16
EARTH_R = 6371.0088


def _hav_km(lat1, lon1, lat2, lon2):
    r1, r2 = np.radians(lat1), np.radians(lat2)
    dlat = np.radians(lat2 - lat1)
    dlon = np.radians(lon2 - lon1)
    h = np.sin(dlat / 2) ** 2 + np.cos(r1) * np.cos(r2) * np.sin(dlon / 2) ** 2
    return 2 * EARTH_R * np.arcsin(np.sqrt(np.clip(h, 0, 1)))


def _face_edge_midpoints():
    """The 30 icosahedron edge midpoints (seam centers), from the seeded
    face centers: adjacent faces are the pairs at the minimal angular
    separation; midpoint = normalized mean direction."""
    xyz = H._FACE_XYZ
    dots = xyz @ xyz.T
    np.fill_diagonal(dots, -2)
    thresh = dots.max() - 1e-6
    mids = []
    for a in range(20):
        for b in range(a + 1, 20):
            if dots[a, b] >= thresh:
                m = xyz[a] + xyz[b]
                m /= np.linalg.norm(m)
                mids.append(m)
    assert len(mids) == 30, len(mids)
    m = np.array(mids)
    lat = np.degrees(np.arcsin(np.clip(m[:, 2], -1, 1)))
    lng = np.degrees(np.arctan2(m[:, 1], m[:, 0]))
    return lat, lng


def _origins(res: int, rng) -> np.ndarray:
    """Sweep origins: pentagon disks-2 (distortion extremes), seam-center
    cells, and random controls."""
    pents = np.array(
        [
            H.h3_center_child(
                (1 << 59) | (bc << 45) | ((1 << 45) - 1), res
            )
            for bc in H.PENTAGON_BASE_CELLS
        ],
        dtype=np.uint64,
    )
    pent_region = set()
    for d in H.grid_disk(pents, 2):
        pent_region |= d
    slat, slng = _face_edge_midpoints()
    seam = H.latlng_to_cell(slat, slng, res)
    z = rng.uniform(-1, 1, 40)
    rlng = rng.uniform(-180, 180, 40)
    rand = H.latlng_to_cell(np.degrees(np.arcsin(z)), rlng, res)
    return np.array(
        sorted(pent_region | {int(c) for c in seam} | {int(c) for c in rand}),
        dtype=np.uint64,
    )


def calibrate(res: int) -> list[float]:
    rng = np.random.default_rng(4040 + res)
    t0 = time.time()
    origins = _origins(res, rng)
    rings = H.grid_rings(origins, MAX_RING)
    all_cells = np.array(
        sorted({c for per in rings for ring in per for c in ring}),
        dtype=np.uint64,
    )
    clat, clng = H.cell_to_latlng(all_cells)
    pos = {int(c): i for i, c in enumerate(all_cells)}

    d_min = [np.inf] * (MAX_RING + 1)  # index g
    for oi, per in enumerate(rings):
        o = int(origins[oi])
        io = pos[o]
        for g in range(1, len(per)):
            if not per[g]:
                continue
            idx = np.array([pos[c] for c in per[g]])
            d = _hav_km(clat[io], clng[io], clat[idx], clng[idx])
            d_min[g] = min(d_min[g], float(d.min()))

    # R_max (a): boundary circumradius over pentagon-region + seam +
    # random origins and their immediate neighbors (disk-1 of origins)
    bset = set()
    for d in H.grid_disk(origins, 1):
        bset |= d
    barr = np.array(sorted(bset), dtype=np.uint64)
    blat, blng = H.cell_to_latlng(barr)
    bounds = H.cell_to_boundary(barr)
    r_max = 0.0
    for i, b in enumerate(bounds):
        r_max = max(r_max, float(_hav_km(blat[i], blng[i], b[:, 0], b[:, 1]).max()))

    # R_max (b): direct point offsets — uniform + pentagon-dense samples
    z = rng.uniform(-1, 1, 30_000)
    plng = rng.uniform(-180, 180, 30_000)
    plat = np.degrees(np.arcsin(z))
    dlat, dlng = [plat], [plng]
    pla, pln = H.cell_to_latlng(
        np.array(
            [H.h3_center_child((1 << 59) | (bc << 45) | ((1 << 45) - 1), res)
             for bc in H.PENTAGON_BASE_CELLS],
            dtype=np.uint64,
        )
    )
    span = np.degrees(3.0 * 0.4 / H._SQRT7 ** res)
    for la, ln in zip(pla, pln):
        n = 2_000
        dlat.append(la + rng.uniform(-span, span, n))
        dlng.append(ln + rng.uniform(-span, span, n) / max(np.cos(np.radians(la)), 0.05))
    plat = np.clip(np.concatenate(dlat), -90, 90)
    plng = (np.concatenate(dlng) + 180) % 360 - 180
    cells = H.latlng_to_cell(plat, plng, res)
    cla, cln = H.cell_to_latlng(np.unique(cells))
    cpos = {int(c): i for i, c in enumerate(np.unique(cells))}
    ci = np.array([cpos[int(c)] for c in cells])
    off = _hav_km(plat, plng, cla[ci], cln[ci])
    r_max = max(r_max, float(off.max()))

    row = [r_max] + [d_min[g] for g in range(1, MAX_RING + 1)]
    print(
        f"# res {res}: {len(origins)} origins, {len(all_cells)} cells, "
        f"{time.time() - t0:.1f}s  R_max={r_max:.6g} D_min1={d_min[1]:.6g}",
        file=sys.stderr,
    )
    return row


def main():
    want = [int(a) for a in sys.argv[1:]] or list(range(16))
    print("_EMB_REACH = {")
    for res in want:
        row = calibrate(res)
        vals = ", ".join("float('inf')" if not np.isfinite(v) else f"{v:.9g}" for v in row)
        print(f"    {res}: [{vals}],")
        sys.stdout.flush()
    print("}")


if __name__ == "__main__":
    main()
