# -*- coding: utf-8 -*-
"""Collapse utilities (differential vs reference), hex tiling, step stats."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from nominatimwrapper_spark.functions.cleansing import (
    collapse_fillna_col,
    collapse_set_col,
)
from nominatimwrapper_spark.functions.geo import (
    haversine_km,
    hex_cell_center,
    hex_cell_col,
    hex_cell_scalar,
)


def test_collapse_fillna_differential(spark, refmod):
    pdf = pd.DataFrame(
        dict(
            a=[None, "x", None, None],
            b=["b1", None, None, "b4"],
            c=["c1", "c2", None, None],
        )
    )
    ref = refmod.utils.collapse(pdf, ["a", "b", "c"], "fillna").where(pd.notnull, None).tolist()
    got = (
        spark.createDataFrame(pdf)
        .select(collapse_fillna_col(F.col("a"), F.col("b"), F.col("c")).alias("o"))
        .toPandas()
        .o.where(pd.notnull, None)
        .tolist()
    )
    assert got == ref


def test_collapse_set_values(spark, refmod):
    pdf = pd.DataFrame(dict(a=["x", "x", None], b=["y", "x", None], c=["x", "z", None]))
    ref = refmod.utils.collapse(pdf, ["a", "b", "c"], "set").tolist()
    got = (
        spark.createDataFrame(pdf)
        .select(collapse_set_col([F.col("a"), F.col("b"), F.col("c")]).alias("o"))
        .toPandas()
        .o.tolist()
    )
    # the reference joins a Python set (order unstable) -> compare value SETS
    for g, r in zip(got, ref):
        assert set(g.split(" - ")) - {""} == set(r.split(" - ")) - {""}


def test_hex_spark_matches_scalar(spark):
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        dict(lat=rng.uniform(49.5, 51.5, 300), lon=rng.uniform(2.5, 6.4, 300))
    )
    got = (
        spark.createDataFrame(pdf)
        .select(hex_cell_col(F.col("lat"), F.col("lon")).alias("cell"))
        .toPandas()
        .cell.tolist()
    )
    exp = [hex_cell_scalar(la, lo) for la, lo in zip(pdf.lat, pdf.lon)]
    assert got == exp


def test_hex_center_roundtrip_and_nearest():
    rng = np.random.default_rng(12)
    for la, lo in zip(rng.uniform(49.5, 51.5, 100), rng.uniform(2.5, 6.4, 100)):
        cell = hex_cell_scalar(la, lo)
        clat, clon = hex_cell_center(cell)
        # center re-encodes to the same cell
        assert hex_cell_scalar(clat, clon) == cell
        # point is closer to its own center than to any neighbor center
        d_own = (la - clat) ** 2 + (lo - clon) ** 2
        fq = cell // (1 << 21) - (1 << 20)
        fr = cell % (1 << 21) - (1 << 20)
        for dq, dr in [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)]:
            ncell = (fq + dq + (1 << 20)) * (1 << 21) + (fr + dr + (1 << 20))
            nlat, nlon = hex_cell_center(ncell)
            d_n = (la - nlat) ** 2 + (lo - nlon) ** 2
            assert d_own <= d_n * (1 + 1e-9)


def test_cascade_step_stats(spark, tmp_path_factory):
    from nominatimwrapper_spark.operators.geocode import build_gazetteer_index, cascade
    from nominatimwrapper_spark.synth import gen_world, write_world

    d = tmp_path_factory.mktemp("stats_world")
    write_world(str(d), gen_world(n_streets=40, houses_per_street=4, n_pages=5, n_per_class=2))
    index = build_gazetteer_index(spark.read.parquet(f"{d}/gazetteer.parquet"))
    addr = spark.read.parquet(f"{d}/addresses.parquet").selectExpr(
        "referenceKey as addr_key", "streetName as street", "houseNumber as housenbr",
        "postCode as postcode", "postName as city", "countryName as country"
    )
    res, rej, stats = cascade(addr, index, check_results=True, with_stats=True)
    assert stats and stats[0]["method"] == "orig"
    total_in = addr.count()
    assert stats[0]["todo"] == total_in
    # todo shrinks monotonically; matches sum to the result count
    todos = [s["todo"] for s in stats]
    assert todos == sorted(todos, reverse=True)
    assert sum(s["match"] for s in stats) == res.count()
    assert {"reject_rec", "reject_addr", "reject_mism"} <= set(stats[0].keys())
