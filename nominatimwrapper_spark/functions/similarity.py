# -*- coding: utf-8 -*-
"""Vectorized (Arrow-batched) similarity UDFs over the textnorm kernels.

These are the only Python crossings in the geocode check path, and they
run AFTER the candidate join + dedup, i.e. on the small candidate set,
not on the full page corpus. Per-batch pair dedup + the kernels' lru_cache
keep the O(n*m) Damerau-Levenshtein DP off repeated pairs — at web scale
candidate streets repeat heavily (hot cities), so the cache hit rate is
high by construction.

- ``street_sim_best`` reproduces the reference's guarded multi-field loop
  (check_result_utils.py:513-519): compare candidate street_name, then
  "other", then namedetails — stopping as soon as the threshold is met —
  and report which field matched.
- ``house_number_sim`` / ``postcode_sim`` / ``city_sim`` wrap the scalar
  kernels (check_result_utils.py:56-141, 428-459).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from .textnorm import (
    city_compare_one,
    house_number_compare_one,
    postcode_compare_one,
    street_compare_one,
)

SIMILARITY_THRESHOLD = 0.5  # reference config.py:100


def _memo_pairs(a: pd.Series, b: pd.Series, fn) -> pd.Series:
    """Apply fn over pairs with batch-level memoization."""
    cache: dict[tuple, float] = {}
    out = []
    for x, y in zip(a.tolist(), b.tolist()):
        k = (x, y)
        v = cache.get(k)
        if v is None:
            v = fn(x, y)
            cache[k] = v
        out.append(v)
    return pd.Series(out, dtype=float)


@pandas_udf(DoubleType())
def house_number_sim(a: pd.Series, b: pd.Series) -> pd.Series:
    return _memo_pairs(a, b, house_number_compare_one)


@pandas_udf(DoubleType())
def postcode_sim(a: pd.Series, b: pd.Series) -> pd.Series:
    return _memo_pairs(a, b, postcode_compare_one)


@pandas_udf(DoubleType())
def city_sim(a: pd.Series, b: pd.Series) -> pd.Series:
    return _memo_pairs(a, b, city_compare_one)


@pandas_udf(DoubleType())
def street_sim(a: pd.Series, b: pd.Series) -> pd.Series:
    return _memo_pairs(a, b, street_compare_one)


_STREET_BEST_SCHEMA = StructType(
    [
        StructField("sim_street", DoubleType()),
        StructField("sim_street_which", StringType()),
    ]
)


@pandas_udf(_STREET_BEST_SCHEMA)
def _street_sim_best3(
    a1: pd.Series, a2: pd.Series, a3: pd.Series, b: pd.Series
) -> pd.DataFrame:
    """Guarded 3-field street compare (reference check_result_utils.py:508-519).

    Field k is only scored while the running score is below the threshold;
    `which` records the LAST field compared — exactly the reference's
    .where(~x, ...) update order. Field names follow the reference's
    street_fields_a for the OSM check (check_result_utils.py:688-691).
    """
    names = ["street_name", "other", "namedetails"]
    cache: dict[tuple, float] = {}

    def cs(x, y) -> float:
        k = (x, y)
        v = cache.get(k)
        if v is None:
            v = street_compare_one(x, y)
            cache[k] = v
        return v

    sims, whichs = [], []
    for x1, x2, x3, y in zip(a1.tolist(), a2.tolist(), a3.tolist(), b.tolist()):
        sim, which = -1.0, ""
        for name, x in zip(names, (x1, x2, x3)):
            if sim < SIMILARITY_THRESHOLD:
                sim = cs("" if x is None else x, y)
                which = name
        sims.append(sim)
        whichs.append(which)
    return pd.DataFrame({"sim_street": sims, "sim_street_which": whichs})


def street_sim_best(a1: Column, a2: Column, a3: Column, b: Column) -> Column:
    """struct<sim_street double, sim_street_which string> column."""
    return _street_sim_best3(a1, a2, a3, F.coalesce(b, F.lit("")))


def elimination_rule(sim_post_code: Column, sim_city: Column, sim_street: Column) -> Column:
    """Reject predicate (check_result_utils.py:532):
    (sim_post_code < 0.1 AND sim_city < 0.5) OR sim_street < 0.5."""
    return ((sim_post_code < 0.1) & (sim_city < F.lit(SIMILARITY_THRESHOLD))) | (
        sim_street < F.lit(SIMILARITY_THRESHOLD)
    )
