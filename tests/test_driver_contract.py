# -*- coding: utf-8 -*-
"""Rehearsal of the driver's correctness gate: every ``queries()`` entry
with an ``oracle_sql()`` twin must match DuckDB on row count + sorted
values at sf0.01. Rows-only entries must run and return a stable schema."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


ORACLED = sorted(entrymod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entrymod.queries().keys()) - set(ORACLED))


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_match(spark, duck, name):
    q = entrymod.queries()[name]
    spark_df = q(spark, SF_DIR).toPandas()
    duck_df = duck.execute(entrymod.oracle_sql()[name]).df()

    assert len(spark_df) == len(duck_df), f"{name}: row count {len(spark_df)} vs {len(duck_df)}"
    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: columns {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}"
    )
    cols = sorted(spark_df.columns)
    a = spark_df[cols].sort_values(cols).reset_index(drop=True)
    b = duck_df[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        # The driver hashes raw fetched values, so a DuckDB HUGEINT/DECIMAL
        # that pandas fetches as float/object diverges from Spark's int64 even
        # when every value is numerically equal. Require the same dtype KIND
        # on both sides (int vs int, string vs string) — no cross-kind
        # coercion that would mask it — then widen same-kind ints to int64.
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        assert ka == kb, f"{name}.{c}: dtype kind {a[c].dtype} vs {b[c].dtype} (driver hash would diverge)"
        if ka in "iu":
            a[c] = a[c].astype("int64")
            b[c] = b[c].astype("int64")
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    q = entrymod.queries()[name]
    df = q(spark, SF_DIR)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "cell13" in df.columns and "method" in df.columns
