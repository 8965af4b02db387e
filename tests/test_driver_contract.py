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


def test_bench_script_end_to_end_smoke():
    """bench.py (the driver's per-round artifact producer) runs end to
    end at minimal scale and prints exactly one valid JSON line with
    every expected leg present and positive."""
    import json
    import os
    import subprocess
    import sys

    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_FLAGSHIP_REPLICATE="2",
        SPARK_GRAFT_DEDUP_FACTOR="2",
        SPARK_GRAFT_LIFECYCLE_REPLICATE="1",
        SPARK_GRAFT_SHUFFLE_PARTITIONS="8",
        SPARK_DRIVER_MEMORY="4g",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    assert d["metric"] == "headline_total_runtime" and d["value"] > 0
    for leg in (
        "geocode_flagship", "geocode_flagship_nobc", "minhash_lsh_1m",
        "ivf_topk_400k", "checkpoint_resume_8parts",
        "streaming_flagship_8batches",
    ):
        assert d["queries"][leg] > 0, leg
