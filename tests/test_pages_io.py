# -*- coding: utf-8 -*-
"""Partitioned pages layout: partition pruning must appear in the plan."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from nominatimwrapper_spark.sources.pages_io import read_pages, write_pages_partitioned
from nominatimwrapper_spark.synth import gen_world, write_world


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("pages_part")
    w = gen_world(n_streets=30, houses_per_street=4, n_pages=120, n_per_class=1)
    src = tmp_path_factory.mktemp("world_src")
    write_world(str(src), w)
    pages = spark.read.parquet(f"{src}/pages.parquet")
    out = str(d / "pages")
    write_pages_partitioned(pages, out)
    return out, w


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_roundtrip_and_date_filter(spark, pages_dir):
    path, w = pages_dir
    allp = read_pages(spark, path)
    assert allp.count() == len(w["pages"])
    # date window returns exactly the matching rows
    sub = read_pages(spark, path, date_from="2025-03-10", date_to="2025-03-12").toPandas()
    exp = w["pages"][
        (w["pages"].warc_ts.dt.date.astype(str) >= "2025-03-10")
        & (w["pages"].warc_ts.dt.date.astype(str) <= "2025-03-12")
    ]
    assert len(sub) == len(exp)


def test_partition_pruning_in_plan(spark, pages_dir):
    path, _ = pages_dir
    df = read_pages(spark, path, date_from="2025-03-10", date_to="2025-03-10").select("url")
    plan = _plan(df)
    # planner reports the partition filter and a pruned partition count
    assert "PartitionFilters" in plan and "crawl_date" in plan
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "crawl_date" in pf_line and "isnotnull" in pf_line.lower() or ">=" in pf_line
    # and the html/text columns are pruned from the scan entirely
    rs = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "html" not in rs and "text" not in rs
