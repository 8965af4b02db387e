# -*- coding: utf-8 -*-
"""Bucketed tables: co-located joins without a shuffle (SURVEY.md §4).

At 100 TB the biggest recurring join cost is re-shuffling a fact table
onto its join key for every job. Writing the table BUCKETED on that key
(hash-partitioned into a fixed bucket count, sorted within buckets) moves
the shuffle to write time, once: every later equi-join between two tables
bucketed on their join keys with the same bucket count compiles to a
sort-merge join with NO Exchange on either side (asserted in
tests/test_plan_shape.py).

Use an explicit ``path`` to keep the data on the filesystem you own; the
table metadata lives in the session catalog (Iceberg/Hive on a real
cluster — the bucket spec survives either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Write ``df`` bucketed (and sorted) by ``key`` into ``table``."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
