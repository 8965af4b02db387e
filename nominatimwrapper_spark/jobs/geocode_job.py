# -*- coding: utf-8 -*-
"""Production entry point: geocode + tile a partitioned pages table,
resumable per crawl-date partition (north_rule job shape).

    spark-submit --py-files nominatimwrapper_spark.zip \\
        nominatimwrapper_spark/jobs/geocode_job.py \\
        --pages /data/pages --gazetteer /data/gazetteer.parquet \\
        --out /data/geocoded [--date-from 2025-03-01] [--date-to ...]

Each crawl_date partition runs independently through the S7
PartitionedCheckpointer: output lands as ``out/part=<date>/data`` +
``_manifest.json`` (row counts, input fingerprint, wall time, engine
version). A rerun skips completed partitions whose input fingerprint is
unchanged — a killed job resumes with zero recomputation (the manifest
write is atomic). The master comes from spark-submit (get_spark defers
when ``SPARK_MASTER``/submit config is present).

Reference parity: this is the batch lifecycle of SURVEY.md §3.4 — the
wrapper's process_addresses loop (utils.py:1195-1279) lifted to one
checkpointed unit of work per Iceberg-style partition.
"""

from __future__ import annotations

import argparse
import hashlib
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..functions import s2
from ..operators.geocode import build_gazetteer_index, cascade
from ..operators.pages import pages_to_addresses
from ..sources.checkpoint import PartitionedCheckpointer
from ..sources.pages_io import read_pages


def list_crawl_dates(pages_path: str) -> list[str]:
    """crawl_date partition values from the table layout. Local-FS listing;
    on a cluster the same names come from the catalog / FileSystem API."""
    return sorted(
        d[len("crawl_date="):]
        for d in os.listdir(pages_path)
        if d.startswith("crawl_date=")
    )


def partition_fingerprint(pages_path: str, part: str) -> str:
    """Cheap input fingerprint: hash of (name, size) of every data file in
    the partition dir — a changed/extended input invalidates just that
    partition's checkpoint."""
    pdir = os.path.join(pages_path, f"crawl_date={part}")
    h = hashlib.sha256()
    for f in sorted(os.listdir(pdir)):
        fp = os.path.join(pdir, f)
        h.update(f.encode())
        h.update(str(os.path.getsize(fp)).encode())
    return h.hexdigest()[:16]


def geocode_partition(
    spark: SparkSession, pages_path: str, part: str, index
) -> "F.DataFrame":
    """One partition end-to-end: read (partition-pruned) -> extract ->
    cascade -> S2 level-13 cells."""
    pages = read_pages(spark, pages_path, date_from=part, date_to=part)
    addrs = pages_to_addresses(pages)
    res, _ = cascade(
        addrs, index, with_rejected=False, with_extra_house_number=False
    )
    return res.withColumn(
        "cell13", s2.s2_cell_udf(13)(F.col("lat"), F.col("lon"))
    ).select(
        "addr_key", "url", "method",
        F.col("place_id").cast("long").alias("place_id"),
        F.col("place_rank").cast("long").alias("place_rank"),
        "cell13",
        F.round(F.col("lat") * 1_000_000).cast("long").alias("lat_1e6"),
        F.round(F.col("lon") * 1_000_000).cast("long").alias("lon_1e6"),
    )


def run_job(
    spark: SparkSession,
    pages_path: str,
    gazetteer_path: str,
    out_dir: str,
    date_from: str | None = None,
    date_to: str | None = None,
) -> dict:
    """Run (or resume) the job; returns {partition: manifest}."""
    index = build_gazetteer_index(spark.read.parquet(gazetteer_path))
    parts = [
        p for p in list_crawl_dates(pages_path)
        if (date_from is None or p >= date_from)
        and (date_to is None or p <= date_to)
    ]
    ck = PartitionedCheckpointer(out_dir)
    return ck.run(
        parts,
        compute=lambda p: geocode_partition(spark, pages_path, p, index),
        input_fingerprint=lambda p: partition_fingerprint(pages_path, p),
        stats=lambda df: {
            "methods": {
                r["method"]: r["n"]
                for r in df.groupBy("method").agg(F.count("*").alias("n")).collect()
            }
        },
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", required=True)
    ap.add_argument("--gazetteer", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--date-from", default=None)
    ap.add_argument("--date-to", default=None)
    args = ap.parse_args()

    from ..session import get_spark

    spark = get_spark(master=None)  # defer to spark-submit
    manifests = run_job(
        spark, args.pages, args.gazetteer, args.out, args.date_from, args.date_to
    )
    done = sum(1 for m in manifests.values() if not m.get("resumed"))
    skipped = len(manifests) - done
    rows = sum(m.get("rows_out", 0) for m in manifests.values())
    print(f"partitions computed={done} resumed={skipped} rows_out={rows}")
    spark.stop()


if __name__ == "__main__":
    main()
