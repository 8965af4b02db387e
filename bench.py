#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced through the noop sink (full materialization — count()
would let Catalyst prune UDF columns). The flagship is the engine's real
workload: documents -> pages -> frozen extraction -> cascade -> S2 tiling.

Scaling evidence (north_rule): run with SPARK_GRAFT_CPUS=8 and =32 on the
same input; BENCH.md records throughput at both + efficiency.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from nominatimwrapper_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="nwspark-bench",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    qs = dict(em.queries())
    # bench-scale flagship: fan documents into N pages each so throughput is
    # data-bound, not fixed-overhead-bound (100k+ addresses at sf0.1)
    rep = int(os.environ.get("SPARK_GRAFT_FLAGSHIP_REPLICATE", "100"))
    from nominatimwrapper_spark.plans.flagship import flagship as _flagship

    qs["geocode_flagship"] = lambda sp, d: _flagship(sp, d, replicate=rep)
    headline = [
        "geocode_flagship",     # the engine's real workload
        "top1_per_group",
        "broadcast_join_agg",
        "asof_latest",
        "grid_rollup",
        "s2_rollup",
        "knn_topk",
        "cosine_topk",
        "dedup_exact",
        "minhash_lsh",
        "token_stats",
        "simhash_near_dups",
    ]

    timings: dict[str, float] = {}
    for name in headline:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_pages = n_docs * rep
    print(
        json.dumps(
            {
                "metric": "headline_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": int(cpus),
                "flagship_pages": n_pages,
                "flagship_pages_per_sec": round(n_pages / timings["geocode_flagship"], 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
