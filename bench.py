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

    # the big flagship (8M pages at sf0.1) holds several GB of checkpoint
    # blocks; the stock 8g heap GC-thrashes there (measured round 1)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "20g")

    from nominatimwrapper_spark.session import get_spark

    # SAME regime as scripts/scaling.py: 128 shuffle partitions (measurably
    # beats one-task-per-core here — amortizes per-task overhead and gives
    # AQE room), NOT cpus
    n_shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "128"))
    spark = get_spark(master=f"local[{cpus}]", app_name="nwspark-bench",
                      shuffle_partitions=n_shuffle)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    qs = dict(em.queries())
    # bench-scale flagship: fan documents into N pages each so throughput is
    # data-bound, not fixed-overhead-bound. Measured at two page counts
    # (default 2M and 8M at sf0.1) after a replicate=1 warm-up that pays
    # the JVM/codegen/python-worker spin-up outside the timed window.
    rep = int(os.environ.get("SPARK_GRAFT_FLAGSHIP_REPLICATE", "400"))
    rep_big = int(os.environ.get("SPARK_GRAFT_FLAGSHIP_REPLICATE_BIG", str(rep * 4)))
    from nominatimwrapper_spark.plans.flagship import flagship as _flagship

    qs["geocode_flagship"] = lambda sp, d: _flagship(sp, d, replicate=rep)
    qs["geocode_flagship_big"] = lambda sp, d: _flagship(sp, d, replicate=rep_big)

    def _flagship_nobc(sp, d):
        # the >800MB-gazetteer regime: shuffle-join cascade. The bench
        # gazetteer is physically small, so ALSO zero the auto-broadcast
        # threshold for this leg — otherwise AQE converts the sort-merge
        # joins right back and we would measure the broadcast plan twice.
        sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        return _flagship(sp, d, replicate=rep, force_no_broadcast=True)

    qs["geocode_flagship_nobc"] = _flagship_nobc
    _flagship(spark, sf_dir, replicate=1).write.format("noop").mode("overwrite").save()
    headline = [
        "geocode_flagship",     # the engine's real workload
        "geocode_flagship_big",  # same, 4x pages: the data-bound regime
        "geocode_flagship_nobc",  # same pages, forced shuffle-join cascade
        "top1_per_group",
        "broadcast_join_agg",
        "asof_latest",
        "grid_rollup",
        "s2_rollup",
        "h3_rollup",
        "knn_topk",
        "cosine_topk",
        "dedup_exact",
        "minhash_lsh",
        "token_stats",
        "simhash_near_dups",
    ]

    load_before = os.getloadavg()[0]
    timings: dict[str, float] = {}
    for name in headline:
        # steady-state timing: one untimed pass pays codegen compilation and
        # scan/setup (the flagship pair shares the replicate=1 warm-up above
        # — re-running 2M pages twice would double the bench for no signal)
        if not name.startswith("geocode_flagship"):
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        if name == "geocode_flagship_nobc":  # leg-scoped conf, restore
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    total = round(sum(timings.values()), 3)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    print(
        json.dumps(
            {
                "metric": "headline_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": int(cpus),
                "shuffle_partitions": n_shuffle,
                "flagship_pages": n_docs * rep,
                "flagship_pages_per_sec": round(n_docs * rep / timings["geocode_flagship"], 1),
                "flagship_nobc_pages_per_sec": round(
                    n_docs * rep / timings["geocode_flagship_nobc"], 1
                ),
                "flagship_big_pages": n_docs * rep_big,
                "flagship_big_pages_per_sec": round(
                    n_docs * rep_big / timings["geocode_flagship_big"], 1
                ),
                # the host is SHARED: compare against BENCH.md's idle-gated
                # numbers only when these are ~0 / ~own-worker-count
                "loadavg_before": round(load_before, 2),
                "loadavg_end": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
