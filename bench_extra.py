#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Extra benchmarks / phase isolation for the optimization round (guide
§1.4: noop-sink isolation per phase; bench.py itself is frozen for
measurement). Each phase is labeled via setJobDescription and timed
through the noop sink.

Usage: bench_extra.py [minhash|flagship|small] ...
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn):
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    fn()
    dt = round(time.time() - t0, 2)
    spark.sparkContext.setJobDescription(None)
    print(f"  {label}: {dt}s", flush=True)
    return dt


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    which = sys.argv[1] if len(sys.argv) > 1 else "minhash"
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "20g")

    from nominatimwrapper_spark.session import get_spark

    n_shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "128"))
    spark = get_spark(master=f"local[{cpus}]", app_name=f"nwspark-bench-extra-{which}",
                      shuffle_partitions=n_shuffle)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {"loadavg_before": round(os.getloadavg()[0], 2)}

    if which == "minhash":
        from nominatimwrapper_spark.operators.dedup import (
            banded_signatures,
            minhash_dedup,
            minhash_lsh_candidates,
            minhash_signatures_agg,
            minhash_verified_pairs,
        )
        from nominatimwrapper_spark.plans.flagship import documents_scaled

        factor = int(os.environ.get("SPARK_GRAFT_DEDUP_FACTOR", "200"))
        docs = documents_scaled(spark, sf_dir, factor).localCheckpoint(eager=True)
        n = docs.count()
        print(f"corpus: {n} docs", flush=True)
        # warm one small pass (codegen/python workers)
        noop(docs.limit(1000))
        out["sig_agg"] = timed(spark, "minhash: signatures agg",
                               lambda: noop(minhash_signatures_agg(docs)))
        out["banded"] = timed(spark, "minhash: banded signatures",
                              lambda: noop(banded_signatures(docs)))
        out["candidates"] = timed(spark, "minhash: lsh candidates",
                                  lambda: noop(minhash_lsh_candidates(docs)))
        out["verified"] = timed(spark, "minhash: verified pairs",
                                lambda: noop(minhash_verified_pairs(docs)))
        out["full_dedup"] = timed(spark, "minhash: full dedup (cc)",
                                  lambda: noop(minhash_dedup(docs)))

    elif which == "flagship":
        from pyspark.sql import functions as F

        from nominatimwrapper_spark.functions import geo
        from nominatimwrapper_spark.operators.geocode import cascade
        from nominatimwrapper_spark.operators.pages import pages_to_addresses
        from nominatimwrapper_spark.plans.flagship import (
            flagship,
            gazetteer_index,
            pages_from_documents,
        )

        rep = int(os.environ.get("SPARK_GRAFT_FLAGSHIP_REPLICATE", "400"))
        flagship(spark, sf_dir, replicate=1).write.format("noop").mode("overwrite").save()
        index = gazetteer_index(spark)

        # phase 1: pages build WITHOUT extraction (html only)
        pages = pages_from_documents(spark, sf_dir, replicate=rep)
        out["pages_html_only"] = timed(
            spark, "flagship: pages html only",
            lambda: noop(pages.select("url", "warc_ts", "html")),
        )
        # phase 2: pages + address extraction (fused html->addresses)
        addrs = pages_to_addresses(pages, dedup_crawls=False)
        out["pages_to_addresses"] = timed(
            spark, "flagship: pages->addresses", lambda: noop(addrs)
        )
        # phase 3: full cascade from checkpointed addrs
        spark.sparkContext.setJobDescription("flagship: checkpoint addrs")
        t0 = time.time()
        addrs_ck = addrs.localCheckpoint(eager=True)
        out["addrs_checkpoint_total"] = round(time.time() - t0, 2)
        print(f"  addrs checkpoint (incl extraction): {out['addrs_checkpoint_total']}s",
              flush=True)

        def run_cascade():
            res, _ = cascade(addrs_ck, index, with_rejected=False,
                             validate_unique=False, with_extra_house_number=False)
            noop(res)

        out["cascade_from_ck"] = timed(spark, "flagship: cascade", run_cascade)

        def run_cells():
            res, _ = cascade(addrs_ck, index, with_rejected=False,
                             validate_unique=False, with_extra_house_number=False)
            cells = geo.s2_h3_cells_udf(13, 9)(F.col("lat"), F.col("lon"))
            noop(res.withColumn("_c", cells).select("addr_key", "_c.s2", "_c.h3"))

        out["cascade_plus_cells"] = timed(spark, "flagship: cascade+cells", run_cells)
        out["full_flagship"] = timed(
            spark, "flagship: full", lambda: noop(flagship(spark, sf_dir, replicate=rep))
        )

    elif which == "small":
        import __spark_entry__ as em

        qs = dict(em.queries())
        names = sys.argv[2:] or [
            "top1_per_group", "broadcast_join_agg", "asof_latest", "grid_rollup",
            "s2_rollup", "h3_rollup", "knn_topk", "cosine_topk", "dedup_exact",
            "minhash_lsh", "token_stats", "simhash_near_dups",
        ]
        for name in names:
            noop(qs[name](spark, sf_dir))  # warm
            out[name] = timed(spark, f"small: {name}", lambda n=name: noop(qs[n](spark, sf_dir)))

    out["loadavg_end"] = round(os.getloadavg()[0], 2)
    print(json.dumps({"which": which, "cpus": int(cpus), **out}))
    spark.stop()


if __name__ == "__main__":
    main()
