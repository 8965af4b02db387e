#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Extraction-only throughput at one core count: pages build + frozen
text extraction -> noop sink, no cascade. Separates the Arrow/UDF
byte-moving phase from the geocode phase when attributing scaling
ceilings (html crosses the JVM<->Python boundary twice per page here).
Usage: extract_profile.py [cpus] [replicate] [sf_dir]."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 1600
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from nominatimwrapper_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]",
        app_name=f"extract-{cpus}",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "128")),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from nominatimwrapper_spark.plans.flagship import pages_from_documents

    # warm-up (JVM/codegen/python workers) outside the timed window
    pages_from_documents(spark, sf, replicate=1).write.format("noop").mode(
        "overwrite"
    ).save()

    load_before = os.getloadavg()[0]
    pages = pages_from_documents(spark, sf, replicate=replicate)
    n = pages.count()
    t0 = time.time()
    pages.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "workload": "pages_build_extract_only",
                "cpus": cpus,
                "pages": n,
                "wall_sec": round(wall, 2),
                "pages_per_sec": round(n / wall, 1),
                "loadavg_before": round(load_before, 2),
                "loadavg_end": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
