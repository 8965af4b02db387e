#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Per-phase flagship timing at one core count (diagnosis companion to
scaling.py): extraction+input-checkpoint vs cascade vs s2+sink, plus
executor-CPU-vs-wall so a non-scaling phase is attributable to CPU
saturation vs serialization. Usage: phase_profile.py [cpus] [replicate]."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from nominatimwrapper_spark.session import get_spark

    extra = {}
    if os.environ.get("SPARK_RDD_NOCOMPRESS"):
        # A/B hook: disable the engine-default lz4 block compression
        extra["spark.rdd.compress"] = "false"
    spark = get_spark(master=f"local[{cpus}]", app_name=f"phase-{cpus}",
                      shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "128")),
                      extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from nominatimwrapper_spark.functions import s2
    from nominatimwrapper_spark.operators.geocode import cascade
    from nominatimwrapper_spark.operators.pages import pages_to_addresses
    from nominatimwrapper_spark.plans.flagship import flagship, gazetteer_index, pages_from_documents

    flagship(spark, sf, replicate=1).write.format("noop").mode("overwrite").save()  # warm
    index = gazetteer_index(spark)

    t0 = time.time()
    addrs = pages_to_addresses(
        pages_from_documents(spark, sf, replicate=replicate), dedup_crawls=False
    )
    addrs = addrs.localCheckpoint(eager=True)
    t1 = time.time()
    res, _ = cascade(addrs, index, with_rejected=False, validate_unique=False,
                     with_extra_house_number=False)
    # row count comes from the checkpointed input (1 address/page in this
    # synth world) — counting `res` would execute the fan-back a second time
    n = addrs.count()
    t2 = time.time()
    res.withColumn("cell13", s2.s2_cell_udf(13)(F.col("lat"), F.col("lon"))).select(
        "addr_key", "cell13"
    ).write.format("noop").mode("overwrite").save()
    t3 = time.time()
    print(json.dumps({
        "cpus": cpus, "pages": n,
        "extract_ckpt_s": round(t1 - t0, 2),
        "cascade_s": round(t2 - t1, 2),
        "s2_sink_s": round(t3 - t2, 2),
        "loadavg_end": round(os.getloadavg()[0], 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
