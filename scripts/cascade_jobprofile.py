#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Job-level attribution of the flagship cascade (UI REST API): runs the
cascade from a checkpointed 2M-address frame and prints every Spark job's
duration + name, so the driver-action overhead is attributable."""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "20g")

    from nominatimwrapper_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name=f"cascade-prof-{cpus}",
                      shuffle_partitions=128,
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    from nominatimwrapper_spark.operators.geocode import cascade
    from nominatimwrapper_spark.operators.pages import pages_to_addresses
    from nominatimwrapper_spark.plans.flagship import (
        flagship,
        gazetteer_index,
        pages_from_documents,
    )

    flagship(spark, sf, replicate=1).write.format("noop").mode("overwrite").save()
    index = gazetteer_index(spark)
    addrs = pages_to_addresses(
        pages_from_documents(spark, sf, replicate=replicate), dedup_crawls=False
    ).localCheckpoint(eager=True)
    print(f"addrs ready: {addrs.count()}", flush=True)

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    jobs_before = json.loads(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs").read()
    )
    seen = {j["jobId"] for j in jobs_before}

    t0 = time.time()
    res, _ = cascade(addrs, index, with_rejected=False, validate_unique=False,
                     with_extra_house_number=False)
    t1 = time.time()
    res.write.format("noop").mode("overwrite").save()
    t2 = time.time()
    print(f"cascade build: {t1-t0:.2f}s  sink: {t2-t1:.2f}s  total: {t2-t0:.2f}s",
          flush=True)

    jobs = json.loads(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs").read()
    )
    new = sorted((j for j in jobs if j["jobId"] not in seen), key=lambda j: j["jobId"])
    for j in new:
        from datetime import datetime

        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        try:
            dur = (
                datetime.strptime(j["completionTime"], fmt)
                - datetime.strptime(j["submissionTime"], fmt)
            ).total_seconds()
        except Exception:
            dur = -1
        print(f"job {j['jobId']:>3} {dur:7.2f}s tasks={j['numCompletedTasks']:>5} "
              f"{j['name'][:110]}", flush=True)
    stages = json.loads(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        ).read()
    )
    stages = sorted(stages, key=lambda s: -s.get("executorRunTime", 0))[:15]
    for s in stages:
        print(
            f"stage {s['stageId']:>3} runTime={s['executorRunTime']/1000:8.1f}s "
            f"cpu={s.get('executorCpuTime', 0)/1e9:8.1f}s tasks={s['numCompleteTasks']:>4} "
            f"shufR={s.get('shuffleReadBytes', 0)>>20}MB shufW={s.get('shuffleWriteBytes', 0)>>20}MB "
            f"in={s.get('inputBytes', 0)>>20}MB {s['name'][:60]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
