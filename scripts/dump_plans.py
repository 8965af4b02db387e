#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Dump .explain('formatted') for every declared query into plans/r06/
(suffix 'before'/'after' from argv). Explain only — no execution."""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    from nominatimwrapper_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name=f"plans-{suffix}",
                      shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    for name, fn in em.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(f"ok {name}")
        except Exception as e:  # noqa: BLE001
            print(f"ERR {name}: {e}")
    spark.stop()


if __name__ == "__main__":
    main()
