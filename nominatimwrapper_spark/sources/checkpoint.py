# -*- coding: utf-8 -*-
"""Per-partition checkpointing with lineage + row-count manifests (S7 —
the north_rule's resumability requirement).

The reference keeps only in-memory timing stats (base.py:275-301) and
per-stage counters (utils.py:678-686); it has no resume story. Here every
input partition (e.g. a crawl-date) is processed independently and lands
as ``out/part=<p>/`` + ``_manifest.json`` (row counts, input fingerprint,
wall time, engine version). A rerun left-anti-joins against completed
manifests — zero recomputation — and a changed input fingerprint
invalidates just that partition.

On a cluster the same layout works on any hadoop-compatible FS; the
manifest write is atomic (temp file + rename) so a killed job never leaves
a partition half-claimed.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .. import __version__

MANIFEST = "_manifest.json"


class PartitionedCheckpointer:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

    def _part_dir(self, part: str) -> str:
        return os.path.join(self.out_dir, f"part={part}")

    def completed(self) -> dict[str, dict]:
        """partition -> manifest for every completed partition."""
        done = {}
        if not os.path.isdir(self.out_dir):
            return done
        for d in os.listdir(self.out_dir):
            mf = os.path.join(self.out_dir, d, MANIFEST)
            if d.startswith("part=") and os.path.exists(mf):
                with open(mf) as f:
                    done[d[len("part="):]] = json.load(f)
        return done

    def run(
        self,
        partitions: list[str],
        compute: Callable[[str], DataFrame],
        input_fingerprint: Callable[[str], str] | None = None,
        stats: Callable[[DataFrame], dict] | None = None,
        max_concurrent: int = 1,
    ) -> dict:
        """Process every partition not yet completed (or whose input
        fingerprint changed). Returns {partition: manifest} including
        skipped ones (manifest has ``resumed: True``).

        ``max_concurrent`` > 1 submits that many independent partition
        jobs from a driver thread pool (guide §2.6): Spark's scheduler
        runs them side by side, so the next partition's tasks back-fill
        executors idled by the current one's tail (driver-side planning,
        manifest I/O, read-back counts). Partitions are independent by
        construction — each writes its own ``part=<p>/`` dir and claims
        it with its own atomic manifest rename, so concurrency does not
        change resume semantics."""
        done = self.completed()
        out: dict[str, dict] = {}
        todo: list[tuple[str, str]] = []
        for part in partitions:
            fp = input_fingerprint(part) if input_fingerprint else ""
            if part in done and done[part].get("input_fingerprint", "") == fp:
                out[part] = {**done[part], "resumed": True}
            else:
                todo.append((part, fp))

        def _one(part: str, fp: str) -> dict:
            t0 = time.time()
            from pyspark.sql import functions as F

            df = compute(part).withColumn("checkpoint_part", F.lit(part))
            sc = df.sparkSession.sparkContext
            sc.setJobDescription(f"checkpoint partition {part}")  # thread-local
            pdir = self._part_dir(part)
            df.write.mode("overwrite").parquet(os.path.join(pdir, "data"))
            # row count AND the stats callback below both read the WRITTEN
            # parquet back — one cheap columnar scan each; re-using the lazy
            # compute() plan would re-execute the whole partition job
            back = df.sparkSession.read.parquet(os.path.join(pdir, "data"))
            n_out = back.count()

            manifest = {
                "partition": part,
                "rows_out": n_out,
                "input_fingerprint": fp,
                "wall_sec": round(time.time() - t0, 3),
                "engine_version": __version__,
                "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "resumed": False,
            }
            if stats:
                manifest["stats"] = stats(back)
            tmp = os.path.join(pdir, MANIFEST + ".tmp")
            with open(tmp, "w") as f:
                json.dump(manifest, f)
            os.replace(tmp, os.path.join(pdir, MANIFEST))  # atomic claim
            sc.setJobDescription(None)
            return manifest

        if max_concurrent <= 1 or len(todo) <= 1:
            for part, fp in todo:
                out[part] = _one(part, fp)
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=max_concurrent) as pool:
                futs = [(part, pool.submit(_one, part, fp)) for part, fp in todo]
                for part, fut in futs:
                    out[part] = fut.result()
        return out

    def read_all(self, spark: SparkSession) -> DataFrame:
        """All completed partitions as one DataFrame (``checkpoint_part``
        column embedded at write time)."""
        return spark.read.parquet(
            *[
                os.path.join(self._part_dir(p), "data")
                for p in sorted(self.completed())
            ]
        )
