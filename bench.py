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

    def _flagship_kernel(sp, d):
        # same pages, partition-local kernel: the whole lifecycle in ONE
        # mapInPandas stage (broadcast-gazetteer regime's latency path)
        from nominatimwrapper_spark.operators.geocode_kernel import (
            geocode_and_tile_kernel,
        )
        from nominatimwrapper_spark.plans.flagship import (
            gazetteer_index,
            pages_from_documents,
        )

        return geocode_and_tile_kernel(
            pages_from_documents(sp, d, replicate=rep), gazetteer_index(sp)
        )

    qs["geocode_flagship_kernel"] = _flagship_kernel

    # hot-city skew regime (SURVEY §7 hard-part 5): 30% of all pages carry
    # ONE address. Uniform leg is the baseline; a straggler-free run means
    # the dedup-to-unique + broadcast-join cascade absorbed the skew (no
    # key ever shuffles with its page payload).
    qs["geocode_flagship_skew30"] = lambda sp, d: _flagship(
        sp, d, replicate=rep, skew_hot=0.3
    )

    # scaled dedup/ANN legs (round-4): the sf corpus is small enough that
    # the per-query numbers were noise-dominated; remix-replicate to
    # ~factor x so signatures + banded joins dominate the wall time
    dedup_factor = int(os.environ.get("SPARK_GRAFT_DEDUP_FACTOR", "200"))
    from nominatimwrapper_spark.operators.dedup import (
        minhash_lsh_candidates,
        simhash_udf,
    )
    from nominatimwrapper_spark.plans.flagship import (
        documents_scaled,
        embeddings_scaled,
    )

    _scaled_cache: dict[str, object] = {}

    def _docs_scaled(sp, d):
        # materialize the remixed corpus ONCE — the legs measure dedup
        # throughput (signatures + banded joins), not corpus synthesis
        if d not in _scaled_cache:
            _scaled_cache[d] = documents_scaled(sp, d, dedup_factor).localCheckpoint(
                eager=True
            )
        return _scaled_cache[d]

    def _minhash_scaled(sp, d):
        return minhash_lsh_candidates(
            _docs_scaled(sp, d), "doc_id", "text", num_hashes=32, bands=8,
        )

    def _simhash_scaled(sp, d):
        sh = simhash_udf()
        from pyspark.sql import functions as SF

        return _docs_scaled(sp, d).select(
            "doc_id", sh(SF.col("text")).alias("simhash")
        )

    def _minhash_dedup_cc_scaled(sp, d):
        # the FULL near-dup closure on the same 1M corpus: signatures ->
        # banded LSH -> hashed-shingle exact verify -> alternating-star
        # connected components -> keep-component-minimum anti-join
        # (round-5 VERDICT item 1's "run it on the 1M-doc leg")
        from nominatimwrapper_spark.operators.dedup import minhash_dedup

        return minhash_dedup(_docs_scaled(sp, d), "doc_id", "text")

    def _emb_scaled(sp, d):
        key = f"emb::{d}"
        if key not in _scaled_cache:
            _scaled_cache[key] = embeddings_scaled(sp, d, dedup_factor).localCheckpoint(
                eager=True
            )
        return _scaled_cache[key]

    def _cosine_scaled(sp, d):
        from pyspark.sql import Window
        from pyspark.sql import functions as SF

        e = _emb_scaled(sp, d)
        probe = e.filter(SF.col("vec_id") == 0).select(SF.col("embedding").alias("probe"))

        def dot(a, b):
            return SF.aggregate(
                SF.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                SF.lit(0.0),
                lambda acc, x: acc + x,
            )

        j = e.crossJoin(SF.broadcast(probe))
        sim = dot(SF.col("embedding"), SF.col("probe")) / (
            SF.sqrt(dot(SF.col("embedding"), SF.col("embedding")))
            * SF.sqrt(dot(SF.col("probe"), SF.col("probe")))
        )
        scored = j.select("vec_id", SF.round(sim * 10000).cast("long").alias("sim_1e4"))
        w = Window.orderBy(SF.col("sim_1e4").desc(), SF.col("vec_id").asc())
        return scored.withColumn("rank", SF.row_number().over(w)).filter("rank <= 10")

    def _ivf_scaled(sp, d):
        from pyspark.sql import functions as SF

        from nominatimwrapper_spark.operators.simsearch import cosine_topk_ivf

        e = _emb_scaled(sp, d)
        probes = e.filter(SF.col("vec_id") < 8).selectExpr(
            "vec_id as probe_id", "embedding"
        )
        # timed leg includes the index BUILD (one TakeOrderedAndProject
        # corpus job + driver k-means) + assignment + bucketed search
        return cosine_topk_ivf(e, probes, k=10, n_centroids=128, nprobe=8)

    qs["minhash_lsh_1m"] = _minhash_scaled
    qs["minhash_dedup_cc_1m"] = _minhash_dedup_cc_scaled
    qs["simhash_1m"] = _simhash_scaled
    qs["cosine_topk_400k"] = _cosine_scaled
    qs["ivf_topk_400k"] = _ivf_scaled

    _flagship(spark, sf_dir, replicate=1).write.format("noop").mode("overwrite").save()
    # kernel warm-up: pays the gazetteer pandas-broadcast build + worker
    # imports outside the timed window (mirrors the distributed warm-up)
    from nominatimwrapper_spark.operators.geocode_kernel import geocode_and_tile_kernel
    from nominatimwrapper_spark.plans.flagship import (
        gazetteer_index as _gidx,
        pages_from_documents as _pfd,
    )

    geocode_and_tile_kernel(_pfd(spark, sf_dir, replicate=1), _gidx(spark)).write.format(
        "noop"
    ).mode("overwrite").save()
    headline = [
        "geocode_flagship",     # the engine's real workload
        "geocode_flagship_big",  # same, 4x pages: the data-bound regime
        "geocode_flagship_nobc",  # same pages, forced shuffle-join cascade
        "geocode_flagship_kernel",  # same pages, one-stage mapInPandas kernel
        "geocode_flagship_skew30",  # 30% of pages on ONE hot address
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
        "minhash_lsh_1m",    # scaled dedup regime (remixed corpus)
        "minhash_dedup_cc_1m",  # full closure: verify + CC + anti-join
        "simhash_1m",
        "cosine_topk_400k",  # scaled ANN brute-force regime
        "ivf_topk_400k",     # scaled ANN index path (build + query)
    ]

    load_before = os.getloadavg()[0]
    timings: dict[str, float] = {}
    for name in headline:
        # steady-state timing: one untimed pass pays codegen compilation and
        # scan/setup (the flagship pair shares the replicate=1 warm-up above
        # — re-running 2M pages twice would double the bench for no signal)
        if not name.startswith("geocode_flagship") and name != "minhash_dedup_cc_1m":
            # (the CC-closure leg is multi-minute — a warm pass would double
            # it for no signal; its upstream corpus is already materialized)
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        if name == "geocode_flagship_nobc":  # leg-scoped conf, restore
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    # ANN recall@10 at the scaled corpus (round-5): measured quality of the
    # approximate paths vs brute force on the SAME 400k vectors the timed
    # legs use — reported metrics (with their index configs), not gates
    def _ann_recall() -> dict:
        from pyspark.sql import functions as SF

        from nominatimwrapper_spark.operators.simsearch import (
            cosine_topk_bruteforce,
            cosine_topk_ivf,
            cosine_topk_lsh,
        )

        e = _emb_scaled(spark, sf_dir)
        # 64 OUT-OF-CORPUS probes: the midpoint of two corpus vectors is
        # near the manifold but matches no stored vector exactly, so
        # recall is measured on genuine queries, not self-lookups
        a = e.filter(SF.col("vec_id") < 64).selectExpr(
            "vec_id as probe_id", "embedding as _ea"
        )
        b = e.filter((SF.col("vec_id") >= 64) & (SF.col("vec_id") < 128)).selectExpr(
            "vec_id - 64 as probe_id", "embedding as _eb"
        )
        probes = a.join(b, "probe_id").select(
            "probe_id",
            SF.zip_with("_ea", "_eb", lambda x, y: (x + y) / SF.lit(2.0)).alias(
                "embedding"
            ),
        )

        def topsets(df):
            pdf = df.select("probe_id", "vec_id").toPandas()
            return {p: set(g["vec_id"]) for p, g in pdf.groupby("probe_id")}

        brute = topsets(cosine_topk_bruteforce(e, probes, k=10))
        lsh = topsets(cosine_topk_lsh(e, probes, k=10, bands=16, bits=64))
        ivf = topsets(cosine_topk_ivf(e, probes, k=10, n_centroids=128, nprobe=8))

        def recall(approx):
            return round(
                sum(len(brute[p] & approx.get(p, set())) for p in brute)
                / (10.0 * len(brute)),
                3,
            )

        return {
            "lsh_bands16_bits64": recall(lsh),
            "ivf_c128_nprobe8": recall(ivf),
            "k": 10, "n_probes": len(brute),
        }

    ann_recall = _ann_recall()

    # lifecycle legs (round-4): the S7 checkpoint/resume job over 8 crawl-
    # date partitions (cold run + resume run with 4 precompleted) and the
    # composed streaming flagship (first_seen dedup -> cascade,
    # availableNow catch-up over 8 file-arrivals). Own sinks, timed whole.
    import glob as _glob
    import shutil as _shutil
    import tempfile as _tempfile

    from pyspark.sql import functions as SF

    from nominatimwrapper_spark.jobs.geocode_job import run_job
    from nominatimwrapper_spark.plans.flagship import (
        gazetteer_index,
        pages_from_documents,
        world_dir,
    )
    from nominatimwrapper_spark.sources.pages_io import write_pages_partitioned
    from nominatimwrapper_spark.streaming.geocode_stream import geocode_pages_stream

    life_dir = _tempfile.mkdtemp(prefix="nwspark_bench_life_")
    try:
        rep_life = int(os.environ.get("SPARK_GRAFT_LIFECYCLE_REPLICATE", "8"))
        pages = pages_from_documents(spark, sf_dir, replicate=rep_life)
        # exactly 8 crawl-date partitions: the base warc_ts drifts by
        # doc_id minutes (~28 days at bench scale), so rebase it fully
        pages8 = pages.withColumn(
            "warc_ts",
            SF.lit("2025-03-01 00:00:00").cast("timestamp")
            + SF.make_interval(days=SF.crc32("url") % 8),
        )
        pages_dir = os.path.join(life_dir, "pages")
        write_pages_partitioned(pages8, pages_dir)
        n_pages_life = pages8.count()
        gaz_path = f"{world_dir()}/gazetteer.parquet"

        out_a = os.path.join(life_dir, "job_out")
        dates = sorted(
            d.split("=", 1)[1] for d in os.listdir(pages_dir) if d.startswith("crawl_date=")
        )
        assert len(dates) == 8, f"expected 8 crawl-date partitions, got {len(dates)}"
        t0 = time.time()
        run_job(spark, pages_dir, gaz_path, out_a, date_to=dates[3])
        timings["checkpoint_job_4parts"] = round(time.time() - t0, 3)
        t0 = time.time()
        m = run_job(spark, pages_dir, gaz_path, out_a)  # resume: 4 skipped
        timings["checkpoint_resume_8parts"] = round(time.time() - t0, 3)
        n_resumed = sum(1 for v in m.values() if v.get("resumed"))
        assert n_resumed == 4, f"resume leg recomputed: {m}"

        stream_in = os.path.join(life_dir, "stream_in")
        os.makedirs(stream_in)
        stage = os.path.join(life_dir, "_stage")
        for b in range(8):
            part = pages8.filter(SF.crc32("url") % 8 == b)
            part.coalesce(1).write.mode("overwrite").parquet(stage)
            src = _glob.glob(f"{stage}/part-*.parquet")[0]
            _shutil.move(src, os.path.join(stream_in, f"{b:03d}.parquet"))
        index = gazetteer_index(spark)
        # micro-batches are fixed-overhead bound at bench page counts: the
        # per-epoch cost is task setup across the state + kernel stages, so
        # the stream's shuffle width should track per-epoch DATA (5k pages),
        # not cores — 8 measured fastest (5.2k pages/s vs 3.3k at 32 on the
        # direct kernel plan). Leg-scoped; a fresh checkpoint dir each
        # bench, so the state partitioning is free to differ per run.
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        t0 = time.time()
        q = geocode_pages_stream(
            spark, stream_in, index,
            os.path.join(life_dir, "stream_out"),
            os.path.join(life_dir, "stream_ck"),
        )
        q.awaitTermination()
        timings["streaming_flagship_8batches"] = round(time.time() - t0, 3)
        spark.conf.set("spark.sql.shuffle.partitions", str(n_shuffle))
    finally:
        _shutil.rmtree(life_dir, ignore_errors=True)

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
                "flagship_kernel_pages_per_sec": round(
                    n_docs * rep / timings["geocode_flagship_kernel"], 1
                ),
                "flagship_skew30_pages_per_sec": round(
                    n_docs * rep / timings["geocode_flagship_skew30"], 1
                ),
                "flagship_big_pages": n_docs * rep_big,
                "flagship_big_pages_per_sec": round(
                    n_docs * rep_big / timings["geocode_flagship_big"], 1
                ),
                "dedup_docs": n_docs * dedup_factor,
                "minhash_docs_per_sec": round(
                    n_docs * dedup_factor / timings["minhash_lsh_1m"], 1
                ),
                "minhash_cc_docs_per_sec": round(
                    n_docs * dedup_factor / timings["minhash_dedup_cc_1m"], 1
                ),
                "simhash_docs_per_sec": round(
                    n_docs * dedup_factor / timings["simhash_1m"], 1
                ),
                "ann_recall_at10": ann_recall,
                "streaming_pages": n_pages_life,
                "streaming_pages_per_sec": round(
                    n_pages_life / timings["streaming_flagship_8batches"], 1
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
