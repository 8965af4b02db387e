# -*- coding: utf-8 -*-
"""Checkpoint/resume, streaming windowed agg, multimodal plumbing, dedup."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nominatimwrapper_spark.operators.dedup import (
    minhash_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
)
from nominatimwrapper_spark.operators.multimodal import (
    decode_media,
    media_features,
    sample_video_frames,
    synth_media,
)
from nominatimwrapper_spark.sources.checkpoint import PartitionedCheckpointer
from nominatimwrapper_spark.streaming.windowed import (
    run_stream_over_dir,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# checkpoint / resume
# ---------------------------------------------------------------------------


def test_checkpoint_resume_no_recompute(spark, tmp_path):
    out = str(tmp_path / "ckpt")
    calls = []

    def compute(part):
        calls.append(part)
        return spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_orderpriority") == part
        )

    ck = PartitionedCheckpointer(out)
    parts = ["1-URGENT", "2-HIGH"]
    m1 = ck.run(parts, compute, input_fingerprint=lambda p: "v1")
    assert calls == parts
    assert all(not m["resumed"] for m in m1.values())

    # simulated crash before the third partition; rerun with one more part
    mtime_before = os.path.getmtime(os.path.join(out, "part=1-URGENT", "_manifest.json"))
    m2 = ck.run(parts + ["3-MEDIUM"], compute, input_fingerprint=lambda p: "v1")
    assert calls == parts + ["3-MEDIUM"]  # first two NOT recomputed
    assert m2["1-URGENT"]["resumed"] and m2["2-HIGH"]["resumed"]
    assert os.path.getmtime(os.path.join(out, "part=1-URGENT", "_manifest.json")) == mtime_before

    # fingerprint change invalidates exactly that partition
    ck.run(["1-URGENT"], compute, input_fingerprint=lambda p: "v2")
    assert calls.count("1-URGENT") == 2

    total = ck.read_all(spark)
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    expect = orders.filter(
        F.col("o_orderpriority").isin(["1-URGENT", "2-HIGH", "3-MEDIUM"])
    ).count()
    assert total.count() == expect
    assert "checkpoint_part" in total.columns


# ---------------------------------------------------------------------------
# streaming
# ---------------------------------------------------------------------------


def test_streaming_matches_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF}/events.parquet").limit(2000).cache()
    # split into 3 file chunks -> incremental stream
    in_dir = str(tmp_path / "in")
    events.repartition(3).write.parquet(in_dir)

    q = run_stream_over_dir(
        spark, in_dir, events.schema, str(tmp_path / "ck"), query_name="t_win"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("select * from t_win").toPandas()
    exp = windowed_event_counts(events).toPandas()
    key = ["win_start", "win_end", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[key + ["n"]], exp[key + ["n"]])


def test_streaming_geocode_matches_batch_and_resumes(spark, tmp_path):
    """Streaming flagship (direct kernel plan under the broadcast gate):
    stream output == batch output on the same pages, and a RESTARTED
    query with the same checkpointLocation only processes files that
    arrived after the last committed micro-batch (exactly-once resume,
    no re-geocoding)."""
    import glob
    import shutil

    from nominatimwrapper_spark.plans.flagship import (
        gazetteer_index,
        pages_from_documents,
    )
    from nominatimwrapper_spark.streaming.geocode_stream import (
        geocode_micro_batch,
        geocode_pages_stream,
    )

    sf001 = "/root/testdata/sf0.001"
    pages = pages_from_documents(spark, sf001).localCheckpoint(eager=True)
    half_a = pages.filter(F.crc32(F.col("url")) % 2 == 0)
    half_b = pages.filter(F.crc32(F.col("url")) % 2 == 1)
    index = gazetteer_index(spark)

    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def _drop_file(df, name):
        d = str(tmp_path / f"_stage_{name}")
        df.coalesce(1).write.parquet(d)
        src = glob.glob(f"{d}/part-*.parquet")[0]
        shutil.move(src, str(in_dir / f"{name}.parquet"))
        shutil.rmtree(d)

    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    _drop_file(half_a, "000")
    q = geocode_pages_stream(spark, str(in_dir), index, out_dir, ck)
    q.awaitTermination()
    got1 = spark.read.parquet(out_dir).toPandas()
    exp1 = geocode_micro_batch(half_a, index).toPandas()
    key = ["addr_key", "method", "place_id", "cell13"]
    pd.testing.assert_frame_equal(
        got1[key].sort_values("addr_key").reset_index(drop=True),
        exp1[key].sort_values("addr_key").reset_index(drop=True),
    )

    # second wave arrives; restart from the same checkpoint
    _drop_file(half_b, "001")
    q2 = geocode_pages_stream(spark, str(in_dir), index, out_dir, ck)
    q2.awaitTermination()
    got2 = spark.read.parquet(out_dir).toPandas()
    # every address geocoded exactly once: wave-1 rows were NOT reprocessed
    assert got2["addr_key"].is_unique
    exp_all = geocode_micro_batch(pages, index).toPandas()
    pd.testing.assert_frame_equal(
        got2[key].sort_values("addr_key").reset_index(drop=True),
        exp_all[key].sort_values("addr_key").reset_index(drop=True),
    )


def test_geocode_job_cli_direct_file_launch(spark, tmp_path):
    """The launcher must work when the FILE is executed directly with no
    package context — exactly how `spark-submit path/to/geocode_job.py`
    runs it (round-2 review: the old relative imports died there). Runs
    the real CLI end-to-end in a subprocess on a one-partition world."""
    import json
    import os
    import subprocess
    import sys

    from nominatimwrapper_spark.plans.flagship import (
        pages_from_documents,
        world_dir,
    )
    from nominatimwrapper_spark.sources.pages_io import write_pages_partitioned

    pages = pages_from_documents(spark, "/root/testdata/sf0.001").limit(60)
    pages_dir = str(tmp_path / "pages")
    write_pages_partitioned(pages, pages_dir)
    out = str(tmp_path / "out")

    env = dict(os.environ, SPARK_GRAFT_CPUS="4", SPARK_DRIVER_MEMORY="2g")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "..",
                         "nominatimwrapper_spark", "jobs", "geocode_job.py"),
            "--pages", pages_dir,
            "--gazetteer", f"{world_dir()}/gazetteer.parquet",
            "--out", out,
        ],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "partitions computed=1" in proc.stdout
    parts = [d for d in os.listdir(out) if d.startswith("part=")]
    assert len(parts) == 1
    man = json.load(open(os.path.join(out, parts[0], "_manifest.json")))
    assert man["rows_out"] > 0


def test_geocode_job_partitioned_resume(spark, tmp_path):
    """The spark-submit job shape: per-crawl-date partitions through the
    S7 checkpointer. Run -> all computed; rerun -> all resumed (zero
    recomputation); a lost manifest -> exactly that partition recomputed."""
    import os

    from nominatimwrapper_spark.jobs.geocode_job import run_job
    from nominatimwrapper_spark.plans.flagship import (
        pages_from_documents,
        world_dir,
    )
    from nominatimwrapper_spark.sources.pages_io import write_pages_partitioned

    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    # spread across two crawl dates
    pages = pages.withColumn(
        "warc_ts",
        F.when(F.crc32("url") % 2 == 0, F.col("warc_ts")).otherwise(
            F.col("warc_ts") + F.expr("INTERVAL 1 DAY")
        ),
    )
    pages_dir = str(tmp_path / "pages")
    write_pages_partitioned(pages, pages_dir)
    gaz = f"{world_dir()}/gazetteer.parquet"
    out = str(tmp_path / "out")

    m1 = run_job(spark, pages_dir, gaz, out)
    assert len(m1) == 2 and all(not m["resumed"] for m in m1.values())
    assert sum(m["rows_out"] for m in m1.values()) == pages.count()
    assert all(m["stats"]["methods"].get("orig", 0) > 0 for m in m1.values())

    m2 = run_job(spark, pages_dir, gaz, out)
    assert all(m["resumed"] for m in m2.values())

    # lose one partition's manifest (simulated mid-job kill)
    victim = sorted(m1)[0]
    os.remove(os.path.join(out, f"part={victim}", "_manifest.json"))
    m3 = run_job(spark, pages_dir, gaz, out)
    assert not m3[victim]["resumed"]
    assert all(m["resumed"] for p, m in m3.items() if p != victim)
    assert m3[victim]["rows_out"] == m1[victim]["rows_out"]


def test_streaming_flagship_with_recrawl_dedup(spark, tmp_path):
    """The COMPOSED streaming flagship: stateful first-seen dedup wired
    upstream of the per-micro-batch cascade. Urls recrawled across
    micro-batches are geocoded exactly once, and the stream's total
    output equals the batch lifecycle (first-seen dedup + cascade) on the
    union of all arrivals."""
    import glob
    import shutil

    from nominatimwrapper_spark.plans.flagship import (
        gazetteer_index,
        pages_from_documents,
    )
    from nominatimwrapper_spark.streaming.geocode_stream import (
        geocode_micro_batch,
        geocode_pages_stream,
    )
    from nominatimwrapper_spark.streaming.stateful import first_seen_batch

    sf001 = "/root/testdata/sf0.001"
    pages = pages_from_documents(spark, sf001).localCheckpoint(eager=True)
    wave1 = pages.filter(F.crc32(F.col("url")) % 3 <= 1)  # ~2/3 of urls
    # wave 2 = the remaining third PLUS a recrawl of half of wave 1
    # (same url+content, later warc_ts)
    recrawl = pages.filter(F.crc32(F.col("url")) % 3 == 0).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 7 DAYS")
    )
    wave2 = pages.filter(F.crc32(F.col("url")) % 3 == 2).unionByName(recrawl)

    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def _drop_file(df, name):
        d = str(tmp_path / f"_stage_{name}")
        df.coalesce(1).write.parquet(d)
        src = glob.glob(f"{d}/part-*.parquet")[0]
        shutil.move(src, str(in_dir / f"{name}.parquet"))
        shutil.rmtree(d)

    _drop_file(wave1, "000")
    _drop_file(wave2, "001")
    out_dir = str(tmp_path / "out")
    q = geocode_pages_stream(
        spark, str(in_dir), gazetteer_index(spark), out_dir,
        str(tmp_path / "ck"), dedup_recrawls=True,
    )
    q.awaitTermination()
    got = spark.read.parquet(out_dir).toPandas()

    # recrawled urls were NOT geocoded twice
    assert got["addr_key"].is_unique

    # == batch lifecycle: first-seen dedup over ALL arrivals + cascade
    all_arrivals = wave1.unionByName(wave2)
    exp = geocode_micro_batch(
        first_seen_batch(all_arrivals, key="url", order="warc_ts"),
        gazetteer_index(spark),
    ).toPandas()
    key = ["addr_key", "method", "place_id", "cell13", "h3_9"]
    pd.testing.assert_frame_equal(
        got[key].sort_values("addr_key").reset_index(drop=True),
        exp[key].sort_values("addr_key").reset_index(drop=True),
    )


def test_streaming_live_tail_watermarked_dedup(spark, tmp_path):
    """Continuous (available_now=False) mode on the direct kernel plan:
    dropDuplicatesWithinWatermark state + mapInPandas kernel + file sink
    in one running query. A file dropped WHILE the query runs — carrying
    both new urls and a recrawl of wave 1 — is picked up, the recrawls
    are dropped by cross-micro-batch state, and stopping the query leaves
    a committed, readable output with exactly one row per address."""
    import glob
    import shutil
    import time

    from nominatimwrapper_spark.plans.flagship import (
        gazetteer_index,
        pages_from_documents,
    )
    from nominatimwrapper_spark.streaming.geocode_stream import (
        geocode_pages_stream,
    )

    pages = pages_from_documents(spark, "/root/testdata/sf0.001").localCheckpoint(
        eager=True
    )
    n_addrs = pages.count()  # one injected address per page at sf0.001
    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def _drop_file(df, name):
        d = str(tmp_path / f"_stage_{name}")
        df.coalesce(1).write.parquet(d)
        src = glob.glob(f"{d}/part-*.parquet")[0]
        shutil.move(src, str(in_dir / f"{name}.parquet"))
        shutil.rmtree(d)

    wave1 = pages.filter(F.crc32(F.col("url")) % 2 == 0)
    _drop_file(wave1, "000")
    out_dir = str(tmp_path / "out")
    q = geocode_pages_stream(
        spark, str(in_dir), gazetteer_index(spark), out_dir,
        str(tmp_path / "ck"), available_now=False,
    )
    try:
        # live arrival: the other half + a recrawl of wave 1, 1h later
        recrawl = wave1.withColumn(
            "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 HOUR")
        )
        _drop_file(
            pages.filter(F.crc32(F.col("url")) % 2 == 1).unionByName(recrawl),
            "001",
        )
        deadline = time.time() + 120
        n = 0
        while time.time() < deadline and n < n_addrs:
            try:
                n = spark.read.parquet(out_dir).count()
            except Exception:
                n = 0
            time.sleep(1)
    finally:
        q.stop()
    out = spark.read.parquet(out_dir).toPandas()
    assert len(out) == n_addrs
    assert out["addr_key"].is_unique


def test_stateful_first_seen_dedup(spark, tmp_path):
    """Custom stateful operator: first-seen url dedup across micro-batches
    (applyInPandasWithState). Chunk 1 = 40 urls at T0; chunk 2 = the same
    urls recrawled at T1; chunk 3 = 10 new urls + 10 recrawls. The stream
    must emit exactly one row per url — the first arrival — matching the
    batch twin (earliest warc_ts)."""
    import datetime as dt

    from nominatimwrapper_spark.streaming.stateful import (
        first_seen_batch,
        run_first_seen_over_dir,
    )

    t0 = dt.datetime(2025, 3, 1)
    t1 = dt.datetime(2025, 4, 5)
    c1 = pd.DataFrame(dict(url=[f"u{i}" for i in range(40)], warc_ts=t0, body=[f"v0-{i}" for i in range(40)]))
    c2 = pd.DataFrame(dict(url=[f"u{i}" for i in range(40)], warc_ts=t1, body=[f"v1-{i}" for i in range(40)]))
    c3 = pd.DataFrame(dict(url=[f"u{i}" for i in range(40, 50)] + [f"u{i}" for i in range(10)],
                           warc_ts=t1, body=[f"v2-{i}" for i in range(20)]))
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    schema = spark.createDataFrame(c1).schema
    # one file per chunk, written in arrival order
    for n, c in enumerate([c1, c2, c3]):
        spark.createDataFrame(c, schema).coalesce(1).write.parquet(str(in_dir / f"chunk{n}"))
        # separate subdirs aren't a valid single stream source; flatten below
    import glob
    import shutil

    for n in range(3):
        src = glob.glob(str(in_dir / f"chunk{n}" / "part-*.parquet"))[0]
        shutil.move(src, str(in_dir / f"{n:03d}.parquet"))
        shutil.rmtree(str(in_dir / f"chunk{n}"))

    all_rows = spark.createDataFrame(pd.concat([c1, c2, c3]), schema)
    exp = first_seen_batch(all_rows, key="url", order="warc_ts").toPandas()

    q = run_first_seen_over_dir(
        spark, str(in_dir), schema, str(tmp_path / "ck"), query_name="t_first_seen"
    )
    # NB processAllAvailable() never returns on a query with state timeouts
    # (perpetual "cleaning up state" batches) — poll the sink instead
    import time

    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if q.exception():
                raise q.exception()
            if spark.sql("select count(*) c from t_first_seen").first().c >= len(exp):
                break
            time.sleep(0.5)
        got = spark.sql("select * from t_first_seen").toPandas()
    finally:
        q.stop()

    assert got.url.value_counts().max() == 1
    key = ["url", "warc_ts", "body"]
    g = got[key].sort_values("url").reset_index(drop=True)
    e = exp[key].sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e)


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


def test_multimodal_decode_and_features(spark):
    media = synth_media(spark, n=60)
    dec = decode_media(media).toPandas()
    assert len(dec) == 60
    img = dec[dec.media_type == "image"]
    assert img.width.notna().all() and (img.width >= 16).all()
    aud = dec[dec.media_type == "audio"]
    assert (aud.sample_rate == 16000).all()
    vid = dec[dec.media_type == "video"]
    assert vid.n_frames.notna().all()

    feats = media_features(media).select("media_id", "features").toPandas()
    assert all(len(f) == 16 for f in feats.features)
    # deterministic: same payload -> same vector
    f2 = media_features(media).select("media_id", "features").toPandas()
    a = [tuple(v) for v in feats.sort_values("media_id").features]
    b = [tuple(v) for v in f2.sort_values("media_id").features]
    assert a == b


def test_real_codecs_wav_and_netpbm(spark):
    """The stdlib-decodable tier is REAL: exact WAV/P6 metadata and
    pixel/PCM statistics verified against numpy ground truth."""
    import numpy as np

    from nominatimwrapper_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_stats,
        image_stats,
        make_ppm,
        make_wav,
    )

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(10, 20, 3)).astype(np.uint8)
    t = np.arange(16000)  # exactly 1 s at 16 kHz
    tone = (12000 * np.sin(2 * np.pi * 220 * t / 16000)).astype("<i2")
    rows = [
        (1, "media://1", "image", make_ppm(20, 10, px)),
        (2, "media://2", "audio", make_wav(16000, tone)),
        (3, "media://3", "image", b"IMG:99x77:xxxx"),  # fake-codec tier
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    dec = decode_media(media).toPandas().set_index("media_id")
    assert (int(dec.loc[1, "width"]), int(dec.loc[1, "height"])) == (20, 10)
    assert int(dec.loc[2, "sample_rate"]) == 16000
    assert int(dec.loc[2, "duration_ms"]) == 1000
    assert int(dec.loc[2, "n_frames"]) == 16000
    assert (int(dec.loc[3, "width"]), int(dec.loc[3, "height"])) == (99, 77)

    ist = image_stats(media).toPandas().set_index("media_id")
    exp_mu = px.reshape(-1, 3).mean(axis=1).mean()
    assert abs(ist.loc[1, "mean_luma"] - exp_mu) < 1e-3
    assert 3 not in ist.index  # fake-codec image has no real pixels

    # \r\n after maxval: per the netpbm spec exactly ONE whitespace byte
    # separates maxval from the raster, so this payload's raster length is
    # off by one — it must be SKIPPED (no silently shifted pixel read)
    crlf = b"P6\n20 10\n255\r\n" + px.tobytes()
    media_crlf = spark.createDataFrame([(9, "media://9", "image", crlf)], MEDIA_SCHEMA)
    assert 9 not in image_stats(media_crlf).toPandas().media_id.values

    ast = audio_stats(media).toPandas().set_index("media_id")
    x = tone.astype(np.float64) / 32768.0
    assert abs(ast.loc[2, "rms"] - np.sqrt((x * x).mean())) < 1e-5
    assert int(ast.loc[2, "n_samples"]) == 16000
    # a 220 Hz tone crosses zero ~440 times/s
    assert abs(ast.loc[2, "zero_crossing_rate"] * 16000 - 440) < 5


def test_video_frame_sampling(spark):
    media = synth_media(spark, n=30)
    frames = sample_video_frames(media, every_k=10).toPandas()
    dec = decode_media(media).toPandas().set_index("media_id")
    for mid, grp in frames.groupby("media_id"):
        n = int(dec.loc[mid, "n_frames"])
        assert list(grp.frame_idx) == list(range(0, n, 10))
        assert (grp.byte_offset.diff().dropna() == 640).all()


# ---------------------------------------------------------------------------
# dedup: minhash recall on true near-dups
# ---------------------------------------------------------------------------


def test_minhash_finds_planted_near_dups(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(100)
    # plant near-duplicates: copy each doc with one appended token
    dups = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extraword")).alias("text"),
    )
    all_docs = docs.select("doc_id", "text").unionByName(dups)
    cand = minhash_lsh_candidates(all_docs, num_hashes=32, bands=8).toPandas()
    planted = set(zip(range(0, 100), range(1_000_000, 1_000_100)))
    found = set(zip(cand.id_a, cand.id_b))
    recall = len(planted & found) / len(planted)
    assert recall >= 0.9, f"LSH recall {recall}"

    kept = minhash_dedup(all_docs, jaccard_threshold=0.5)
    # every planted dup (higher id) must be dropped when its jaccard >= 0.5
    ver = ngram_jaccard_pairs(
        all_docs.withColumn("doc_id", F.when(F.col("doc_id") >= 1_000_000, F.col("doc_id")).otherwise(F.col("doc_id")))
    )
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert all(i in kept_ids for i in range(0, 100))  # originals kept
    dropped = [i for i in range(1_000_000, 1_000_100) if i not in kept_ids]
    assert len(dropped) >= 90  # near-identical copies overwhelmingly dropped


def test_minhash_verified_broadcast_equals_shuffle_path(spark):
    """The r6 verify rewrite byte-gates a broadcast of the hashed-shingle
    table with a shuffle-hash fallback: both physical paths must produce
    the identical verified edge set (and match the previous per-pair
    array_union jaccard on planted near-dups)."""
    from nominatimwrapper_spark.operators.dedup import minhash_verified_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(120)
    dups = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extraword")).alias("text"),
    )
    all_docs = docs.select("doc_id", "text").unionByName(dups)
    kw = dict(num_hashes=32, bands=8)
    bc = (
        minhash_verified_pairs(all_docs, jaccard_threshold=0.5, **kw)
        .toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )
    sh = (
        minhash_verified_pairs(
            all_docs, jaccard_threshold=0.5, broadcast_max_bytes=0, **kw
        )
        .toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )
    assert len(bc) > 0
    pd.testing.assert_frame_equal(bc, sh)
    # jaccard parity with the two-pass array_union form on a spot pair
    row = bc.iloc[0]
    pair = all_docs.filter(F.col("doc_id").isin(int(row.id_a), int(row.id_b)))
    j = ngram_jaccard_pairs(
        pair.withColumn(
            "doc_id", F.when(F.col("doc_id") >= 1_000_000, F.lit(int(row.id_a)) + 1).otherwise(F.lit(int(row.id_a)))
        )
    ).toPandas()
    assert abs(row.jaccard - j.jaccard_1e4.iloc[0] / 10000.0) < 2e-4


def test_minhash_driver_corpus_recall_and_zero_drops(spark):
    """Backs the rows-only ``minhash_lsh`` driver row with a value-level
    gate: on the ACTUAL sf0.01 driver corpus, (a) LSH candidate recall
    over all-pairs true-Jaccard near-dups meets a bound, and (b) the
    bucket cap drops nothing (the driver numbers are uncapped reality)."""
    from nominatimwrapper_spark.operators.dedup import (
        banded_signatures,
        lsh_dropped_bucket_stats,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    pdf = docs.toPandas()
    # all-pairs true Jaccard on word 3-shingles (500 docs -> 125k pairs)
    sh = []
    for t in pdf.text:
        toks = t.split()
        sh.append(
            frozenset(
                " ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 1))
            )
        )
    ids = pdf.doc_id.tolist()
    true_pairs = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = len(sh[i] & sh[j])
            if not inter:
                continue
            if inter / len(sh[i] | sh[j]) >= 0.7:
                a, b = sorted((ids[i], ids[j]))
                true_pairs.add((a, b))
    assert true_pairs, "driver corpus has no true near-dups to measure recall on"

    cand = minhash_lsh_candidates(docs, num_hashes=32, bands=8).toPandas()
    found = {tuple(sorted(p)) for p in zip(cand.id_a, cand.id_b)}
    recall = len(true_pairs & found) / len(true_pairs)
    # 32 hashes / 8 bands: P(collide | J=0.7) ~ 1-(1-0.7^4)^8 ~ 0.91/pair
    assert recall >= 0.85, f"LSH recall {recall:.2f} over {len(true_pairs)} pairs"

    n_buckets, n_rows = lsh_dropped_bucket_stats(
        banded_signatures(docs, num_hashes=32, bands=8), max_bucket_size=500
    )
    assert (n_buckets, n_rows) == (0, 0), "cap dropped rows on the driver corpus"


def test_minhash_degenerate_corpus_capped(spark):
    """1k identical docs = one degenerate LSH bucket per band. The bucket
    cap must drop it BEFORE the self-join (the uncapped plan is O(n^2)
    pairs), so candidate output is empty and the job finishes fast."""
    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.lit("boilerplate cookie banner accept all cookies to continue").alias("text"),
    )
    cand = minhash_lsh_candidates(docs, max_bucket_size=100)
    assert cand.count() == 0  # the whole bucket was dropped, not joined

    # the drop-volume reporter sees what the cap removed
    from nominatimwrapper_spark.operators.dedup import (
        lsh_dropped_bucket_stats,
        minhash_signature,
        word_shingles,
    )

    sigs = docs.select(
        "doc_id", minhash_signature(word_shingles(F.col("text"))).alias("sig")
    )
    # identical text -> identical signature for every row
    assert sigs.select("sig").distinct().count() == 1

    # with a cap above the bucket size the pairs DO come back (sanity that
    # the cap, not a broken join, is what emptied the candidate set)
    small = spark.range(30).select(
        F.col("id").alias("doc_id"), F.lit("same exact text here for all").alias("text")
    )
    cand2 = minhash_lsh_candidates(small, max_bucket_size=500)
    assert cand2.count() == 30 * 29 // 2


def test_lsh_dropped_bucket_stats(spark):
    from nominatimwrapper_spark.operators.dedup import lsh_dropped_bucket_stats

    banded = spark.createDataFrame(
        [(i, 0, 7) for i in range(50)] + [(99, 1, 8)],
        "id long, band int, bhash long",
    )
    n_buckets, n_rows = lsh_dropped_bucket_stats(banded, max_bucket_size=10)
    assert (n_buckets, n_rows) == (1, 50)
    n_buckets, n_rows = lsh_dropped_bucket_stats(banded, max_bucket_size=100)
    assert (n_buckets, n_rows) == (0, 0)


def test_minhash_agg_signatures_equal_fold_signatures(spark):
    """The codegen-friendly explode+partial-agg signature path
    (minhash_signatures_agg, round-4 bench optimization) is value-
    identical to the higher-order-function fold (minhash_signature) on
    the driver corpus — including empty/degenerate docs."""
    from pyspark.sql import functions as F

    from nominatimwrapper_spark.operators.dedup import (
        minhash_signature,
        minhash_signatures_agg,
        word_shingles,
    )

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").limit(400)
    extra = spark.createDataFrame(
        pd.DataFrame({"doc_id": [90001, 90002, 90003, 90004],
                      "text": ["", "one two", "one two three four", None]})
    )
    d = d.select("doc_id", "text").unionByName(extra)
    fold = d.select(
        F.col("doc_id").alias("_id"),
        minhash_signature(word_shingles(F.col("text"), 3), 32).alias("_sig"),
    ).toPandas()
    agg = minhash_signatures_agg(d, "doc_id", "text", 32, 3).toPandas()
    fold = fold.sort_values("_id").reset_index(drop=True)
    agg = agg.sort_values("_id").reset_index(drop=True)
    assert (fold["_id"] == agg["_id"]).all()
    for i, a, b in zip(fold["_id"], fold["_sig"], agg["_sig"]):
        if i == 90004:  # NULL text -> NULL signature on BOTH paths
            assert a is None and b is None
            continue
        assert list(a) == list(b), i


def test_documents_scaled_handles_gappy_ids(spark, tmp_path):
    """documents_scaled's partner-ring remix must not assume dense
    0..N-1 doc ids (regression: (doc_id + r) % n joined inner against
    actual ids silently dropped replicas on gappy corpora, skewing the
    benched docs/s denominator)."""
    from nominatimwrapper_spark.plans.flagship import documents_scaled

    gappy = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [3, 17, 40, 41, 900],  # gaps + non-zero start
            "text": [f"alpha beta gamma delta doc {i}" for i in range(5)],
        })
    )
    d = str(tmp_path / "gap")
    gappy.write.parquet(f"{d}/documents.parquet")
    out = documents_scaled(spark, d, factor=7)
    assert out.count() == 5 * 7
    assert out.select("doc_id").distinct().count() == 5 * 7
    assert out.filter(F.col("text").isNull()).count() == 0

    # dense corpus: unchanged fast path, same row-count law
    dense = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": list(range(6)),
            "text": [f"one two three four five doc {i}" for i in range(6)],
        })
    )
    d2 = str(tmp_path / "dense")
    dense.write.parquet(f"{d2}/documents.parquet")
    out2 = documents_scaled(spark, d2, factor=4)
    assert out2.count() == 6 * 4


def test_streaming_catchup_state_rows_bounded_by_keys(spark, tmp_path):
    """VERDICT r5 item 4: the availableNow catch-up regime deduplicates
    with run-scoped key-only state — assert, from the query's own
    progress metrics, that the state holds exactly one row per DISTINCT
    url (key-only, no payload), which is the documented bound: a 100 TB
    backfill drained in ONE availableNow run holds every url key, so
    backfills of that size must be sharded by input range (or run
    continuous with the watermarked dedup, whose state is time-bounded)."""
    import glob
    import shutil

    from nominatimwrapper_spark.plans.flagship import (
        gazetteer_index,
        pages_from_documents,
    )
    from nominatimwrapper_spark.streaming.geocode_stream import geocode_pages_stream

    pages = pages_from_documents(spark, "/root/testdata/sf0.001").localCheckpoint(
        eager=True
    )
    n_urls = pages.select("url").distinct().count()
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i in range(3):  # 3 file arrivals -> multi-epoch backfill
        part = pages.filter(F.crc32(F.col("url")) % 3 == i)
        d = str(tmp_path / f"_s{i}")
        part.coalesce(1).write.parquet(d)
        shutil.move(glob.glob(f"{d}/part-*.parquet")[0], str(in_dir / f"{i:03d}.parquet"))
    q = geocode_pages_stream(
        spark, str(in_dir), gazetteer_index(spark),
        str(tmp_path / "out"), str(tmp_path / "ck"),
    )
    q.awaitTermination()
    prog = q.lastProgress
    assert prog is not None and prog["stateOperators"], prog
    state_rows = sum(op["numRowsTotal"] for op in prog["stateOperators"])
    assert state_rows == n_urls, (state_rows, n_urls)
