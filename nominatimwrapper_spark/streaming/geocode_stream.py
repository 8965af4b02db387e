# -*- coding: utf-8 -*-
"""Streaming flagship: the geocode lifecycle over a pages STREAM.

Two regimes, picked by the gazetteer broadcast gate:

- **broadcast-able gazetteer** (the common case): the partition-local
  kernel (operators/geocode_kernel.py) needs no batch control flow, so
  the whole lifecycle runs as ONE continuous streaming plan — source ->
  dedup state -> mapInPandas kernel -> file sink. No foreachBatch, no
  per-epoch driver orchestration; exactly-once from the sink's
  _spark_metadata commit log.
- **above the broadcast gate**: the cascade's driver loop (per-stage
  counts, working-set shrink, local checkpoints) is batch control flow
  that Structured Streaming cannot run inside a single logical plan — the
  stream reuses it per micro-batch via ``foreachBatch``, Spark's
  canonical pattern for lifting batch logic into a stream.

What the stream layer adds on top of the batch engine:

- exactly-once sink semantics: the streaming checkpointLocation skips
  micro-batches already committed (the resume analog of the reference's
  per-chunk loop, utils.py:1195-1279). The direct plan gets sink
  idempotence from the file-sink commit log; the foreachBatch sink is
  made IDEMPOTENT by hand — output partitioned by epoch, written with
  dynamic partition overwrite, so a replayed micro-batch (crash between
  data write and commit log) rewrites its own partition instead of
  appending twice;
- ``availableNow`` trigger for catch-up runs (drain everything present,
  then stop — a crawl-backfill job shape).

At cluster scale each micro-batch is one Iceberg/parquet file group; the
batch cascade inside the closure broadcasts the same gazetteer index every
epoch (it is built once, driver-side, outside the closure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.geocode import GazetteerIndex

# micro-batches at or under this many rows run their cascade with a narrow
# shuffle width — the per-epoch cost at live-tailing batch sizes is task
# setup, not data (see _one_batch)
_SMALL_BATCH_ROWS = 100_000
_SMALL_BATCH_SHUFFLE = 4

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def geocode_micro_batch(pages: DataFrame, index: GazetteerIndex) -> DataFrame:
    """One micro-batch through the engine core. dedup_crawls is False on
    both paths: cross-micro-batch recrawl dedup happens UPSTREAM in the
    streaming plan (native dropDuplicates state wired in by
    geocode_pages_stream), where per-key state outlives the micro-batch —
    a per-batch window could never see a recrawl arriving one epoch later.

    Path choice is the broadcast gate: a broadcast-able gazetteer runs the
    partition-local kernel (geocode_kernel.py — the whole lifecycle in ONE
    narrow stage, no per-stage driver actions; measured ~8x less per-epoch
    fixed cost than the distributed cascade, value-identical by test);
    above the broadcast budget the distributed shuffle-join cascade is the
    only sound shape and the micro-batch pays its driver-action cost."""
    if index.broadcast_ok:
        from ..operators.geocode_kernel import geocode_and_tile_kernel

        return geocode_and_tile_kernel(pages, index)
    from ..plans.flagship import geocode_and_tile

    return geocode_and_tile(pages, index, dedup_crawls=False, validate_unique=False)


def geocode_pages_stream(
    spark: SparkSession,
    input_dir: str,
    index: GazetteerIndex,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    dedup_recrawls: bool = True,
    max_files_per_trigger: int = 1,
):
    """File-source pages stream -> stateful first-seen recrawl dedup ->
    batch cascade per micro-batch -> parquet sink. Returns the started
    StreamingQuery; caller awaits termination.

    ``dedup_recrawls`` composes streaming/stateful.first_seen_stream
    UPSTREAM of the cascade: a url re-delivered in ANY later micro-batch
    (recrawl, retry, mirror) is dropped by per-key state before paying
    extraction + geocoding. Stream semantics are FIRST-arrival-wins (a
    stream cannot know a newer crawl is coming); the batch lifecycle's
    as-of dedup is latest-wins — identical recrawl content geocodes
    identically under both.

    Restarting with the same ``checkpoint_dir`` resumes after the last
    committed micro-batch: already-geocoded files are not reprocessed,
    and the dedup state itself is part of the streaming checkpoint.

    OUTPUT-SCHEMA NOTE (regime-dependent): the direct continuous plan
    (broadcast-able gazetteer) writes exactly the kernel's TILE_SCHEMA via
    the file sink's commit log — no ``epoch`` column and no epoch
    partitioning. The foreachBatch regime (above the broadcast gate)
    additionally writes an ``epoch`` partition column because its
    hand-rolled idempotent sink overwrites per-epoch partitions. Readers
    that must work across both regimes should select the TILE_SCHEMA
    columns explicitly and treat ``epoch`` as optional metadata."""
    # micro-batch cost is dominated by the FIXED per-epoch overhead
    # (state-store tasks + cascade stage setup), so pages-per-batch is
    # the throughput lever: raise max_files_per_trigger on dense
    # backfills; 1 keeps the finest-grained resume for live tailing
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    if dedup_recrawls:
        # First-arrival-wins url dedup with NATIVE streaming state: the
        # engine keeps only the key columns in the state store and drops
        # repeats JVM-side — measured several times cheaper per micro-batch
        # than the applyInPandasWithState operator (one Python call per
        # distinct url per epoch). first_seen_stream (streaming/stateful.py)
        # remains the custom-stateful-operator surface for callers needing
        # processing-time TTL or richer per-key state.
        if available_now:
            # catch-up: whole-backfill dedup, state lives for the run
            stream = stream.dropDuplicates(["url"])
        else:
            # continuous: bound state by EVENT time — re-arrivals more than
            # 24h of watermark progress apart are treated as new, the
            # native analog of the stateful operator's 24h TTL
            stream = stream.withWatermark(
                "warc_ts", "24 hours"
            ).dropDuplicatesWithinWatermark(["url"])

    if index.broadcast_ok:
        # DIRECT streaming plan: a broadcast-able gazetteer needs no batch
        # control flow at all — source -> dedup state -> one-stage kernel
        # -> file sink is ONE continuous logical plan. No foreachBatch
        # closure, no py4j round-trips, no per-epoch job orchestration;
        # exactly-once comes from the file sink's own _spark_metadata
        # commit log (readers going through spark.read see only committed
        # files, so a crash between data write and commit is invisible).
        # Measured: 8x 5k-page epochs 12.2s (foreachBatch kernel) -> 7.1s
        # warm / 8.8s cold at local[32], shuffle width 8.
        from ..operators.geocode_kernel import geocode_and_tile_kernel

        tiled = geocode_and_tile_kernel(stream, index, widen=False)
        writer = (
            tiled.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def _one_batch(pages: DataFrame, epoch_id: int) -> None:
        sess = pages.sparkSession
        # Pin the micro-batch ONCE: the cascade's control-flow actions would
        # otherwise re-trigger the source scan + dedup state op per action.
        # The row count is then a cheap scan and prices the batch for the
        # shuffle clamp below — a 5k-page epoch shuffling across the full
        # session width pays pure task-setup overhead in every window/join
        # stage, so small batches run with a handful of shuffle partitions
        # (AQE cannot do this: parallelismFirst keeps tiny shuffles wide).
        pages = pages.localCheckpoint(eager=True)
        n_rows = pages.count()
        prev = sess.conf.get("spark.sql.shuffle.partitions")
        clamp = n_rows <= _SMALL_BATCH_ROWS and int(prev) > _SMALL_BATCH_SHUFFLE
        if clamp:
            sess.conf.set("spark.sql.shuffle.partitions", str(_SMALL_BATCH_SHUFFLE))
        try:
            _write_batch(pages, epoch_id)
        finally:
            if clamp:
                sess.conf.set("spark.sql.shuffle.partitions", prev)

    def _write_batch(pages: DataFrame, epoch_id: int) -> None:
        out = geocode_micro_batch(pages, index).withColumn(
            "epoch", F.lit(epoch_id).cast("long")
        )
        # IDEMPOTENT sink: a blind append would duplicate rows when a
        # micro-batch is replayed (crash between the data write and the
        # streaming commit log). Dynamic partition overwrite keyed on the
        # epoch makes the replay rewrite exactly its own partition.
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(out_dir)
        )

    writer = stream.writeStream.foreachBatch(_one_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
