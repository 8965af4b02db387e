# -*- coding: utf-8 -*-
"""Streaming flagship: the geocode lifecycle over a pages STREAM.

The cascade's driver loop (per-stage counts, working-set shrink, local
checkpoints) is batch control flow that Structured Streaming cannot run
inside a single logical plan — so the stream reuses it per micro-batch via
``foreachBatch``, Spark's canonical pattern for lifting batch logic into a
stream. What the stream layer adds on top of the batch engine:

- exactly-once sink semantics through the streaming checkpointLocation
  (a restarted query does NOT re-geocode micro-batches it already
  committed — the resume analog of the reference's per-chunk loop,
  utils.py:1195-1279, for a continuously arriving crawl);
- ``availableNow`` trigger for catch-up runs (drain everything present,
  then stop — a crawl-backfill job shape);
- per-micro-batch output partitioning by epoch so replays are auditable.

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

from ..functions import s2
from ..operators.geocode import GazetteerIndex, cascade
from ..operators.pages import pages_to_addresses

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
    """One micro-batch through the batch engine: extract -> cascade -> S2.
    Identical to plans.flagship.flagship minus the page synthesis."""
    addrs = pages_to_addresses(pages, dedup_crawls=False)
    res, _ = cascade(
        addrs,
        index,
        with_rejected=False,
        validate_unique=False,
        with_extra_house_number=False,
    )
    return res.withColumn(
        "cell13", s2.s2_cell_udf(13)(F.col("lat"), F.col("lon"))
    ).select(
        "addr_key",
        "url",
        "method",
        F.col("place_id").cast("long").alias("place_id"),
        F.col("place_rank").cast("long").alias("place_rank"),
        "cell13",
        F.round(F.col("lat") * 1_000_000).cast("long").alias("lat_1e6"),
        F.round(F.col("lon") * 1_000_000).cast("long").alias("lon_1e6"),
    )


def geocode_pages_stream(
    spark: SparkSession,
    input_dir: str,
    index: GazetteerIndex,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """File-source pages stream -> batch cascade per micro-batch -> parquet
    sink. Returns the started StreamingQuery; caller awaits termination.

    Restarting with the same ``checkpoint_dir`` resumes after the last
    committed micro-batch: already-geocoded files are not reprocessed."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def _one_batch(pages: DataFrame, epoch_id: int) -> None:
        out = geocode_micro_batch(pages, index).withColumn(
            "epoch", F.lit(epoch_id).cast("long")
        )
        out.write.mode("append").parquet(out_dir)

    writer = stream.writeStream.foreachBatch(_one_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
