# -*- coding: utf-8 -*-
"""Structured Streaming demo: watermarked tumbling-window aggregation over
the events stream (SURVEY.md §2.10 — the reference has no streaming; this
is the optional late/duplicate-crawl handling demo, not fidelity-gated).

The same transformation works on a batch DataFrame (Spark's unified
semantics), which is how the test cross-checks it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts per event_type with a late-data watermark.
    Works identically for a streaming or batch ``events`` frame."""
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))  # NTZ -> TZ
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(F.col(ts_col), window_len).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
        )
    )


def run_stream_over_dir(
    spark, input_dir: str, schema, checkpoint_dir: str, query_name: str = "windowed_events"
):
    """File-source stream -> windowed counts -> in-memory sink (complete
    mode). Returns the StreamingQuery; caller awaits processAllAvailable."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    agg = windowed_event_counts(stream)
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
